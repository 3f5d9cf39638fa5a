"""English stopword list for the galago_en analysis chain.

Plays the role of the stoplist compiled into Ivory's GalagoTokenizer
(ivory/core/tokenize/GalagoTokenizer.java:33-777 — reproduced behavior,
not copied data: this is the standard public Snowball English stopword
list plus common function-word extensions, lowercased, one term each).
The list is a module-level constant so builds are reproducible; callers
can pass their own set (IndexConfig selects the tokenizer, the tokenizer
closure captures the list).
"""

STOPWORDS_EN = frozenset("""
a about above after again against all am an and any are aren as at be
because been before being below between both but by can cannot could
couldn did didn do does doesn doing don down during each few for from
further had hadn has hasn have haven having he her here hers herself him
himself his how i if in into is isn it its itself just ll me mightn more
most mustn my myself needn no nor not now o of off on once only or other
our ours ourselves out over own re s same shan she should shouldn so
some such t than that the their theirs them themselves then there these
they this those through to too under until up ve very was wasn we were
weren what when where which while who whom why will with won would
wouldn you your yours yourself yourselves
also although always among amongst amoungst amount another anyhow anyone
anything anyway anywhere around became become becomes becoming beforehand
behind beside besides beyond bill bottom call con cry de describe detail
done due eg eight either eleven else elsewhere empty enough etc even ever
every everyone everything everywhere except fifteen fifty fill find fire
first five former formerly forty found four front full get give go
hence hereafter hereby herein hereupon however hundred ie inc indeed
interest keep last latter latterly least less ltd made many may meanwhile
might mill mine moreover mostly move much must name namely neither never
nevertheless next nine nobody none noone nothing nowhere often one onto
others otherwise part per perhaps please put rather say see seem seemed
seeming seems serious several show side since sincere six sixty somehow
someone something sometime sometimes somewhere still system take ten
therefore therein thereupon third thick thin three thru thus together
top toward towards twelve twenty two un upon us via well whatever
whence whenever whereafter whereas whereby wherein whereupon wherever
whether whither whoever whole whose yet
""".split())

# standard German stoplist (Snowball German stopword list subset plus
# common function words), for the galago_de chain
STOPWORDS_DE = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anders auch auf aus bei bin bis
bist da damit dann das dass daß dasselbe dazu dein deine deinem deinen
deiner deines dem demselben den denn denselben der derer derselbe
derselben des desselben dessen dich die dies diese dieselbe dieselben
diesem diesen dieser dieses dir doch dort du durch ein eine einem einen
einer eines einig einige einigem einigen einiger einiges einmal er es
etwas euch euer eure eurem euren eurer eures für gegen gewesen hab habe
haben hat hatte hatten hier hin hinter ich ihm ihn ihnen ihr ihre ihrem
ihren ihrer ihres im in indem ins ist jede jedem jeden jeder jedes jene
jenem jenen jener jenes jetzt kann kein keine keinem keinen keiner
keines können könnte machen man manche manchem manchen mancher manches
mein meine meinem meinen meiner meines mich mir mit muss musste nach
nicht nichts noch nun nur ob oder ohne sehr sein seine seinem seinen
seiner seines selbst sich sie sind so solche solchem solchen solcher
solches soll sollte sondern sonst über um und uns unse unsem unsen
unser unses unter viel vom von vor während war waren warst was weg weil
weiter welche welchem welchen welcher welches wenn werde werden wie
wieder will wir wird wirst wo wollen wollte würde würden zu zum zur
zwar zwischen
""".split())


# Czech stopword list for the lucene_cs chain — standard public Czech
# function-word list (the role of the Lucene CzechAnalyzer stoplist the
# reference uses for cs; reproduced behavior, standard public data).
STOPWORDS_CS = frozenset("""
a aby ale ani ano až bez bude budem budeš by byl byla byli bylo být co
což cz či další dnes do ho i jak jako je jeho jej její jejich jen ještě
ji jiné již jsem jsi jsme jsou jste k kam kde kdo když ke která které
který kteří ku má mají máte mezi mi mít mně mnou můj může my na nad nám
napište náš naši ne nebo nechť nejsou není než nic nové nový o od ode on
ona oni ono pak po pod podle pokud pouze právě pro proč proto protože
první před přes při s se si sice strana své svůj svých svým svými ta tak
také takže tato te tedy ten tento této tím tímto to toho tohoto tom
tomto tomuto tu tuto ty tyto u už v vám váš vaše ve více však všechen
vy z za zda zde ze že
""".split())

# Arabic stopword list for the lucene_ar chain — common particles,
# prepositions and pronouns (the role of the Lucene ArabicAnalyzer
# stoplist; reproduced behavior, standard public data). Stored in
# SURFACE form; the tokenizer matches stopwords before normalization
# and stemming, mirroring the reference's stopword-then-stem order
# (LuceneArabicAnalyzer.java:70-78).
STOPWORDS_AR = frozenset("""
من في على و فى يا ما لا ان إن أن إلى الى عن مع هذا هذه ذلك تلك هو هي هم
هن أو او ثم بل لم لن لو كان كانت يكون قد كل بعض غير بين عند عندما حتى إذا
اذا كيف أين اين متى لماذا ماذا منذ خلال حول دون بعد قبل فوق تحت أمام امام
وراء ليس ليست هناك هنا أيضا ايضا فقط ولكن لكن إلا الا كما لدى لها له لهم
نحن أنا انا أنت انت أنتم انتم به بها بهم إذ اذ أي اي أما اما أن
""".split())

# Spanish stopword list for the lucene_es chain — standard public Spanish
# function-word list (the role of the Lucene SpanishAnalyzer stoplist the
# reference uses for es; reproduced behavior, standard public data).
STOPWORDS_ES = frozenset("""
a al algo algunas algunos ante antes como con contra cual cuando de del
desde donde durante e el ella ellas ellos en entre era erais eran eras
eres es esa esas ese eso esos esta estaba estado estamos estan estar
estas este esto estos estoy fue fueron fui fuimos ha habia han hasta hay
la las le les lo los mas me mi mis mucho muchos muy nada ni no nos
nosotras nosotros nuestra nuestras nuestro nuestros o os otra otras otro
otros para pero poco por porque que quien quienes se sea sean segun ser
si sido sin sobre sois somos son soy su sus también tambien te tenemos
tengo ti tiene tienen todo todos tu tus un una uno unos vosotras
vosotros y ya yo él ésta éstas éste éstos
""".split())

# French stopword list for the lucene_fr chain — standard public French
# function-word list (the role of the Lucene FrenchAnalyzer stoplist the
# reference uses for fr; reproduced behavior, standard public data).
STOPWORDS_FR = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou où par pas pour
qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre vous
c d j l à m n s t y été étée étées étés étant suis es est sommes êtes
sont serai seras sera serons serez seront serais serait serions seriez
seraient étais était étions étiez étaient fus fut fûmes fûtes furent
sois soit soyons soyez soient fusse fusses fût fussions fussiez fussent
ayant eu eue eues eus ai as avons avez ont aurai auras aura aurons aurez
auront aurais aurait aurions auriez auraient avais avait avions aviez
avaient eut eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses
eût eussions eussiez eussent ceci cela celà cet cette ici là leurs quel
quels quelle quelles sans soi
""".split())

# Turkish stopword list for the lucene_tr chain — standard public Turkish
# function-word list (the role of the Lucene TurkishAnalyzer stoplist the
# reference uses for tr; reproduced behavior, standard public data).
STOPWORDS_TR = frozenset("""
acaba ama ancak artık aslında az bana bazı belki ben beni benim beri bile
bin bir biri birkaç birşey biz bize bizi bizim böyle böylece bu buna bunda
bundan bunlar bunları bunun burada çok çünkü da daha de defa değil diğer
diye doksan dokuz dolayı dört elli en gibi hem hep hepsi her hiç için iki
ile ise işte kadar karşın kendi kez ki kim kimden kime kimi kırk madem mi
mı mu mü nasıl ne neden nedenle nerde nerede nereye niçin niye on ona
ondan onlar onlardan onları onların onu onun otuz oysa öyle pek rağmen
sana sekiz seksen sen senden seni senin siz sizden sizi sizin şey şeyden
şeyi şeyler şöyle şu şuna şunda şundan şunları şunu tüm üç üzere var ve
veya ya yani yedi yerine yetmiş yine yirmi yoksa yüz zaten
""".split())
