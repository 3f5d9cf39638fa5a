"""Snowball Spanish stemmer — implemented from the published algorithm
(snowballstem.org "Spanish stemming algorithm"; the reference reaches
Spanish through its Lucene-analyzer chain, core/tokenize/
TokenizerFactory.java:15-100 "es"). Pure Python, memo-cached by the
tokenizer registry wrapper.

Region definitions (standard Snowball):
- RV: if the 2nd letter is a consonant, after the next vowel; if the
  first two letters are vowels, after the next consonant; else (C+V)
  after the 3rd letter; end-of-word when the word is too short.
- R1: after the first non-vowel following a vowel; R2: same inside R1.
Steps: 0 attached pronoun, 1 standard suffixes, 2a/2b verb suffixes,
3 residual suffix, then acute-accent removal.
"""

from __future__ import annotations

VOWELS = set("aeiouáéíóúü")


def _is_v(c: str) -> bool:
    return c in VOWELS


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def after_first_vc(start: int) -> int:
        for i in range(start, n - 1):
            if _is_v(w[i]) and not _is_v(w[i + 1]):
                return i + 2
        return n

    r1 = after_first_vc(0)
    r2 = after_first_vc(r1)
    # RV
    rv = n
    if n >= 3:
        if not _is_v(w[1]):
            # after the next vowel following position 1
            for i in range(2, n):
                if _is_v(w[i]):
                    rv = i + 1
                    break
        elif _is_v(w[0]) and _is_v(w[1]):
            # after the next consonant
            for i in range(2, n):
                if not _is_v(w[i]):
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def _ends_in(w: str, suffixes, region_start: int):
    """Longest suffix from `suffixes` whose start is >= region_start;
    returns the suffix or None."""
    best = None
    for s in suffixes:
        if w.endswith(s) and len(w) - len(s) >= region_start:
            if best is None or len(s) > len(best):
                best = s
    return best


def _longest(w: str, suffixes):
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


_DEACCENT = str.maketrans("áéíóú", "aeiou")

_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
         "me", "se", "la", "le", "lo")
_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")  # accented: delete + deaccent
_PRE_B = ("iendo", "ando", "ar", "er", "ir")

_S1_DEL_R2 = ("amientos", "imientos", "amiento", "imiento", "anzas", "ables",
              "ibles", "istas", "anza", "icos", "icas", "ismo", "ismos",
              "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación",
            "antes", "ancia", "ador", "ante")
_S2B_MAIN = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "ábamos",
    "aríais", "aseis", "eríais", "iríais", "ieseis", "asteis", "isteis",
    "ábais", "áramos", "íamos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían", "irías",
    "iréis", "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íais",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás", "iría",
    "iera", "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos", "amos",
    "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida",
    "ara", "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís",
)
_S2B_GU = ("emos", "éis", "en", "es")


def spanish_stem(word: str) -> str:
    w = word.lower()
    r1, r2, rv = _regions(w)

    # ---- step 0: attached pronoun --------------------------------------
    pron = _ends_in(w, _PRON, rv)
    if pron:
        base = w[: -len(pron)]
        pre_a = _longest(base, _PRE_A)
        pre_b = _longest(base, _PRE_B)
        # the preceding verb form must lie in RV
        if pre_a and len(base) - len(pre_a) >= rv:
            w = base.translate(_DEACCENT)
        elif pre_b and len(base) - len(pre_b) >= rv:
            w = base
        elif base.endswith("yendo") and len(base) - 5 >= 0 and base[-6:-5] == "u":
            w = base
        # recompute regions only if changed
        if w != word.lower():
            r1, r2, rv = _regions(w)

    # ---- step 1: standard suffix removal -------------------------------
    removed1 = False
    s = _ends_in(w, _S1_DEL_R2, r2)
    s_ador = _ends_in(w, _S1_ADOR, r2)
    s_logia = _ends_in(w, ("logías", "logía"), r2)
    s_ucion = _ends_in(w, ("uciones", "ución"), r2)
    s_encia = _ends_in(w, ("encias", "encia"), r2)
    s_mente2 = _ends_in(w, ("mente",), r2)
    s_amente = _ends_in(w, ("amente",), r1)
    s_idad = _ends_in(w, ("idades", "idad"), r2)
    s_iv = _ends_in(w, ("ivas", "ivos", "iva", "ivo"), r2)
    # longest-match discipline across groups
    cands = [x for x in (s, s_ador, s_logia, s_ucion, s_encia, s_amente,
                         s_mente2, s_idad, s_iv) if x]
    if cands:
        suf = max(cands, key=len)
        base = w[: -len(suf)]
        if suf in _S1_DEL_R2:
            w, removed1 = base, True
        elif suf in _S1_ADOR:
            w, removed1 = base, True
            ic = _ends_in(w, ("ic",), r2)
            if ic:
                w = w[:-2]
        elif suf in ("logías", "logía"):
            w, removed1 = base + "log", True
        elif suf in ("uciones", "ución"):
            w, removed1 = base + "u", True
        elif suf in ("encias", "encia"):
            w, removed1 = base + "ente", True
        elif suf == "amente":
            w, removed1 = base, True
            if _ends_in(w, ("iv",), r2):
                w = w[:-2]
                if _ends_in(w, ("at",), r2):
                    w = w[:-2]
            else:
                pre = _ends_in(w, ("os", "ic", "ad"), r2)
                if pre:
                    w = w[:-2]
        elif suf == "mente":
            w, removed1 = base, True
            pre = _ends_in(w, ("ante", "able", "ible"), r2)
            if pre:
                w = w[: -len(pre)]
        elif suf in ("idades", "idad"):
            w, removed1 = base, True
            pre = _ends_in(w, ("abil", "ic", "iv"), r2)
            if pre:
                w = w[: -len(pre)]
        elif suf in ("ivas", "ivos", "iva", "ivo"):
            w, removed1 = base, True
            if _ends_in(w, ("at",), r2):
                w = w[:-2]

    if removed1:
        r1, r2, rv = _regions(w)

    # ---- step 2a: verb suffixes beginning y ----------------------------
    removed2a = False
    if not removed1:
        s = _ends_in(
            w,
            ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
             "ya", "ye", "yo", "yó"),
            rv,
        )
        if s and w[: -len(s)].endswith("u"):
            w, removed2a = w[: -len(s)], True
            r1, r2, rv = _regions(w)

    # ---- step 2b: other verb suffixes ----------------------------------
    if not removed1 and not removed2a:
        gu = _ends_in(w, _S2B_GU, rv)
        main = _ends_in(w, _S2B_MAIN, rv)
        if main and (not gu or len(main) > len(gu)):
            w = w[: -len(main)]
            r1, r2, rv = _regions(w)
        elif gu:
            w = w[: -len(gu)]
            if w.endswith("gu"):
                w = w[:-1]  # the u need not be in RV
            r1, r2, rv = _regions(w)

    # ---- step 3: residual suffix ---------------------------------------
    s = _ends_in(w, ("os", "a", "o", "á", "í", "ó"), rv)
    if s:
        w = w[: -len(s)]
    else:
        s = _ends_in(w, ("e", "é"), rv)
        if s:
            w = w[: -len(s)]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]

    return w.translate(_DEACCENT)
