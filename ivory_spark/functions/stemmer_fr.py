"""Snowball French stemmer — implemented from the published algorithm
(snowballstem.org "French stemming algorithm"; the reference reaches
French through its Lucene-analyzer chain, core/tokenize/
TokenizerFactory.java:15-100 "fr").

Prelude marks u/i between vowels, y next to a vowel and u after q as
non-vowels (U/I/Y); RV is after the 3rd letter when the word starts
with two vowels (or par/col/tap), else after the first vowel that is
not the first letter; R1/R2 standard. Steps: 1 standard suffixes,
2a/2b verb suffixes (control flow per the spec), 3/4 residuals,
5 undouble, 6 un-accent, postlude unmarks U/I/Y.
"""

from __future__ import annotations

VOWELS = set("aeiouyâàëéêèïîôûù")


def _is_v(c: str) -> bool:
    return c in VOWELS


def _prelude(w: str) -> str:
    out = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if c in "ui" and 0 < i < n - 1 and _is_v(w[i - 1]) and _is_v(w[i + 1]):
            out[i] = c.upper()
        elif c == "u" and i > 0 and w[i - 1] == "q":
            out[i] = "U"
        elif c == "y" and ((i > 0 and _is_v(w[i - 1])) or (i < n - 1 and _is_v(w[i + 1]))):
            out[i] = "Y"
    return "".join(out)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def after_first_vc(start: int) -> int:
        for i in range(start, n - 1):
            if _is_v(w[i]) and not _is_v(w[i + 1]):
                return i + 2
        return n

    r1 = after_first_vc(0)
    r2 = after_first_vc(r1)
    rv = n
    if n >= 3 and ((_is_v(w[0]) and _is_v(w[1])) or w[:3] in ("par", "col", "tap")):
        rv = 3
    else:
        for i in range(1, n):
            if _is_v(w[i]):
                rv = i + 1
                break
    return r1, r2, rv


def _ends_in(w: str, suffixes, region_start: int):
    best = None
    for s in suffixes:
        if w.endswith(s) and len(w) - len(s) >= region_start:
            if best is None or len(s) > len(best):
                best = s
    return best


_S1_DEL_R2 = ("ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
              "isme", "able", "iste", "eux")
_S1_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
_S2A = ("issaIent", "issantes", "iraIent", "issante", "issants", "issions",
        "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
        "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
        "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
        "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
_S2B_IONS = ("ions",)
_S2B_ER = ("eraIent", "erions", "èrent", "erais", "erait", "eriez",
           "erons", "eront", "erai", "eras", "erez", "ées", "era", "iez",
           "ée", "és", "er", "ez", "é")
_S2B_A = ("assions", "assent", "assiez", "aIent", "antes", "asses", "âtes",
          "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai", "as", "a")


def french_stem(word: str) -> str:
    w = _prelude(word.lower())
    r1, r2, rv = _regions(w)
    orig = w
    step1_changed = False
    found_ment = False

    # ---- step 1: standard suffix removal -------------------------------
    cands = []
    for group in ("del_r2", "ateur", "logie", "usion", "ence", "ement",
                  "ite", "if", "eaux", "aux", "euse", "issement", "amment",
                  "emment", "ment"):
        if group == "del_r2":
            s = _ends_in(w, _S1_DEL_R2, r2)
        elif group == "ateur":
            s = _ends_in(w, _S1_ATEUR, r2)
        elif group == "logie":
            s = _ends_in(w, ("logies", "logie"), r2)
        elif group == "usion":
            s = _ends_in(w, ("usions", "utions", "usion", "ution"), r2)
        elif group == "ence":
            s = _ends_in(w, ("ences", "ence"), r2)
        elif group == "ement":
            s = _ends_in(w, ("ements", "ement"), rv)
        elif group == "ite":
            s = _ends_in(w, ("ités", "ité"), r2)
        elif group == "if":
            s = _ends_in(w, ("ives", "ifs", "ive", "if"), r2)
        elif group == "eaux":
            s = "eaux" if w.endswith("eaux") else None
        elif group == "aux":
            s = _ends_in(w, ("aux",), r1)
        elif group == "euse":
            s = _ends_in(w, ("euses", "euse"), r2) or _ends_in(w, ("euses", "euse"), r1)
        elif group == "issement":
            s = _ends_in(w, ("issements", "issement"), r1)
            if s and (len(w) - len(s) - 1 < 0 or _is_v(w[len(w) - len(s) - 1])):
                s = None
        elif group in ("amment", "emment"):
            s = _ends_in(w, (group,), rv)
        else:  # ment / ments, preceded by a vowel in RV
            s = _ends_in(w, ("ments", "ment"), 0)
            if s:
                pre = len(w) - len(s) - 1
                if pre < 0 or not _is_v(w[pre]) or pre + 1 < rv:
                    s = None
        if s:
            cands.append((group, s))
    if cands:
        group, suf = max(cands, key=lambda gs: len(gs[1]))
        base = w[: -len(suf)]
        if group == "del_r2":
            w, step1_changed = base, True
        elif group == "ateur":
            w, step1_changed = base, True
            if _ends_in(w, ("ic",), 0):
                if _ends_in(w, ("ic",), r2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        elif group == "logie":
            w, step1_changed = base + "log", True
        elif group == "usion":
            w, step1_changed = base + "u", True
        elif group == "ence":
            w, step1_changed = base + "ent", True
        elif group == "ement":
            w, step1_changed = base, True
            if _ends_in(w, ("iv",), r2):
                w = w[:-2]
                if _ends_in(w, ("at",), r2):
                    w = w[:-2]
            elif _ends_in(w, ("eus",), 0):
                if _ends_in(w, ("eus",), r2):
                    w = w[:-3]
                elif _ends_in(w, ("eus",), r1):
                    w = w[:-3] + "eux"
            elif _ends_in(w, ("abl", "iqU"), r2):
                w = w[:-3]
            elif _ends_in(w, ("ièr", "Ièr"), rv):
                w = w[:-3] + "i"
        elif group == "ite":
            w, step1_changed = base, True
            if _ends_in(w, ("abil",), 0):
                if _ends_in(w, ("abil",), r2):
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif _ends_in(w, ("ic",), 0):
                if _ends_in(w, ("ic",), r2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif _ends_in(w, ("iv",), r2):
                w = w[:-2]
        elif group == "if":
            w, step1_changed = base, True
            if _ends_in(w, ("at",), r2):
                w = w[:-2]
                if _ends_in(w, ("ic",), 0):
                    if _ends_in(w, ("ic",), r2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif group == "eaux":
            w, step1_changed = base + "eau", True
        elif group == "aux":
            w, step1_changed = base + "al", True
        elif group == "euse":
            if _ends_in(w, ("euses", "euse"), r2):
                w, step1_changed = base, True
            elif _ends_in(w, ("euses", "euse"), r1):
                w, step1_changed = base + "eux", True
        elif group == "issement":
            w, step1_changed = base, True
        elif group == "amment":
            w, step1_changed = base + "ant", True
            found_ment = True
            step1_changed = False  # per spec: treated as not removed for 2a
        elif group == "emment":
            w, step1_changed = base + "ent", True
            found_ment = True
            step1_changed = False
        else:  # ment/ments
            w = base
            found_ment = True
            step1_changed = False
    if step1_changed or found_ment:
        r1, r2, rv = _regions(w)

    # ---- steps 2a/2b: verb suffixes (in RV) ----------------------------
    step2_changed = False
    if not step1_changed or found_ment:
        s = _ends_in(w, _S2A, rv)
        if s:
            pre = len(w) - len(s) - 1
            # the preceding non-vowel must itself be in RV
            if pre >= rv and not _is_v(w[pre]) and w[pre] != "H":
                w, step2_changed = w[: -len(s)], True
        if not step2_changed:
            # step 2b
            s_ions = _ends_in(w, _S2B_IONS, r2)
            s_er = _ends_in(w, _S2B_ER, rv)
            s_a = _ends_in(w, _S2B_A, rv)
            best = max((x for x in (s_ions, s_er, s_a) if x), key=len, default=None)
            if best:
                w, step2_changed = w[: -len(best)], True
                if best in _S2B_A and w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
        if step2_changed:
            r1, r2, rv = _regions(w)

    changed = step1_changed or step2_changed

    # ---- step 3 / step 4 ------------------------------------------------
    if changed:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: trailing s unless preceded by a/i/o/u/è/s (the Hi
        # exception: i marked by a preceding H still allows deletion)
        if w.endswith("s") and len(w) >= 2:
            pre = w[-2]
            if pre not in "aiouès" or (pre == "i" and len(w) >= 3 and w[-3] == "H"):
                w = w[:-1]
                r1, r2, rv = _regions(w)
        s = _ends_in(w, ("ion",), r2)
        if s and len(w) - 4 >= rv and w[-4] in "st":
            w = w[:-3]
        else:
            s = _ends_in(w, ("ière", "Ière", "ier", "Ier"), rv)
            if s:
                w = w[: -len(s)] + "i"
            elif w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
            elif w.endswith("guë") and len(w) - 1 >= rv:
                w = w[:-1]

    # ---- step 5: undouble ----------------------------------------------
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # ---- step 6: un-accent ---------------------------------------------
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        if _is_v(w[i]) and w[i] not in "éè":
            break
        if w[i] in "éè":
            if seen_nonvowel:
                w = w[:i] + "e" + w[i + 1 :]
            break
        seen_nonvowel = True
        i -= 1

    # postlude
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")
