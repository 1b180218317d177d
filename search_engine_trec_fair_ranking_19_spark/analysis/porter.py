"""Porter stemmer (classic 1980 algorithm) with the reference's length guards.

The reference stems via OpenNLP's ``PorterStemmer`` — a derivative of Martin
Porter's canonical Java implementation of the original algorithm (including the
canonical code's documented departures from the paper: ``bli→ble``, ``logi→log``).
This is an independent pure-Python implementation of that same published
algorithm, written for clarity and for reuse inside vectorized pandas UDFs.

Call-site semantics cloned from `T/lexicalAnalysis/Stemmer.java:26-34`:
  * stem only if ``len(word) > 3``;
  * keep the stem only if ``len(stem) >= 3`` (else return the original word);
  * the stemmer sees the ORIGINAL-CASE token — lowercasing happens after
    stemming (`T/.../S2TextualEntryTokens.java:62-68`, `T/ui/Search.java:231-238`).
    Uppercase vowels are treated as consonants and suffix matches are
    case-sensitive, exactly as in the Java char-compare code.
"""

from __future__ import annotations

_VOWELS = "aeiou"


class _Stem:
    """One stemming pass over a word; mirrors the canonical buffer/k/j state."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # -- canonical helpers ------------------------------------------------
    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant sequences between 0 and j."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in "wxy"

    def ends(self, s: str) -> bool:
        l = len(s)
        if l > self.k + 1:
            return False
        if self.b[self.k - l + 1 : self.k + 1] != list(s):
            return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        self.b[self.j + 1 : self.k + 1] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- canonical steps --------------------------------------------------
    def step1ab(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in "lsz":
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step1c(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    def step2(self) -> None:
        c = self.b[self.k - 1]
        if c == "a":
            if self.ends("ational"):
                self.r("ate")
            elif self.ends("tional"):
                self.r("tion")
        elif c == "c":
            if self.ends("enci"):
                self.r("ence")
            elif self.ends("anci"):
                self.r("ance")
        elif c == "e":
            if self.ends("izer"):
                self.r("ize")
        elif c == "l":
            if self.ends("bli"):
                self.r("ble")  # canonical departure from the paper (abli→able)
            elif self.ends("alli"):
                self.r("al")
            elif self.ends("entli"):
                self.r("ent")
            elif self.ends("eli"):
                self.r("e")
            elif self.ends("ousli"):
                self.r("ous")
        elif c == "o":
            if self.ends("ization"):
                self.r("ize")
            elif self.ends("ation"):
                self.r("ate")
            elif self.ends("ator"):
                self.r("ate")
        elif c == "s":
            if self.ends("alism"):
                self.r("al")
            elif self.ends("iveness"):
                self.r("ive")
            elif self.ends("fulness"):
                self.r("ful")
            elif self.ends("ousness"):
                self.r("ous")
        elif c == "t":
            if self.ends("aliti"):
                self.r("al")
            elif self.ends("iviti"):
                self.r("ive")
            elif self.ends("biliti"):
                self.r("ble")
        elif c == "g":
            if self.ends("logi"):
                self.r("log")  # canonical departure from the paper

    def step3(self) -> None:
        c = self.b[self.k]
        if c == "e":
            if self.ends("icate"):
                self.r("ic")
            elif self.ends("ative"):
                self.r("")
            elif self.ends("alize"):
                self.r("al")
        elif c == "i":
            if self.ends("iciti"):
                self.r("ic")
        elif c == "l":
            if self.ends("ical"):
                self.r("ic")
            elif self.ends("ful"):
                self.r("")
        elif c == "s":
            if self.ends("ness"):
                self.r("")

    def step4(self) -> None:
        c = self.b[self.k - 1]
        if c == "a":
            if not self.ends("al"):
                return
        elif c == "c":
            if not (self.ends("ance") or self.ends("ence")):
                return
        elif c == "e":
            if not self.ends("er"):
                return
        elif c == "i":
            if not self.ends("ic"):
                return
        elif c == "l":
            if not (self.ends("able") or self.ends("ible")):
                return
        elif c == "n":
            if not (
                self.ends("ant")
                or self.ends("ement")
                or self.ends("ment")
                or self.ends("ent")
            ):
                return
        elif c == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in "st":
                pass
            elif not self.ends("ou"):
                return
        elif c == "s":
            if not self.ends("ism"):
                return
        elif c == "t":
            if not (self.ends("ate") or self.ends("iti")):
                return
        elif c == "u":
            if not self.ends("ous"):
                return
        elif c == "v":
            if not self.ends("ive"):
                return
        elif c == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    def step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:
            self.step1ab()
            self.step1c()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
        return "".join(self.b[: self.k + 1])


def porter_stem(word: str) -> str:
    """Raw canonical Porter stem (no reference guards)."""
    if len(word) <= 2:
        return word
    return _Stem(word).run()


def stem(word: str) -> str:
    """Guarded stem with the reference's semantics (`Stemmer.java:26-34`).

    Stems only words longer than 3 chars; discards stems shorter than 3 chars.
    """
    if len(word) > 3:
        stemmed = porter_stem(word)
        if len(stemmed) >= 3:
            return stemmed
    return word
