"""Porter stemmer matching the reference's exact variant.

The reference ships the classic public-domain C#/Java port of Porter (1980)
at /root/reference/src/Util/Porter.cs.  This module is an independent Python
implementation of the same published algorithm, with two behaviors pinned to
that specific variant:

1. The reference's suffix matcher (``EndsFast``, Porter.cs:304-375) assigns
   ``j = k - len(suffix)`` *before* comparing characters, so a failed match
   with in-bounds offset still mutates ``j``; the original Java ``ends()``
   assigns ``j`` only on success.  We reproduce the reference behavior.
2. Words are stemmed only when ``k > 1`` after loading, i.e. length >= 3
   (Porter.cs:640-654); shorter words pass through unchanged, as does
   everything when stemming is disabled (``doNotStem``).

Step structure follows the published algorithm (steps 1-6 in this port's
numbering, including the Release 1-4 bug fixes for 'aed/eed/oed' and bare
'ion' documented in the original source).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class PorterStemmer:
    """Stateful stemmer over a char buffer; one instance per worker.

    ``stem_word`` below adds a memo cache — term distributions are Zipfian,
    so per-batch unique-token stemming plus the cache makes the Python-level
    loop negligible (SURVEY.md §2.2 M5).
    """

    __slots__ = ("b", "k", "j")

    def __init__(self) -> None:
        self.b: list[str] = []
        self.k = 0
        self.j = 0

    # --- predicates over the buffer ---------------------------------
    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Measure of consonant sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        for i in range(self.j + 1):
            if not self._cons(i):
                return True
        return False

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        # Pinned quirk: j is assigned before the character comparison
        # whenever the suffix fits (reference EndsFast, Porter.cs:304-312).
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        self.j = self.k - l
        b = self.b
        for i in range(l):
            if b[o + i] != s[i]:
                return False
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        b = self.b
        for i, ch in enumerate(s):
            b[o + i] = ch
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # --- steps ------------------------------------------------------
    def _step1(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"),
              ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        if self.k == 0:
            return
        for suffix, repl in self._STEP3.get(self.b[self.k - 1], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        for suffix, repl in self._STEP4.get(self.b[self.k], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "o":
            # 'ion' only strips after s/t; the j >= 0 guard is the
            # published Bug 2 fix for bare "ion".
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self._ends("ou"):
                pass
            else:
                return
        else:
            suffixes = self._STEP5.get(ch)
            if suffixes is None:
                return
            for s in suffixes:
                if self._ends(s):
                    break
            else:
                return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    # --- public API -------------------------------------------------
    def stem(self, word: str) -> str:
        """Stem one already-normalized word (length >= 3 required to act)."""
        self.b = list(word)
        self.k = len(word) - 1
        if self.k > 1:
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])


_SHARED = PorterStemmer()
_MEMO: dict[str, str] = {}
_MEMO_CAP = 1_000_000


def stem_word(word: str) -> str:
    """Memoized stem — safe because the stemmer is a pure function of the word."""
    cached = _MEMO.get(word)
    if cached is None:
        cached = _SHARED.stem(word)
        if len(_MEMO) < _MEMO_CAP:
            _MEMO[word] = cached
    return cached
