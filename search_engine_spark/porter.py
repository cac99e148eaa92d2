"""Porter stemmer, matching the reference engine's variant.

This is a Python port of the classic Porter-1980 *reference demo*
algorithm as embedded in the reference engine (see
``/root/reference`` Stemmer.java:3-395 for the parity surface).  Two
behavioural points matter for rank-identity and are preserved here:

* only lowercase ``aeiou`` count as vowels — uppercase letters,
  digits and punctuation are all treated as consonants, so
  ``Apples`` stems differently from ``apples`` (the reference parser
  stems tokens *before* case folding);
* words of length <= 2 are returned unchanged (the ``k > 1`` guard).

The implementation below follows Martin Porter's published
public-domain algorithm (steps 1a..5b, called step1..step6 in the
reference) rather than translating the Java buffer mechanics.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


class _Stem:
    """Mutable stemming buffer: ``b[0:k+1]`` is the current word."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # -- predicates over the buffer ------------------------------------
    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant-vowel-consonant measures in b[0:j+1]."""
        n = 0
        i = 0
        while True:
            if i > self.j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    # -- suffix matching / rewriting -----------------------------------
    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if "".join(self.b[o : o + len(s)]) != s:
            return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for idx, ch in enumerate(s):
            if o + idx < len(self.b):
                self.b[o + idx] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- the six steps ---------------------------------------------------
    def step1(self) -> None:
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
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return
        for suffix, repl in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suffix):
                self.r(repl)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        for suffix, repl in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suffix):
                self.r(repl)
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

    def step5(self) -> None:
        if self.k == 0:
            return
        prev = self.b[self.k - 1]
        if prev == "o":
            # "-ion" strips only after s/t; "-ou" handles "-ous" leftovers
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif not self.ends("ou"):
                return
        else:
            for suffix in self._STEP5.get(prev, ()):
                if self.ends(suffix):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


@lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """Stem one token.  Words of length <= 2 are returned unchanged.
    LRU-cached: corpus vocabulary is Zipfian, so the hot head of the
    distribution stems once per executor instead of once per token."""
    if len(word) <= 2:
        return word
    st = _Stem(word)
    st.step1()
    st.step2()
    st.step3()
    st.step4()
    st.step5()
    st.step6()
    return "".join(st.b[: st.k + 1])
