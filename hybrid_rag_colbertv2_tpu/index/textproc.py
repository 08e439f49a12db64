"""Lexical text processing: word tokenization, stopwords, Porter stemming.

The reference relies on the ``bm25s`` wheel for tokenization with English
stopwords + a Snowball stemmer (local_rag_complete.py:851-858; note the
reference's ``bm25s.stemmer.Stemmer.Stemmer`` call is a latent import bug,
SURVEY.md section 2). Neither wheel is a TPU citizen, so this module owns
the host-side half of the lexical pipeline: a deterministic tokenizer +
Porter (1980) stemmer implemented from the published algorithm. Corpus and
query must be processed identically — both go through ``tokenize_lexical``.

A native C++ fast path with byte-identical behavior lives in csrc/ and is
used automatically when the shared library has been built (see
utils/native.py); this pure-Python implementation is the always-available
fallback and the oracle the native path is tested against.
"""

from __future__ import annotations

import re
from typing import List

_WORD_RE = re.compile(r"[a-z0-9]+")

# Standard English stopword list (the usual ~170-word set used by most IR
# toolkits; matches the *behavior* of the reference's stopwords="en").
ENGLISH_STOPWORDS = frozenset(
    """a about above after again against all am an and any are aren't as at
    be because been before being below between both but by can't cannot
    could couldn't did didn't do does doesn't doing don't down during each
    few for from further had hadn't has hasn't have haven't having he he'd
    he'll he's her here here's hers herself him himself his how how's i i'd
    i'll i'm i've if in into is isn't it it's its itself let's me more most
    mustn't my myself no nor not of off on once only or other ought our ours
    ourselves out over own same shan't she she'd she'll she's should
    shouldn't so some such than that that's the their theirs them themselves
    then there there's these they they'd they'll they're they've this those
    through to too under until up very was wasn't we we'd we'll we're we've
    were weren't what what's when when's where where's which while who who's
    whom why why's with won't would wouldn't you you'd you'll you're you've
    your yours yourself yourselves""".split()
)

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    return (
        _is_cons(word, i)
        and not _is_cons(word, i - 1)
        and _is_cons(word, i - 2)
        and word[i] not in "wxy"
    )


class PorterStemmer:
    """Porter (1980) stemming algorithm, implemented from the paper's rules."""

    def stem(self, word: str) -> str:
        if len(word) <= 2:
            return word
        w = self._step1a(word)
        w = self._step1b(w)
        w = self._step1c(w)
        w = self._step2(w)
        w = self._step3(w)
        w = self._step4(w)
        w = self._step5(w)
        return w

    # -- step 1a: plurals ------------------------------------------------
    def _step1a(self, w: str) -> str:
        if w.endswith("sses"):
            return w[:-2]
        if w.endswith("ies"):
            return w[:-2]
        if w.endswith("ss"):
            return w
        if w.endswith("s"):
            return w[:-1]
        return w

    # -- step 1b: -ed / -ing ---------------------------------------------
    def _step1b(self, w: str) -> str:
        if w.endswith("eed"):
            if _measure(w[:-3]) > 0:
                return w[:-1]
            return w
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                return w + "e"
            if _ends_double_cons(w) and w[-1] not in "lsz":
                return w[:-1]
            if _measure(w) == 1 and _ends_cvc(w):
                return w + "e"
        return w

    # -- step 1c: y -> i --------------------------------------------------
    def _step1c(self, w: str) -> str:
        if w.endswith("y") and _has_vowel(w[:-1]):
            return w[:-1] + "i"
        return w

    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    )

    def _step2(self, w: str) -> str:
        for suf, rep in self._STEP2:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _measure(stem) > 0:
                    return stem + rep
                return w
        return w

    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )

    def _step3(self, w: str) -> str:
        for suf, rep in self._STEP3:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _measure(stem) > 0:
                    return stem + rep
                return w
        return w

    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )

    def _step4(self, w: str) -> str:
        for suf in self._STEP4:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                if _measure(stem) > 1:
                    return stem
                return w
        return w

    def _step5(self, w: str) -> str:
        # 5a
        if w.endswith("e"):
            stem = w[:-1]
            m = _measure(stem)
            if m > 1 or (m == 1 and not _ends_cvc(stem)):
                w = stem
        # 5b
        if _measure(w) > 1 and w.endswith("ll"):
            w = w[:-1]
        return w


_STEMMER = PorterStemmer()
_STEM_CACHE: dict = {}


def _stem_cached(tok: str) -> str:
    s = _STEM_CACHE.get(tok)
    if s is None:
        s = _STEMMER.stem(tok)
        _STEM_CACHE[tok] = s
    return s


def tokenize_lexical(text: str, *, stopwords=ENGLISH_STOPWORDS,
                     stem: bool = True) -> List[str]:
    """Lowercase word tokens, stopword-filtered, Porter-stemmed.

    Deterministic and used identically for corpus and query (the reference
    applies the same bm25s tokenization on both sides,
    local_rag_complete.py:851-855 and :939-943).
    """
    toks = _WORD_RE.findall(text.lower())
    out = []
    for t in toks:
        if t in stopwords:
            continue
        out.append(_stem_cached(t) if stem else t)
    return out


def tokenize_corpus(corpus: List[str], stem: bool = True) -> List[List[str]]:
    """Batch tokenization — native C++ fast path when built (csrc/), with
    this module's pure-Python implementation as the tested-identical
    fallback."""
    from ..utils.native import tokenize_corpus_native

    native = tokenize_corpus_native(corpus, stem=stem)
    if native is not None:
        return native
    return [tokenize_lexical(t, stem=stem) for t in corpus]
