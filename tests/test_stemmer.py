"""Snowball English (Porter2) stemmer correctness.

The reference's lexical pipeline intends Snowball English stemming
(``stemmer="english"`` via PyStemmer, local_rag_complete.py:854,942; used
correctly in model_downloader_simplified.py:118). The implementation in
index/textproc.py follows the official fixed-R1/R2 integer-position
semantics of libstemmer (what PyStemmer executes). nltk's
SnowballStemmer("english") — available in this environment — is the oracle;
its only known divergences are string-tracking artifacts when a step-2
replacement spans the R2 boundary (e.g. nltk re-grows R2 as "e"), which the
fuzz test bounds explicitly.
"""

import itertools
import random

import pytest

from hybrid_rag_colbertv2_tpu.index.textproc import (
    SnowballStemmer,
    tokenize_lexical,
)

nltk_snowball = pytest.importorskip("nltk.stem.snowball")

ORACLE = nltk_snowball.SnowballStemmer("english")
MINE = SnowballStemmer()

# Canonical behavior pins — cases that distinguish Porter2 from Porter 1980
# and exercise every special rule (exceptional forms, R1 prefixes, rope of
# longest-match-then-region semantics, short-word e-restoration).
GOLDEN = {
    "conditional": "condit",      # porter1 would give "condition"
    "national": "nation",
    "rational": "ration",
    "dying": "die",
    "lying": "lie",
    "skies": "sky",
    "skis": "ski",
    "early": "earli",
    "only": "onli",
    "ugly": "ugli",
    "gently": "gentl",
    "singly": "singl",
    "earring": "earring",
    "proceed": "proceed",
    "succeeded": "succeed",
    "inning": "inning",
    "outings": "outing",
    "news": "news",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
    "running": "run",
    "hopping": "hop",
    "hoping": "hope",             # short-word e-restoration
    "cries": "cri",
    "ties": "tie",
    "gas": "gas",
    "this": "this",
    "gaps": "gap",
    "kiwis": "kiwi",
    "happy": "happi",
    "happily": "happili",         # li after i is not a valid li-ending
    "fluently": "fluentli",       # longest match 'entli' fails R1 -> stop
    "beautifully": "beauti",
    "communication": "communic",  # commun- R1 prefix exception
    "generously": "generous",     # gener- R1 prefix exception
    "arsenic": "arsenic",
    "civilization": "civil",
    "decisiveness": "decis",
    "electricity": "electr",
    "conformability": "conform",
    "radically": "radic",
    "congratulations": "congratul",
}


def test_golden_pairs():
    for w, want in GOLDEN.items():
        assert MINE.stem(w) == want, (w, MINE.stem(w), want)


def test_golden_pairs_agree_with_nltk():
    for w in GOLDEN:
        assert MINE.stem(w) == ORACLE.stem(w), (
            w, MINE.stem(w), ORACLE.stem(w))


def test_fuzz_vs_nltk_oracle():
    """Composed morphology + random strings; divergence from nltk is
    allowed ONLY in the two known nltk string-tracking artifact patterns,
    and must stay rare (<0.5%)."""
    roots = ("nation rate condition commune general generous generate run "
             "hop hope ski sky die lie tie cry fly dry study happy early "
             "beauty care use fuse confuse form formal real ideal central "
             "active passive massive decisive sense sensitive sensible "
             "possible probable capable operate creator conform radical "
             "different vile analogous predicate feudal hopeful callous "
             "electric good succeed proceed exceed feed agree guarantee "
             "relate able cable happy merry busy easy fuss fuzz buzz mate "
             "skate state free flee see atlas luck pluck motor plaster "
             "sing control roll size prize hiss fizz fail file dote dangle "
             "ripe tame vex box know snow play pray enjoy employ day way "
             "boy toy gas kiwi ugly idly communism communal logic biology "
             "famous jealous fluent silent patient love like friend cost "
             "dead week full care end harm good dark weak able active "
             "civil organ optim quant ration station vacation senator "
             "alphabet identic chemic certific duplic authentic elastic "
             "talkative innovative normal neutral equal awful mad sad "
             "moral brutal final").split()
    sufs = ["", "s", "es", "ed", "ing", "ly", "ingly", "edly", "ness",
            "ful", "fulness", "ation", "ization", "ational", "ator",
            "alism", "ality", "ously", "ousness", "iveness", "ivity",
            "bility", "bly", "ance", "ence", "ement", "ment", "ism",
            "ate", "ity", "ous", "ive", "ize", "ion", "al", "er", "ic",
            "y", "ies", "ied", "e", "ee", "eed"]
    vocab = set(roots) | {r + s for r, s in itertools.product(roots, sufs)}
    rng = random.Random(0)
    for _ in range(2000):
        vocab.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                          for _ in range(rng.randint(1, 14))))
    for _ in range(2000):
        vocab.add("".join(rng.choice("aeiouybcdlmnrst")
                          for _ in range(rng.randint(2, 12))))

    diverged = []
    for w in sorted(vocab):
        a, b = MINE.stem(w), ORACLE.stem(w)
        if a != b:
            # known nltk artifacts: our result is the official fixed-R2
            # stem, nltk's keeps a trailing 'e' the integer semantics
            # deletes (a is b minus its final 'e')
            assert b == a + "e", (w, a, b)
            diverged.append(w)
    assert len(diverged) / len(vocab) < 0.005, diverged[:20]


def test_tokenize_lexical_defaults_to_snowball():
    toks = tokenize_lexical("the national conditions were dying")
    assert toks == ["nation", "condit", "die"]
    toks_porter = tokenize_lexical(
        "the national conditions were dying", stemmer="porter")
    assert toks_porter == ["nation", "condit", "dy"]


def test_lexical_index_persists_stemmer(tmp_path):
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    corpus = ["national conditions dying", "rational stations running"] * 3
    for algo in ("snowball", "porter"):
        idx = LexicalIndex.build(corpus, stemmer=algo)
        idx.save(tmp_path / algo)
        idx2 = LexicalIndex.load(tmp_path / algo)
        assert idx2.stemmer == algo
        import numpy as np
        np.testing.assert_array_equal(
            idx.encode_query("national dying"),
            idx2.encode_query("national dying"))
