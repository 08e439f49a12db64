"""Native C++ text processing must be byte-identical to the Python oracle.

Builds the shared library on demand (skips if no toolchain)."""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.index.textproc import (
    PorterStemmer,
    tokenize_lexical,
)
from hybrid_rag_colbertv2_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        if not native.build(verbose=True):
            pytest.skip("no C++ toolchain available")
        native._load_failed = False
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library failed to load")
    return lib


WORDS = [
    "caresses", "ponies", "cats", "feed", "agreed", "plastered", "motoring",
    "sing", "happy", "sky", "relational", "conditional", "rational",
    "valenci", "hesitanci", "digitizer", "conformabli", "radicalli",
    "differentli", "vileli", "analogousli", "vietnamization", "predication",
    "operator", "feudalism", "decisiveness", "hopefulness", "callousness",
    "formaliti", "sensitiviti", "sensibiliti", "triplicate", "formative",
    "formalize", "electriciti", "electrical", "hopeful", "goodness",
    "revival", "allowance", "inference", "airliner", "gyroscopic",
    "adjustable", "defensible", "irritant", "replacement", "adjustment",
    "dependent", "adoption", "homologou", "communism", "activate",
    "angulariti", "homologous", "effective", "bowdlerize", "probate",
    "rate", "cease", "controll", "roll", "a", "be", "run", "flying",
    "dying", "tied", "agreeing", "x1", "2025", "don't",
]


def test_stem_matches_python(lib):
    from hybrid_rag_colbertv2_tpu.index.textproc import SnowballStemmer

    porter, snow = PorterStemmer(), SnowballStemmer()
    for w in WORDS:
        assert native.stem_native(w, "porter") == porter.stem(w), w
        assert native.stem_native(w, "snowball") == snow.stem(w), w


def test_tokenize_corpus_matches_python(lib, rng):
    corpus = [
        "The quick brown foxes were running quickly over the lazy dogs!",
        "TPUs multiply matrices; systolic arrays stream operands (fast).",
        "",
        "   ",
        "UPPER lower MiXeD 123abc abc123 --- ***",
        "Stopwords only: the and of to a in is it",
        "don't can't won't o'clock it's",
        "unicode café naïve 中文 words",
    ]
    got = native.tokenize_corpus_native(corpus)
    want = [tokenize_lexical(t) for t in corpus]
    assert got == want


def test_tokenize_corpus_with_separator_byte(lib):
    """ADVICE r1: \\x1e is the C-ABI document separator; a document
    containing it (possible in PDF-extracted text) must not split into
    extra documents or shift doc ids."""
    corpus = [
        "clean document one",
        "dirty\x1edocument with a separator byte",
        "\x1e leading and trailing \x1e",
        "clean document two",
    ]
    got = native.tokenize_corpus_native(corpus)
    want = [tokenize_lexical(t) for t in corpus]
    assert len(got) == len(corpus)
    assert got == want


@pytest.mark.parametrize("stemmer", ["snowball", "porter"])
def test_tokenize_large_random_corpus(lib, rng, stemmer):
    vocab = ["".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"),
                                size=rng.integers(2, 12)))
             for _ in range(300)]
    # suffix-rich forms to exercise every stemmer step
    sufs = ["", "s", "es", "ed", "ing", "ly", "ness", "ful", "ation",
            "ization", "ator", "alism", "ality", "ously", "iveness",
            "ivity", "bility", "ance", "ence", "ement", "ism", "ate",
            "ity", "ous", "ive", "ize", "ion", "al", "er", "ic", "y",
            "ies", "ied", "eed", "ingly", "edly"]
    vocab = vocab + [v + s for v in vocab[:50] for s in sufs]
    corpus = [" ".join(rng.choice(vocab, size=30)) for _ in range(200)]
    got = native.tokenize_corpus_native(corpus, stemmer=stemmer)
    want = [tokenize_lexical(t, stemmer=stemmer) for t in corpus]
    assert got == want


def test_lexical_index_same_with_and_without_native(lib, tmp_path,
                                                    monkeypatch):
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    corpus = ["the quick brown fox jumps", "systolic arrays multiply",
              "ranking documents by relevance quickly"] * 5
    idx_native = LexicalIndex.build(corpus)
    monkeypatch.setenv("HRAG_NO_NATIVE", "1")
    idx_python = LexicalIndex.build(corpus)
    assert idx_native.vocab == idx_python.vocab
    np.testing.assert_array_equal(idx_native.indptr, idx_python.indptr)
    np.testing.assert_array_equal(idx_native.post_docs, idx_python.post_docs)
    np.testing.assert_allclose(idx_native.post_weights,
                               idx_python.post_weights)


def test_native_unicode_lower_parity_and_empty_corpus():
    """U+212A KELVIN SIGN lowercases to ASCII 'k' via Python str.lower();
    the native path must tokenize it identically (corpus goes native,
    queries go pure-Python — divergence silently breaks BM25 matches).
    Empty corpus must return [] (not one phantom empty doc)."""
    from hybrid_rag_colbertv2_tpu.index.textproc import tokenize_lexical
    from hybrid_rag_colbertv2_tpu.utils.native import (get_lib,
                                                       tokenize_corpus_native)

    if get_lib() is None:
        pytest.skip("native lib not built")
    t = "Kelvin scale measurement"
    assert tokenize_corpus_native([t]) == [tokenize_lexical(t)]
    assert tokenize_corpus_native([]) == []


def test_build_postings_matches_python_exactly(lib, rng):
    """The native one-pass postings builder must produce a BIT-identical
    LexicalIndex to the pure-Python path (vocab, CSR, weights, avgdl) —
    the numeric half is shared, so this pins the C++ tokenize/intern/
    aggregate half."""
    import os

    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    corpus = [
        "The quick brown foxes were running quickly over the lazy dogs!",
        "",
        "systolic arrays multiply matrices\x1e with MXU units",
        "café résumé Kelvin 123 ab",
        "don't it's won't apples apples apples",
        "Repeating repeated repeats repetition repetitive",
    ] * 17 + [f"unique document {i} speaks about topic {i % 9}"
              for i in range(50)]
    for cap in (0, 3):
        a = LexicalIndex.build(corpus, postings_cap=cap)
        os.environ["HRAG_NO_NATIVE"] = "1"
        try:
            b = LexicalIndex.build(corpus, postings_cap=cap)
        finally:
            del os.environ["HRAG_NO_NATIVE"]
        assert a.vocab == b.vocab
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.post_docs, b.post_docs)
        np.testing.assert_array_equal(a.post_weights, b.post_weights)
        assert a.avgdl == b.avgdl
        assert a.max_postings == b.max_postings
        assert a.n_docs == b.n_docs == len(corpus)


def test_build_postings_native_edge_cases(lib):
    from hybrid_rag_colbertv2_tpu.utils.native import build_postings_native

    # empty corpus contract
    terms, tids, dids, tfs, lens = build_postings_native([])
    assert terms == [] and len(tids) == 0 and len(lens) == 0
    # all-stopword / empty docs keep their slots (doc ids stay aligned)
    terms, tids, dids, tfs, lens = build_postings_native(
        ["the and of", "", "alpha beta", "alpha"])
    assert list(lens) == [0, 0, 2, 1]
    assert terms == ["alpha", "beta"]
    assert list(tids) == [0, 0, 1] and list(dids) == [2, 3, 2]
    assert list(tfs) == [1, 1, 1]
