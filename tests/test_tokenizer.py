"""Tokenizer protocols (models/tokenizer.py): ColBERT query/doc encoding,
persistence, and the hash fallback."""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.models.tokenizer import (
    ColBERTTokenizer,
    HashTokenizer,
)

CORPUS = [
    "TPUs multiply matrices using a systolic array called the MXU.",
    "JAX compiles numerical programs with XLA.",
    "Information retrieval ranks documents by relevance.",
] * 8


@pytest.fixture(scope="module")
def tok():
    return ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)


def test_query_protocol_mask_augmented(tok):
    """Queries: [BOS][Q]...[EOS] then [MASK]-padded to EXACTLY max_len
    (ColBERT query augmentation — all positions live)."""
    ids = tok.encode_query("systolic array", 16)
    assert ids.shape == (16,)
    assert ids[0] == tok.bos
    assert ids[1] == tok.qmark
    # padding region is MASK, never PAD
    content = [i for i in ids if i != tok.mask]
    assert tok.pad not in ids.tolist()
    assert ids.tolist().count(tok.mask) > 0
    assert tok.eos in content


def test_doc_protocol_padded_and_truncated(tok):
    ids, n = tok.encode_doc("JAX compiles numerical programs", 32)
    assert ids.shape == (32,)
    assert ids[0] == tok.bos and ids[1] == tok.dmark
    assert 4 <= n <= 32
    assert (ids[n:] == tok.pad).all()
    # truncation to max_len
    long_ids, n_long = tok.encode_doc(" ".join(CORPUS), 8)
    assert long_ids.shape == (8,) and n_long == 8


def test_count_tokens_monotonic(tok):
    a = tok.count_tokens("matrix")
    b = tok.count_tokens("matrix multiply units in the MXU")
    assert 0 < a < b


def test_save_load_identical(tok, tmp_path):
    p = tmp_path / "tok.json"
    tok.save(p)
    tok2 = ColBERTTokenizer.load(p)
    q1 = tok.encode_query("systolic array multiplication", 16)
    q2 = tok2.encode_query("systolic array multiplication", 16)
    np.testing.assert_array_equal(q1, q2)
    d1, n1 = tok.encode_doc(CORPUS[0], 24)
    d2, n2 = tok2.encode_doc(CORPUS[0], 24)
    np.testing.assert_array_equal(d1, d2)
    assert n1 == n2


def test_deterministic_across_training_runs():
    t1 = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    t2 = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    np.testing.assert_array_equal(t1.encode_query("the MXU", 8),
                                  t2.encode_query("the MXU", 8))


def test_hash_fallback_protocol():
    ht = HashTokenizer(vocab_size=128)
    ids = ht.encode_query("anything at all", 16)
    assert ids.shape == (16,)
    d, n = ht.encode_doc("some document text", 16)
    assert d.shape == (16,) and 0 < n <= 16
    # deterministic
    np.testing.assert_array_equal(ids, ht.encode_query("anything at all", 16))
    assert ht.count_tokens("a b c") > 0


def test_encode_docs_matches_per_text_encode_doc():
    """The batch path (used by the indexing hot loop) must produce ids and
    lengths identical to per-text encode_doc, on both the trained-BPE and
    hash-fallback tokenizers, regardless of the core-count heuristic."""
    texts = list(CORPUS) + ["", "one", "x " * 500]   # incl. empty + overflow
    for tok in (ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512),
                HashTokenizer(vocab_size=128)):
        ids_b, lens_b = tok.encode_docs(texts, 32)
        assert ids_b.shape == (len(texts), 32)
        for i, t in enumerate(texts):
            ids_1, n_1 = tok.encode_doc(t, 32)
            np.testing.assert_array_equal(ids_b[i], ids_1)
            assert lens_b[i] == n_1


def test_hash_tokenizer_stub_roundtrip(tmp_path):
    """A HashTokenizer session persists a JSON stub; load() must return a
    HashTokenizer with identical ids in every later session (previously it
    raised, leaving the app permanently unusable without the wheel)."""
    ht = HashTokenizer(vocab_size=256)
    ht.save(tmp_path / "tok.json")
    back = ColBERTTokenizer.load(tmp_path / "tok.json")
    assert isinstance(back, HashTokenizer)
    assert back.vocab_size == 256
    np.testing.assert_array_equal(back.encode_query("hello world", 16),
                                  ht.encode_query("hello world", 16))


def test_fold_text_canonicalizes_numbers_and_units():
    from hybrid_rag_colbertv2_tpu.utils.textfold import fold_text

    assert fold_text("sixty gigabytes in twelve hours") == "60 gb in 12 hr"
    assert fold_text("seventy percent busy, (two hundred) lanes!") == \
        "70 pct busy, (2 100) lanes!"
    # idempotent: canonical forms are fixed points
    assert fold_text(fold_text("ninety metres per second")) == \
        fold_text("ninety metres per second")
    # non-lexicon words and compositional forms pass through
    assert fold_text("twenty-one flavors") == "twenty-one flavors"


def test_fold_numeric_tokenizer_matches_surface_variants(tmp_path):
    """With fold_numeric on, 'sixty gigabytes' and '60 gb' tokenize
    identically (doc and query side), and the flag survives save/load.
    A bare (pretrained-style) tokenizer.json loads with folding OFF."""
    corpus = ["the transfer took sixty gigabytes over twelve hours"] * 4
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=512,
                                     fold_numeric=True)
    assert tok.fold_numeric
    a = tok.encode_query("sixty gigabytes", 16)
    b = tok.encode_query("60 gb", 16)
    np.testing.assert_array_equal(a, b)
    ids_d, n_d = tok.encode_doc("took sixty gigabytes", 16)
    ids_e, n_e = tok.encode_doc("took 60 gb", 16)
    np.testing.assert_array_equal(ids_d, ids_e)
    assert n_d == n_e
    # batch path folds too
    batch, lens = tok.encode_docs(["sixty gigabytes", "60 gb"], 16)
    np.testing.assert_array_equal(batch[0], batch[1])

    tok.save(tmp_path / "tok.json")
    back = ColBERTTokenizer.load(tmp_path / "tok.json")
    assert back.fold_numeric
    np.testing.assert_array_equal(back.encode_query("sixty gigabytes", 16), a)

    # unfolded tokenizer: same save path stays a bare HF file, loads OFF
    plain = ColBERTTokenizer.train_bpe(corpus, vocab_size=512)
    plain.save(tmp_path / "plain.json")
    back2 = ColBERTTokenizer.load(tmp_path / "plain.json")
    assert not back2.fold_numeric
