"""Contrastive training: loss decreases, accuracy rises, retrieval quality
improves over random init; DP-sharded step runs on the virtual mesh."""

import jax
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
from hybrid_rag_colbertv2_tpu.models.colbert import ColBERTConfig, ColBERTEncoder
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
from hybrid_rag_colbertv2_tpu.parallel.mesh import make_mesh
from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs
from hybrid_rag_colbertv2_tpu.train.trainer import ColBERTTrainer, TrainConfig

TOPICS = [
    ("astronomy", "telescope galaxy nebula star planet orbit cosmos"),
    ("cooking", "recipe sauce boil saute pan flavor ingredient spice"),
    ("hardware", "systolic array matrix multiply MXU VMEM bandwidth chip"),
    ("music", "melody rhythm chord harmony tempo instrument song"),
    ("ocean", "coral reef tide current whale plankton salinity wave"),
    ("law", "statute contract liability court verdict clause appeal"),
    ("botany", "leaf chlorophyll root stem pollen photosynthesis seed"),
    ("sports", "goal referee stadium league score tournament defense"),
]
# unique docs — duplicate texts would make in-batch labels ambiguous
CORPUS = [
    f"This chunk number {i} is about {name}: " + " ".join([words] * 3)
    for i, (name, words) in enumerate(TOPICS)
]


@pytest.fixture(scope="module")
def trained():
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=12, seed=0)
    pairs = [(q, CORPUS[i]) for q, i in pairs_idx]
    trainer = ColBERTTrainer(
        enc, TrainConfig(batch_size=8, doc_len=64, steps=200,
                         learning_rate=1e-3))
    metrics = trainer.train(pairs)
    return enc, tok, metrics


def test_loss_decreases_accuracy_rises(trained):
    enc, tok, metrics = trained
    first = np.mean([m["loss"] for m in metrics[:5]])
    last = np.mean([m["loss"] for m in metrics[-5:]])
    assert last < first * 0.8, (first, last)
    assert np.mean([m["accuracy"] for m in metrics[-5:]]) > 0.5


def test_trained_encoder_improves_retrieval(trained):
    enc, tok, _ = trained
    embs, lengths = enc.encode_docs(CORPUS, doc_len=64)
    dense = DenseTokenIndex.build(embs, lengths, doc_len=64, dtype="float32")
    queries = ["telescope galaxy star", "recipe sauce flavor",
               "systolic array MXU", "melody chord rhythm"]
    hits = 0
    for qi, q in enumerate(queries):
        scores = dense.search_scores(enc.encode_queries([q]))
        top = int(np.argmax(np.asarray(scores[0])))
        if top % len(TOPICS) == qi:
            hits += 1
    assert hits >= 3, f"only {hits}/4 topics retrieved correctly"


def test_mine_hard_negatives_excludes_positive():
    from hybrid_rag_colbertv2_tpu.train.data import mine_hard_negatives

    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=2, seed=0)
    mined = mine_hard_negatives(CORPUS, pairs_idx, n_negatives=3, seed=0)
    assert len(mined) == len(pairs_idx)
    for q, pos, negs in mined:
        assert len(negs) == 3
        assert pos not in negs
        assert len(set(negs)) == 3
    assert all(0 <= j < len(CORPUS) for _, _, negs in mined for j in negs)


def test_hard_negative_training_loss_decreases():
    from hybrid_rag_colbertv2_tpu.train.data import mine_hard_negatives

    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=6, seed=0)
    mined = mine_hard_negatives(CORPUS, pairs_idx, n_negatives=2, seed=0)
    pairs = [(q, CORPUS[i], [CORPUS[j] for j in negs])
             for q, i, negs in mined]
    trainer = ColBERTTrainer(
        enc, TrainConfig(batch_size=8, doc_len=64, steps=60,
                         learning_rate=1e-3))
    metrics = trainer.train(pairs)
    first = np.mean([m["loss"] for m in metrics[:5]])
    last = np.mean([m["loss"] for m in metrics[-5:]])
    assert last < first * 0.8, (first, last)
    # accuracy is over B + B*H candidates (24 here), chance ~4%
    assert np.mean([m["accuracy"] for m in metrics[-5:]]) > 0.4


def test_inconsistent_negative_counts_raise():
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    trainer = ColBERTTrainer(enc, TrainConfig(batch_size=2, doc_len=32,
                                              steps=1))
    bad = [("q one", CORPUS[0], [CORPUS[1]]),
           ("q two", CORPUS[2], [CORPUS[3], CORPUS[4]])]
    with pytest.raises(ValueError, match="inconsistent"):
        trainer.train(bad, steps=1)


def test_dp_sharded_train_step_runs():
    assert len(jax.devices()) == 8
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=2, seed=0)
    pairs = [(q, CORPUS[i]) for q, i in pairs_idx]
    trainer = ColBERTTrainer(
        enc, TrainConfig(batch_size=16, doc_len=64, steps=3), mesh=mesh)
    metrics = trainer.train(pairs)
    assert len(metrics) == 3
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_checkpoint_resume(tmp_path):
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=2, seed=0)
    pairs = [(q, CORPUS[i]) for q, i in pairs_idx]
    trainer = ColBERTTrainer(enc, TrainConfig(batch_size=4, doc_len=32,
                                              steps=2))
    trainer.train(pairs, steps=2)
    trainer.save_checkpoint(str(tmp_path / "ckpt"), step=2)

    enc2 = ColBERTEncoder(cfg, tok, seed=99)  # different init
    t2 = ColBERTTrainer(enc2, TrainConfig(batch_size=4, doc_len=32, steps=2))
    step = t2.restore_checkpoint(str(tmp_path / "ckpt"))
    assert step == 2
    q1 = enc.encode_queries(["telescope"])
    q2 = enc2.encode_queries(["telescope"])
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    # resumed training continues without error
    m = t2.train(pairs, steps=1)
    assert np.isfinite(m[0]["loss"])


def test_mine_hard_negatives_tiny_corpus_terminates():
    """n_negatives > available negatives must clamp, not loop forever
    (the public helper has no corpus-size guard of its own)."""
    from hybrid_rag_colbertv2_tpu.train.data import mine_hard_negatives

    tiny = CORPUS[:3]
    pairs_idx = pseudo_query_pairs(tiny, n_pairs_per_doc=1, seed=0)
    mined = mine_hard_negatives(tiny, pairs_idx, n_negatives=4, seed=0)
    for q, pos, negs in mined:
        assert len(negs) == 2                      # min(4, 3 - 1)
        assert pos not in negs and len(set(negs)) == 2


def test_mine_hard_negatives_uses_mine_text():
    """(query, pos, mine_text) triples mine BM25 negatives on mine_text:
    a synonym-substituted query has no lexical anchors left, so its
    negatives must come from the ORIGINAL span's lexical confusers
    (pseudo_query_pairs ``with_mine_text`` contract)."""
    from hybrid_rag_colbertv2_tpu.train.data import mine_hard_negatives

    # query text is gibberish (zero BM25 anchors); mine_text targets the
    # hardware chunk's vocabulary
    triples = [("zzq xxv qqw", 0, "systolic array matrix multiply")]
    mined = mine_hard_negatives(CORPUS, triples, n_negatives=1, seed=0)
    assert len(mined) == 1
    q, pos, negs = mined[0]
    assert q == "zzq xxv qqw" and pos == 0
    assert negs == [2]  # the hardware chunk — mine_text's top BM25 hit
    # same gibberish query WITHOUT mine_text: nothing scores > 0, so the
    # negative is random padding (can be anything but the positive)
    mined2 = mine_hard_negatives(CORPUS, [("zzq xxv qqw", 0)],
                                 n_negatives=1, seed=0)
    assert mined2[0][2][0] != 0


def test_pseudo_query_pairs_with_mine_text():
    """with_mine_text returns triples whose third element is the span
    BEFORE synonym substitution (and equals the query when no
    substitution happened)."""
    corpus = ["the fast bread rose sixty percent in the oven chamber"] * 4
    triples = pseudo_query_pairs(corpus, n_pairs_per_doc=4, seed=3,
                                 synonym_prob=1.0, with_mine_text=True)
    assert triples and all(len(t) == 3 for t in triples)
    changed = 0
    for q, idx, mine in triples:
        assert mine in " ".join(corpus[idx].split())  # verbatim span
        if q != mine:
            changed += 1
    assert changed > 0  # prob=1.0 over lexicon-covered words must fire


def test_small_pair_set_trains_without_duplicated_positives():
    """Fewer distinct positives than batch_size: train on the smaller
    batch (duplicating pairs floors the loss at log(#dups) and pushes
    identical docs apart)."""
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    pairs = [("about astronomy", CORPUS[0]),
             ("about cooking", CORPUS[1]),
             ("about hardware", CORPUS[2])]
    trainer = ColBERTTrainer(enc, TrainConfig(batch_size=16, doc_len=32,
                                              steps=2))
    metrics = trainer.train(pairs)
    assert len(metrics) == 2
    assert all(np.isfinite(m["loss"]) for m in metrics)
    # with 3 distinct candidates, perfect loss can approach 0 — the
    # duplicated-positive floor log(16/3) can NOT be beaten by tiling;
    # just assert the step ran on the 3-wide batch (acc over 3 classes)
    assert metrics[-1]["accuracy"] <= 1.0


def test_tie_regularizer_limits_synonym_drift():
    """TrainConfig.tie_weight keeps lexicon (key, synonym) embedding rows
    close through training. Rows start EQUAL (tie_synonym_embeddings) but
    contrastive updates drift them apart; the regularizer bounds that
    drift without breaking the contrastive loss."""
    from hybrid_rag_colbertv2_tpu.train.lexicon import (
        lexicon_sentences, synonym_tie_pairs, tie_synonym_embeddings)

    corpus = [
        f"chunk {i} about {name}: the fast kernel moved sixty " + words
        for i, (name, words) in enumerate(TOPICS)
    ]
    tok = ColBERTTokenizer.train_bpe(corpus + lexicon_sentences(),
                                     vocab_size=1024)
    tie_pairs = tuple(synonym_tie_pairs(tok, tok.vocab_size))
    assert len(tie_pairs) >= 20
    pairs_idx = pseudo_query_pairs(corpus, n_pairs_per_doc=8, seed=0)
    pairs = [(q, corpus[i]) for q, i in pairs_idx]

    def drift(tie_weight):
        cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
        enc = ColBERTEncoder(cfg, tok, seed=0)
        tie_synonym_embeddings(enc.params, tok)
        trainer = ColBERTTrainer(
            enc, TrainConfig(batch_size=8, doc_len=64, steps=60,
                             learning_rate=3e-3, tie_weight=tie_weight,
                             tie_pairs=tie_pairs if tie_weight else None))
        metrics = trainer.train(pairs)
        assert all(np.isfinite(m["loss"]) for m in metrics)
        e = np.asarray(enc.params["word_embeddings"]["embedding"])
        a = np.array([p[0] for p in tie_pairs])
        b = np.array([p[1] for p in tie_pairs])
        return float(np.mean(np.sum((e[a] - e[b]) ** 2, axis=-1)))

    d_free, d_tied = drift(0.0), drift(1.0)
    assert d_free > 0.0          # contrastive updates do drift tied rows
    assert d_tied < d_free * 0.5  # the regularizer bounds the drift


def test_mine_text_verbatim_under_word_dropout():
    """mine_text is captured BEFORE word dropout: the duplicate-positive
    filter in mine_hard_negatives tests `mine_q in corpus[i]`, which is
    only meaningful for a verbatim substring — a post-dropout span
    silently disabled it (code-review r4)."""
    corpus = ["the fast bread rose sixty percent in the oven today"] * 4
    triples = pseudo_query_pairs(corpus, n_pairs_per_doc=6, seed=3,
                                 synonym_prob=1.0, word_dropout=0.4,
                                 with_mine_text=True)
    assert triples and all(m in corpus[i] for _, i, m in triples)
    # dropout actually fired on some queries (shorter than their span)
    assert any(len(q.split()) < len(m.split()) for q, _, m in triples)
