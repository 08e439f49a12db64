"""Pruned two-stage dense search (ops/prefilter.py).

Properties tested:
  * pooled prefilter vectors match a numpy oracle (mean of valid tokens,
    L2-normalized);
  * degenerate exactness — with n_candidates >= n_docs the pruned top-k is
    identical to the brute-force MaxSim scan (fp32 and int8 indexes);
  * recall on clustered data with a real (4x) pruning ratio;
  * the hybrid cascade with prefilter enabled agrees with prefilter=0;
  * the sharded cascade with per-shard prefilter agrees with single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact
from hybrid_rag_colbertv2_tpu.ops.prefilter import (
    maxsim_topk_pruned,
    pooled_doc_embeddings,
)

DIM = 32
DOC_LEN = 16


def _clustered_corpus(rng, n_docs, n_topics=8):
    """Unit-norm token embeddings clustered around per-doc topic vectors —
    the pooled proxy is informative here (as with real encoder output),
    unlike i.i.d. random tokens."""
    topics = rng.normal(size=(n_topics, DIM))
    topics /= np.linalg.norm(topics, axis=-1, keepdims=True)
    assign = rng.integers(0, n_topics, n_docs)
    lengths = rng.integers(DOC_LEN // 2, DOC_LEN + 1, n_docs).astype(np.int32)
    toks = topics[assign][:, None, :] + 0.35 * rng.normal(
        size=(n_docs, DOC_LEN, DIM))
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.arange(DOC_LEN)[None, :] < lengths[:, None]
    toks = toks * mask[:, :, None]
    return jnp.asarray(toks, jnp.float32), jnp.asarray(lengths), topics, assign


def _queries(rng, topics, n=4, lq=8):
    q = topics[rng.integers(0, len(topics), n)][:, None, :] + 0.3 * rng.normal(
        size=(n, lq, DIM))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q, jnp.float32)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    toks, lengths, topics, assign = _clustered_corpus(rng, 300)
    queries = _queries(rng, topics)
    return toks, lengths, topics, queries


def test_pooled_matches_numpy_oracle(data):
    toks, lengths, _, _ = data
    idx = DenseTokenIndex.build(toks, lengths, doc_len=DOC_LEN,
                                dtype="float32")
    pooled = np.asarray(idx.pooled.astype(jnp.float32))
    t = np.asarray(toks)
    lens = np.asarray(lengths)
    for i in [0, 5, 299]:
        mean = t[i, : lens[i]].mean(axis=0)
        want = mean / np.linalg.norm(mean)
        np.testing.assert_allclose(pooled[i], want, atol=2e-2)
    # padding docs pool to zero
    assert np.abs(pooled[idx.n_docs:]).max() == 0.0


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_exact_when_candidates_cover_corpus(data, dtype):
    """With C >= n_docs the pruned search IS the exact fp32 scan — compare
    against the maxsim_scores_exact oracle on dequantized embeddings (the
    brute Pallas kernel path differs by bf16 rounding, so it is not the
    oracle here)."""
    toks, lengths, _, queries = data
    idx = DenseTokenIndex.build(toks, lengths, doc_len=DOC_LEN, dtype=dtype)
    k = 10
    docs = idx.emb_flat.reshape(idx.n_pad, DOC_LEN, DIM).astype(jnp.float32)
    if idx.is_int8:
        docs = docs * idx.scales.reshape(idx.n_pad, DOC_LEN)[..., None]
    oracle = maxsim_scores_exact(queries, docs, idx.doc_lengths)
    bv, bi = jax.lax.top_k(oracle[:, : idx.n_docs], k)
    pv, pi = idx.search_topk(queries, k, prefilter=idx.n_docs)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(bv), rtol=1e-5,
                               atol=1e-5)
    for b in range(queries.shape[0]):
        assert set(np.asarray(pi)[b].tolist()) == set(
            np.asarray(bi)[b].tolist()), b


def test_recall_at_real_pruning_ratio(data):
    toks, lengths, _, queries = data
    idx = DenseTokenIndex.build(toks, lengths, doc_len=DOC_LEN,
                                dtype="float32")
    k = 10
    _, exact_ids = idx.search_topk(queries, k, prefilter=0)
    _, pruned_ids = idx.search_topk(queries, k, prefilter=128)  # ~2.3x prune
    exact_ids, pruned_ids = np.asarray(exact_ids), np.asarray(pruned_ids)
    recalls = [
        len(set(pruned_ids[b]) & set(exact_ids[b])) / k
        for b in range(queries.shape[0])
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_pruned_ids_valid_and_missing_marked(data):
    toks, lengths, _, queries = data
    idx = DenseTokenIndex.build(toks[:5], lengths[:5], doc_len=DOC_LEN,
                                dtype="float32")
    vals, ids = idx.search_topk(queries, 10, prefilter=64)
    ids = np.asarray(ids)
    # only 5 real docs -> at most 5 valid results, rest marked -1
    assert (ids < 5).all()
    assert (ids[:, 5:] == -1).all()


def _cascade_ids(cfg, lex, dense, q_emb, q_terms):
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade

    ids, scores, _ = hybrid_cascade(
        q_emb, q_terms,
        jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights),
        dense.emb_flat, dense.scales, dense.doc_lengths,
        dense.ensure_pooled() if cfg.dense_prefilter else None,
        prefilter=cfg.dense_prefilter,
        n_docs=dense.n_docs, max_postings=lex.max_postings,
        doc_len=dense.doc_len, is_int8=dense.is_int8,
        k_each=20, k_fuse=15, k_final=5)
    return np.asarray(ids), np.asarray(scores)


def test_cascade_with_prefilter_matches_brute(data):
    toks, lengths, _, queries = data
    n = int(toks.shape[0])
    corpus = [f"doc {i} topic {i % 8} words alpha beta" for i in range(n)]
    lex = LexicalIndex.build(corpus)
    q_terms = jnp.asarray(
        np.stack([lex.encode_query("topic 3 alpha"),
                  lex.encode_query("doc 7 beta")] * 2))
    dense = DenseTokenIndex.build(toks, lengths, doc_len=DOC_LEN,
                                  dtype="float32")
    cfg0 = RAGConfig(dense_prefilter=0)
    # prefilter covering the corpus -> identical cascade output
    cfg_all = RAGConfig(dense_prefilter=n)
    ids0, s0 = _cascade_ids(cfg0, lex, dense, queries, q_terms)
    ids1, s1 = _cascade_ids(cfg_all, lex, dense, queries, q_terms)
    np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-5)
    for b in range(ids0.shape[0]):
        assert set(ids1[b].tolist()) == set(ids0[b].tolist()), b


def test_bucketed_pruned_matches_brute(data):
    from hybrid_rag_colbertv2_tpu.index.bucketed import BucketedDenseIndex

    toks, lengths, _, queries = data
    idx = BucketedDenseIndex.build(
        toks, lengths, bucket_sizes=(8, 16), dtype="float32",
        docs_pad_multiple=16)
    k = 10
    bv, bi = idx.search_topk(queries, k, prefilter=0)
    pv, pi = idx.search_topk(queries, k, prefilter=idx.n_docs)
    # both exact (prefilter covers every bucket) up to bf16 kernel rounding
    np.testing.assert_allclose(np.asarray(pv), np.asarray(bv), rtol=5e-3,
                               atol=5e-3)
    for b in range(queries.shape[0]):
        # candidate sets may swap at near-tie boundaries (bf16 vs fp32) —
        # require >= 9/10 overlap
        assert len(set(np.asarray(pi)[b].tolist())
                   & set(np.asarray(bi)[b].tolist())) >= 9, b


def test_sharded_prefilter_matches_single_device(data):
    from hybrid_rag_colbertv2_tpu.parallel.mesh import (
        make_mesh, shard_dense_index)
    from hybrid_rag_colbertv2_tpu.parallel.sharded import ShardedRetriever
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer

    corpus = [
        f"document {i} about topic {i % 7} subject {i % 5}" for i in range(64)
    ]
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=256)
    encoder = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size),
                             tok, seed=0)
    lex = LexicalIndex.build(corpus)
    embs, lens = encoder.encode_docs(corpus, doc_len=32)
    dense = DenseTokenIndex.build(embs, lens, doc_len=32, dtype="float32")
    # per-shard prefilter covering each shard's docs -> exact
    cfg = RAGConfig(dense_prefilter=dense.n_pad // 8)

    mgr = IndexManager(cfg, encoder)
    mgr.lexical, mgr.dense = lex, dense
    ids1, s1 = HybridRetriever(cfg, mgr, encoder).retrieve_batch(
        ["topic 3 subject 2", "document 42"])

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = shard_dense_index(dense, mesh)
    r = ShardedRetriever(cfg, mesh, lex, sharded, encoder)
    ids8, s8 = r.retrieve_batch(["topic 3 subject 2", "document 42"])
    for b in range(2):
        np.testing.assert_allclose(np.sort(s8[b]), np.sort(s1[b]), rtol=1e-4)
        assert set(ids8[b].tolist()) == set(ids1[b].tolist()), b


def test_approx_or_exact_topk_gate():
    from hybrid_rag_colbertv2_tpu.ops.prefilter import approx_or_exact_topk

    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.normal(size=(4, 1024)).astype(np.float32))
    # gate off (k > n/8): exact — identical to lax.top_k
    v_exact, i_exact = jax.lax.top_k(s, 256)
    v, i = approx_or_exact_topk(s, 256, approx_recall=0.95)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_exact))
    # gate on (k <= n/8): approx — still a valid high-recall candidate set
    v_exact, i_exact = jax.lax.top_k(s, 64)
    v, i = approx_or_exact_topk(s, 64, approx_recall=0.95)
    assert i.shape == (4, 64)
    for b in range(4):
        overlap = len(set(np.asarray(i)[b].tolist())
                      & set(np.asarray(i_exact)[b].tolist()))
        assert overlap >= 57, overlap  # ~0.95 per-element recall
    # recall 1.0 -> exact regardless of k
    v, i = approx_or_exact_topk(s, 64, approx_recall=1.0)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_exact))
