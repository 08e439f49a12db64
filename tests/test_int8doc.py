""""int8-doc" index layout (per-document quantization scales).

VERDICT r1 #9: an opt-in index dtype whose exact scan avoids all
per-sims-element dequant/mask work (ops/maxsim.py::maxsim_scores_int8_doc).
These tests pin the index-level behavior: build/search/pruned/rerank/
persistence/append, and sharded-vs-single-device equality on the virtual
8-device mesh.
"""

import jax.numpy as jnp
import numpy as np

from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact


def _mk(rng, n=96, l=32, d=128):
    docs = rng.standard_normal((n, l, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    lengths = rng.integers(1, l + 1, size=(n,)).astype(np.int32)
    tok = np.arange(l)
    docs = docs * (tok[None, :, None] < lengths[:, None, None])
    q = rng.standard_normal((2, 16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[:, 12:, :] = 0.0
    return jnp.asarray(q), jnp.asarray(docs), jnp.asarray(lengths)


def test_build_and_search_close_to_fp32(rng):
    q, docs, lengths = _mk(rng)
    idx = DenseTokenIndex.build(docs, lengths, doc_len=32, dtype="int8-doc")
    assert idx.quant == "int8-doc"
    assert idx.scales is None and idx.doc_scales is not None
    got = np.asarray(idx.search_scores(q))
    truth = np.asarray(maxsim_scores_exact(q, docs, lengths))
    np.testing.assert_allclose(got, truth, rtol=0.08, atol=0.08)
    top_t = set(np.argsort(-truth[0])[:10].tolist())
    top_g = set(np.argsort(-got[0])[:10].tolist())
    assert len(top_t & top_g) >= 9


def test_pruned_degenerate_equals_brute(rng):
    q, docs, lengths = _mk(rng)
    idx = DenseTokenIndex.build(docs, lengths, doc_len=32, dtype="int8-doc")
    # C >= N -> pruned scores every doc exactly (fp32); the brute kernel
    # scan uses bf16 queries on the MXU, so compare at kernel tolerance
    bv, bi = idx.search_topk(q, k=10, prefilter=idx.n_pad)
    s = idx.search_scores(q)
    ev = np.sort(np.asarray(s))[:, ::-1][:, :10]
    np.testing.assert_allclose(np.asarray(bv), ev, rtol=2e-3, atol=2e-3)
    # and the pruned ids must be the fp32-exact top-10
    truth = maxsim_scores_exact(
        q, jnp.asarray(np.asarray(idx.emb_flat).reshape(
            idx.n_pad, 32, -1).astype(np.float32)
            * np.asarray(idx.doc_scales)[:, None, None]),
        idx.doc_lengths)[:, : idx.n_docs]
    want_ids = np.argsort(-np.asarray(truth), axis=1)[:, :10]
    np.testing.assert_array_equal(np.sort(np.asarray(bi)),
                                  np.sort(want_ids))


def test_rerank_uses_doc_scales(rng):
    q, docs, lengths = _mk(rng, n=32)
    idx = DenseTokenIndex.build(docs, lengths, doc_len=32, dtype="int8-doc")
    ids = jnp.asarray([[0, 5, 17, -1]] * 2, jnp.int32)
    rr = np.asarray(idx.rerank_scores(q, ids))
    truth = np.asarray(maxsim_scores_exact(q, docs, lengths))
    for b in range(2):
        for j, cid in enumerate([0, 5, 17]):
            np.testing.assert_allclose(rr[b, j], truth[b, cid],
                                       rtol=0.08, atol=0.08)
    assert (rr[:, 3] < -1e20).all()  # missing candidate masked


def test_save_load_roundtrip(rng, tmp_path):
    q, docs, lengths = _mk(rng)
    idx = DenseTokenIndex.build(docs, lengths, doc_len=32, dtype="int8-doc")
    idx.save(tmp_path / "idx")
    idx2 = DenseTokenIndex.load(tmp_path / "idx")
    assert idx2.quant == "int8-doc"
    np.testing.assert_allclose(np.asarray(idx.search_scores(q)),
                               np.asarray(idx2.search_scores(q)),
                               rtol=1e-5, atol=1e-5)


def test_append_keeps_layout(rng):
    q, docs, lengths = _mk(rng, n=64)
    idx = DenseTokenIndex.build(docs[:40], lengths[:40], doc_len=32,
                                dtype="int8-doc")
    idx2 = idx.append(docs[40:], lengths[40:])
    assert idx2.quant == "int8-doc" and idx2.n_docs == 64
    full = DenseTokenIndex.build(docs, lengths, doc_len=32,
                                 dtype="int8-doc")
    np.testing.assert_allclose(np.asarray(idx2.search_scores(q)),
                               np.asarray(full.search_scores(q)),
                               rtol=1e-5, atol=1e-5)


def test_sharded_equals_single_device(rng):
    import jax
    from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.parallel.mesh import (
        make_mesh, shard_dense_index)
    from hybrid_rag_colbertv2_tpu.parallel.sharded import ShardedRetriever
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager

    corpus = [f"document {i} about topic {i % 9} and term{i % 17}"
              for i in range(128)]
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=512)
    enc = ColBERTEncoder(
        ColBERTConfig.tiny(vocab_size=tok.vocab_size, colbert_dim=128),
        tok, seed=0)
    cfg = RAGConfig(final_top_k=5, fusion_candidates=16)
    cfg.mesh.index_dtype = "int8-doc"
    lex = LexicalIndex.build(corpus)
    embs, lengths = enc.encode_docs(corpus, doc_len=32)
    dense = DenseTokenIndex.build(embs, lengths, doc_len=32,
                                  dtype="int8-doc")

    # single-device truth via the unsharded cascade
    mgr = IndexManager.__new__(IndexManager)
    mgr.lexical, mgr.dense, mgr.corpus = lex, dense, corpus
    single = HybridRetriever(cfg, mgr, enc)
    ids1, sc1 = single.retrieve_batch(["topic 3 term5", "document 7"])

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = ShardedRetriever(cfg, mesh, lex,
                               shard_dense_index(dense, mesh), enc)
    ids2, sc2 = sharded.retrieve_batch(["topic 3 term5", "document 7"])
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-4, atol=1e-4)
