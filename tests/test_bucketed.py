"""Bucketed dense index: identical semantics to a single padded index,
smaller memory."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.index.bucketed import BucketedDenseIndex
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact


@pytest.fixture(scope="module")
def data(rng=None):
    rng = np.random.default_rng(3)
    n, l, d = 96, 96, 128
    docs = rng.standard_normal((n, l, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    # mixed lengths spanning several buckets
    lengths = np.concatenate([
        rng.integers(4, 33, n // 3),
        rng.integers(33, 65, n // 3),
        rng.integers(65, l + 1, n - 2 * (n // 3)),
    ]).astype(np.int32)
    rng.shuffle(lengths)
    tok = np.arange(l)
    docs *= tok[None, :, None] < lengths[:, None, None]
    q = rng.standard_normal((2, 32, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(docs), jnp.asarray(lengths)


def test_search_matches_exact(data):
    q, docs, lengths = data
    idx = BucketedDenseIndex.build(docs, lengths,
                                   bucket_sizes=(32, 64, 96),
                                   dtype="float32")
    assert len(idx.buckets) == 3
    got = idx.search_scores(q)
    ref = maxsim_scores_exact(q, docs, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-3, atol=3e-3)


def test_memory_smaller_than_single_bucket(data):
    q, docs, lengths = data
    # small pad multiple so per-bucket padding doesn't dominate at n=96
    # (at production scale the 128-doc padding is noise)
    bucketed = BucketedDenseIndex.build(docs, lengths,
                                        bucket_sizes=(32, 64, 96),
                                        dtype="int8", docs_pad_multiple=8)
    single = DenseTokenIndex.build(docs, lengths, doc_len=96, dtype="int8",
                                   docs_pad_multiple=8)
    assert bucketed.memory_bytes() < 0.8 * single.memory_bytes()


def test_rerank_and_gather(data):
    q, docs, lengths = data
    idx = BucketedDenseIndex.build(docs, lengths, bucket_sizes=(32, 64, 96),
                                   dtype="float32")
    ids = jnp.asarray([[5, 40, 90, -1], [0, 1, 2, 3]], jnp.int32)
    got = idx.rerank_scores(q, ids)
    ref_all = maxsim_scores_exact(q, docs, lengths)
    for b in range(2):
        for j, cid in enumerate(np.asarray(ids[b])):
            if cid < 0:
                assert float(got[b, j]) < -1e20
            else:
                np.testing.assert_allclose(float(got[b, j]),
                                           float(ref_all[b, cid]), rtol=2e-4)


def test_save_load_roundtrip(data, tmp_path):
    q, docs, lengths = data
    idx = BucketedDenseIndex.build(docs, lengths, bucket_sizes=(32, 96),
                                   dtype="int8")
    idx.save(tmp_path / "bidx")
    idx2 = BucketedDenseIndex.load(tmp_path / "bidx")
    np.testing.assert_allclose(np.asarray(idx.search_scores(q)),
                               np.asarray(idx2.search_scores(q)))


def test_single_bucket_degenerates(data):
    q, docs, lengths = data
    idx = BucketedDenseIndex.build(docs, lengths, bucket_sizes=(96,),
                                   dtype="float32")
    assert len(idx.buckets) == 1
    got = idx.search_scores(q)
    ref = maxsim_scores_exact(q, docs, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("dtype", ["int8", "int8-doc"])
@pytest.mark.parametrize("prefilter", [0, 16])
def test_bucketed_sharded_equals_single_device(dtype, prefilter):
    """VERDICT r1 next #8: bucketed x sharded composition. The one-jit
    sharded bucketed cascade on the 8-device mesh must return the same
    results as the single-device bucketed cascade."""
    import jax
    from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.parallel.mesh import (
        make_mesh, shard_bucketed_index)
    from hybrid_rag_colbertv2_tpu.parallel.sharded import (
        ShardedBucketedRetriever)
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever

    corpus = ([f"short doc {i} topic {i % 7}" for i in range(80)]
              + [f"long document {i} about topic {i % 7} "
                 + " ".join(f"w{j}" for j in range(40)) for i in range(48)])
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=512)
    enc = ColBERTEncoder(
        ColBERTConfig.tiny(vocab_size=tok.vocab_size, colbert_dim=128),
        tok, seed=0)
    cfg = RAGConfig(final_top_k=5, fusion_candidates=16,
                    dense_prefilter=prefilter)
    lex = LexicalIndex.build(corpus)
    embs, lengths = enc.encode_docs(corpus, doc_len=64)
    bidx = BucketedDenseIndex.build(embs, lengths, bucket_sizes=(16, 64),
                                    dtype=dtype, docs_pad_multiple=16)
    assert len(bidx.buckets) == 2

    mgr = IndexManager.__new__(IndexManager)
    mgr.lexical, mgr.dense, mgr.corpus = lex, bidx, corpus
    single = HybridRetriever(cfg, mgr, enc)
    queries = ["topic 3 w12", "short doc 41"]
    ids1, sc1 = single.retrieve_batch(queries)

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = ShardedBucketedRetriever(
        cfg, mesh, lex, shard_bucketed_index(bidx, mesh), enc)
    ids2, sc2 = sharded.retrieve_batch(queries)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-4, atol=1e-4)


def test_dense_append_matches_full_build():
    """Incremental append must give the same index as building from the
    full corpus (same layout, same quantization — row-wise, so per-doc
    deterministic)."""
    import jax.numpy as jnp
    import numpy as np
    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex

    rng = np.random.default_rng(3)
    n1, n2, L, D = 150, 90, 16, 32
    toks = rng.normal(size=(n1 + n2, L, D)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lens = rng.integers(L // 2, L + 1, n1 + n2).astype(np.int32)

    for dtype in ("float32", "int8"):
        full = DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lens),
                                     doc_len=L, dtype=dtype)
        part = DenseTokenIndex.build(jnp.asarray(toks[:n1]),
                                     jnp.asarray(lens[:n1]),
                                     doc_len=L, dtype=dtype)
        inc = part.append(jnp.asarray(toks[n1:]), jnp.asarray(lens[n1:]))
        assert inc.n_docs == full.n_docs
        assert inc.n_pad == full.n_pad
        np.testing.assert_array_equal(np.asarray(inc.doc_lengths),
                                      np.asarray(full.doc_lengths))
        np.testing.assert_array_equal(np.asarray(inc.emb_flat),
                                      np.asarray(full.emb_flat))
        if dtype == "int8":
            np.testing.assert_allclose(np.asarray(inc.scales),
                                       np.asarray(full.scales), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(inc.pooled.astype(jnp.float32)),
            np.asarray(full.pooled.astype(jnp.float32)), atol=1e-2)


def test_bucketed_append_matches_full_build(data):
    """BucketedDenseIndex.append: build(A).append(B) must score every doc
    identically to build(A+B) — per-doc quantization is independent, and
    search_scores scatters by global id, so the (B, N) matrices compare
    directly. Also covers opening a NEW bucket for lengths absent from
    the initial build."""
    import jax.numpy as jnp
    import numpy as np

    q, docs, lengths = data
    n = docs.shape[0]
    split = n - 5
    full = BucketedDenseIndex.build(docs, lengths, bucket_sizes=(16, 64),
                                    dtype="int8", docs_pad_multiple=16)
    inc = BucketedDenseIndex.build(docs[:split], lengths[:split],
                                   bucket_sizes=(16, 64), dtype="int8",
                                   docs_pad_multiple=16)
    inc = inc.append(docs[split:], lengths[split:],
                     bucket_sizes=(16, 64), docs_pad_multiple=16)
    assert inc.n_docs == full.n_docs == n
    np.testing.assert_allclose(np.asarray(inc.search_scores(q)),
                               np.asarray(full.search_scores(q)),
                               rtol=1e-5, atol=1e-5)
    v1, i1 = full.search_topk(q, 8)
    v2, i2 = inc.search_topk(q, 8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    # rerank path (gather across buckets incl. appended rows)
    np.testing.assert_allclose(
        np.asarray(inc.rerank_scores(q, i2)),
        np.asarray(full.rerank_scores(q, i1)), rtol=1e-4, atol=1e-4)

    # new-bucket case: initial build saw only short docs; the appended
    # batch carries lengths that need the larger bucket
    short_rows = np.asarray(lengths) <= 16
    assert short_rows.any() and (~short_rows).any()
    sel_s = jnp.asarray(np.nonzero(short_rows)[0])
    sel_l = jnp.asarray(np.nonzero(~short_rows)[0])
    inc2 = BucketedDenseIndex.build(docs[sel_s], lengths[sel_s],
                                    bucket_sizes=(16, 64), dtype="int8",
                                    docs_pad_multiple=16)
    assert len(inc2.buckets) == 1
    inc2 = inc2.append(docs[sel_l], lengths[sel_l],
                       bucket_sizes=(16, 64), docs_pad_multiple=16)
    assert len(inc2.buckets) == 2
    # global ids: order = shorts first then longs
    perm = np.concatenate([np.asarray(sel_s), np.asarray(sel_l)])
    sc = np.asarray(inc2.search_scores(q))
    ref = np.asarray(full.search_scores(q))[:, perm]
    np.testing.assert_allclose(sc, ref, rtol=1e-5, atol=1e-5)


def test_fused_bucketed_equals_composed(tmp_path):
    """VERDICT r3 next #3: the single-dispatch fused bucketed cascade must
    return exactly what the composed per-bucket path returns, and
    retrieve_batch must route through ONE executable call."""
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
    from hybrid_rag_colbertv2_tpu.models.colbert import (ColBERTConfig,
                                                         ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import (
        HybridRetriever, encode_query_terms)

    corpus = ([f"short doc {i} topic {i % 7}" for i in range(40)]
              + [" ".join(f"word{j} topic {i % 7} filler" for j in range(20))
                 + f" long doc {i}" for i in range(40, 80)])
    cfg = RAGConfig(fusion_candidates=16, final_top_k=8,
                    dense_prefilter=0,
                    mesh=MeshConfig(index_layout="bucketed",
                                    doc_token_buckets=(32, 64),
                                    index_dtype="int8"))
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=512)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    idx = IndexManager(cfg, enc)
    idx.build_all(corpus)
    r = HybridRetriever(cfg, idx, enc, chunk_store=None)
    queries = ["topic 3 long doc", "short doc 7", "word5 filler topic"]

    ids_fused, scores_fused = r.retrieve_batch(queries, 8)
    # oracle: the composed multi-dispatch path
    q_emb = enc.encode_queries(queries)
    q_terms = jnp.asarray(encode_query_terms(
        idx.lexical, queries, cfg.query_max_terms,
        cfg.query_term_buckets))
    ids_comp, scores_comp = r._cascade_bucketed_composed(q_emb, q_terms, 8)
    np.testing.assert_array_equal(ids_fused, ids_comp)
    np.testing.assert_allclose(scores_fused, scores_comp,
                               rtol=1e-5, atol=1e-5)

    # and with the pruned path + final rrf mode
    cfg2 = RAGConfig(fusion_candidates=16, final_top_k=8,
                     dense_prefilter=32, final_fusion="rrf",
                     fusion_weight_bm25=0.75,
                     mesh=MeshConfig(index_layout="bucketed",
                                     doc_token_buckets=(32, 64),
                                     index_dtype="int8"))
    r2 = HybridRetriever(cfg2, idx, enc, chunk_store=None)
    ids2, scores2 = r2.retrieve_batch(queries, 8)
    ids2c, scores2c = r2._cascade_bucketed_composed(q_emb, q_terms, 8)
    np.testing.assert_array_equal(ids2, ids2c)
    np.testing.assert_allclose(scores2, scores2c, rtol=1e-5, atol=1e-5)


def test_layout_switch_save_clears_stale_artifacts(data, tmp_path):
    """Saving a FLAT index over a previously-BUCKETED directory (and vice
    versa) must leave a directory the IndexManager loads as the new layout.
    Regression: a flat save left mapping.npz + bucket_* behind, the loader
    keyed off mapping.npz presence, and load died on the flat meta
    (KeyError 'n_buckets')."""
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    q, docs, lengths = data
    path = tmp_path / "idx"
    bucketed = BucketedDenseIndex.build(docs, lengths,
                                        bucket_sizes=(32, 96),
                                        dtype="float32")
    bucketed.save(path)
    assert (path / "mapping.npz").exists()

    flat = DenseTokenIndex.build(docs, lengths, doc_len=96, dtype="float32")
    flat.save(path)                      # layout switch: bucketed -> flat
    assert not (path / "mapping.npz").exists()
    assert not list(path.glob("bucket_*"))

    cfg = RAGConfig()
    cfg.colbert_index_path = str(path)
    cfg.bm25_index_path = str(tmp_path / "bm25")
    LexicalIndex.build(["alpha beta"] * 4).save(cfg.bm25_index_path)
    mgr = IndexManager(cfg)
    mgr.load()
    assert isinstance(mgr.dense, DenseTokenIndex)
    np.testing.assert_allclose(np.asarray(mgr.dense.search_scores(q)),
                               np.asarray(flat.search_scores(q)), rtol=1e-6)

    # and the reverse switch: flat -> bucketed (fewer buckets than a
    # previous wider save would also be cleared)
    bucketed.save(path)
    assert not (path / "dense.npz").exists()
    mgr2 = IndexManager(cfg)
    mgr2.load()
    assert isinstance(mgr2.dense, BucketedDenseIndex)
