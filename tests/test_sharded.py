"""Multi-chip paths on the 8-device virtual CPU mesh: sharded cascade must
agree with the single-device cascade (SURVEY.md section 4(c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
from hybrid_rag_colbertv2_tpu.models.colbert import ColBERTConfig, ColBERTEncoder
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
from hybrid_rag_colbertv2_tpu.parallel.mesh import make_mesh, shard_dense_index
from hybrid_rag_colbertv2_tpu.parallel.sharded import ShardedRetriever
from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever

CORPUS = [
    f"document {i} talks about topic {i % 7} and subject {i % 5} "
    f"with details on item {i}"
    for i in range(96)
] + [
    "TPUs multiply matrices using a systolic array called the MXU",
    "JAX compiles numerical programs with XLA for TPUs and GPUs",
    "Information retrieval ranks documents by relevance to a query",
    "Reciprocal rank fusion combines rankings from multiple retrievers",
]


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    cfg = RAGConfig()
    enc_cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    encoder = ColBERTEncoder(enc_cfg, tok, seed=0)
    lex = LexicalIndex.build(CORPUS)
    embs, lengths = encoder.encode_docs(CORPUS, doc_len=64)
    dense = DenseTokenIndex.build(embs, lengths, doc_len=64, dtype="float32")
    return cfg, encoder, lex, dense


QUERIES = [
    "systolic array matrix multiplication on TPU",
    "topic 3 subject 2 details",
    "rank fusion retrievers",
    "document 42",
]


def _single_device_results(cfg, encoder, lex, dense):
    mgr = IndexManager(cfg, encoder)
    mgr.lexical = lex
    mgr.dense = dense
    r = HybridRetriever(cfg, mgr, encoder)
    return r.retrieve_batch(QUERIES)


def test_sharded_matches_single_device(setup):
    cfg, encoder, lex, dense = setup
    ids1, scores1 = _single_device_results(cfg, encoder, lex, dense)

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    dense_sharded = shard_dense_index(dense, mesh)
    r = ShardedRetriever(cfg, mesh, lex, dense_sharded, encoder)
    ids8, scores8 = r.retrieve_batch(QUERIES)

    assert ids8.shape == ids1.shape
    for b in range(len(QUERIES)):
        np.testing.assert_allclose(
            np.sort(scores8[b]), np.sort(scores1[b]), rtol=1e-4,
            err_msg=f"query {b}")
        # identical candidate sets (ties may permute equal scores)
        assert set(ids8[b].tolist()) == set(ids1[b].tolist()), f"query {b}"


@pytest.mark.parametrize("dtype", ["int8", "int8-doc"])
@pytest.mark.parametrize("prefilter", [0, 32])
def test_sharded_flat_quantized_equals_single_device(setup, dtype,
                                                     prefilter):
    """VERDICT r2 next #6: the PRODUCTION flat quantized layouts (int8
    per-token-row scales and int8-doc per-document scales), with and
    without the pruned prefilter, must return the same results sharded
    over the 8-device mesh as on a single device — not merely finite
    shapes."""
    import copy

    cfg0, encoder, lex, dense = setup
    cfg = copy.deepcopy(cfg0)
    cfg.dense_prefilter = prefilter
    embs3 = dense.emb_flat.reshape(dense.n_pad, dense.doc_len, -1)
    denseq = DenseTokenIndex.build(
        embs3[: dense.n_docs], dense.doc_lengths[: dense.n_docs],
        doc_len=dense.doc_len, dtype=dtype)

    mgr = IndexManager(cfg, encoder)
    mgr.lexical = lex
    mgr.dense = denseq
    single = HybridRetriever(cfg, mgr, encoder)
    ids1, scores1 = single.retrieve_batch(QUERIES)

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = shard_dense_index(denseq, mesh)
    r = ShardedRetriever(cfg, mesh, lex, sharded, encoder)
    ids8, scores8 = r.retrieve_batch(QUERIES)

    assert ids8.shape == ids1.shape == (len(QUERIES), cfg.final_top_k)
    np.testing.assert_array_equal(ids8, ids1)
    np.testing.assert_allclose(scores8, scores1, rtol=1e-4, atol=1e-4)


def test_sharded_union_mode_equals_single_device(setup):
    """final_fusion='union' (the structural both-leg-floor gate entry)
    must be mesh-invariant like the other modes, and the floor invariant
    must hold on the sharded results too."""
    import copy

    cfg0, encoder, lex, dense = setup
    cfg = copy.deepcopy(cfg0)
    cfg.final_fusion = "union"

    mgr = IndexManager(cfg, encoder)
    mgr.lexical = lex
    mgr.dense = dense
    single = HybridRetriever(cfg, mgr, encoder)
    ids1, scores1 = single.retrieve_batch(QUERIES)

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = shard_dense_index(dense, mesh)
    r = ShardedRetriever(cfg, mesh, lex, sharded, encoder)
    ids8, scores8 = r.retrieve_batch(QUERIES)

    assert ids8.shape == ids1.shape == (len(QUERIES), cfg.final_top_k)
    for b in range(len(QUERIES)):
        np.testing.assert_allclose(
            np.sort(scores8[b]), np.sort(scores1[b]), rtol=1e-4,
            err_msg=f"query {b}")
        assert set(ids8[b].tolist()) == set(ids1[b].tolist()), f"query {b}"

    # floor invariant on the sharded output: BM25-only top-m present
    bcfg = copy.deepcopy(cfg0)
    bcfg.final_fusion = "rrf"
    bcfg.fusion_weight_bm25 = 1.0
    rb = HybridRetriever(bcfg, mgr, encoder)
    bids, _ = rb.retrieve_batch(QUERIES)
    m = cfg.final_top_k // 2
    for b in range(len(QUERIES)):
        got = set(int(i) for i in ids8[b] if i >= 0)
        for cid in bids[b][:m]:
            if int(cid) >= 0:
                assert int(cid) in got, (b, int(cid), sorted(got))


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_doc_sharded_bm25_equals_single_device(setup, dtype):
    """MeshConfig.shard_bm25: the lexical CSR sharded on the doc axis
    (each shard scoring only its owned docs + allgather merge) must be
    indistinguishable from the replicated-CSR cascade — a document's
    postings all live on its owner shard, so per-shard exact top-k then
    merge is exact."""
    import copy

    cfg0, encoder, lex, dense = setup
    if dtype == "int8":
        embs3 = dense.emb_flat.reshape(dense.n_pad, dense.doc_len, -1)
        dense = DenseTokenIndex.build(
            embs3[: dense.n_docs], dense.doc_lengths[: dense.n_docs],
            doc_len=dense.doc_len, dtype="int8")
    cfg = copy.deepcopy(cfg0)
    mgr = IndexManager(cfg, encoder)
    mgr.lexical = lex
    mgr.dense = dense
    ids1, scores1 = HybridRetriever(cfg, mgr, encoder).retrieve_batch(
        QUERIES)

    cfg.mesh.shard_bm25 = True
    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    r = ShardedRetriever(cfg, mesh, lex, shard_dense_index(dense, mesh),
                         encoder)
    ids8, scores8 = r.retrieve_batch(QUERIES)
    np.testing.assert_array_equal(ids8, ids1)
    np.testing.assert_allclose(scores8, scores1, rtol=1e-4, atol=1e-4)


def test_shard_postings_partition(setup):
    """shard_postings covers every posting exactly once with local ids."""
    _, _, lex, dense = setup
    n_shards = 4
    ip, pd, pw, mpl = lex.shard_postings(n_shards, dense.n_pad)
    n_local = dense.n_pad // n_shards
    assert ip.shape == (n_shards, len(lex.vocab) + 1)
    total = sum(int(ip[s, -1]) for s in range(n_shards))
    assert total == int(lex.indptr[-1])      # exact partition
    assert mpl % 128 == 0 and mpl >= 128
    for s in range(n_shards):
        nnz_s = int(ip[s, -1])
        assert (pd[s, :nnz_s] >= 0).all() and (pd[s, :nnz_s] < n_local).all()
        assert (pd[s, nnz_s:] == n_local).all()      # pad slots
        assert (pw[s, nnz_s:] == 0.0).all()
    # per-term reassembly matches the global CSR (global ids, weights)
    v = len(lex.vocab)
    for t in range(0, v, max(1, v // 13)):
        got = []
        for s in range(n_shards):
            a, b = int(ip[s, t]), int(ip[s, t + 1])
            got += [(int(d) + s * n_local, float(w))
                    for d, w in zip(pd[s, a:b], pw[s, a:b])]
        a, b = int(lex.indptr[t]), int(lex.indptr[t + 1])
        want = [(int(d), float(w)) for d, w in
                zip(lex.post_docs[a:b], lex.post_weights[a:b])]
        assert sorted(got) == sorted(want), t


def test_mesh_shapes(setup):
    cfg, encoder, lex, dense = setup
    for shape in [(2, 1), (4, 1)]:
        mesh = make_mesh(MeshConfig(mesh_shape=shape))
        sharded = shard_dense_index(dense, mesh)
        r = ShardedRetriever(cfg, mesh, lex, sharded, encoder)
        ids, _ = r.retrieve_batch(QUERIES[:1])
        ids1, _ = _single_device_results(cfg, encoder, lex, dense)
        assert set(ids[0].tolist()) == set(ids1[0].tolist()), shape


def test_tensor_parallel_encoder_forward(setup):
    """TP-sharded encoder params produce identical outputs on a
    (data=2, model=4) mesh."""
    import jax
    from hybrid_rag_colbertv2_tpu.parallel.params import (
        describe_shardings, shard_encoder_params)

    cfg, encoder, lex, dense = setup
    mesh = make_mesh(MeshConfig(mesh_shape=(2, 4)))
    ref = encoder.encode_queries(["systolic array", "fox"])
    sharded_params = shard_encoder_params(encoder.params, mesh)
    desc = describe_shardings(sharded_params)
    # TP actually applied to the transformer matrices
    assert any("model" in v for k, v in desc.items()
               if "intermediate/kernel" in k)
    assert any("model" in v for k, v in desc.items() if "query/kernel" in k)

    old = encoder.params
    try:
        encoder.params = sharded_params
        got = encoder.encode_queries(["systolic array", "fox"])
    finally:
        encoder.params = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dp_tp_train_step(setup):
    """One train step on a 2-D (data=4, model=2) mesh: DP batch + TP params."""
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.parallel.params import shard_encoder_params
    from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs
    from hybrid_rag_colbertv2_tpu.train.trainer import (
        ColBERTTrainer, TrainConfig)

    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    mesh = make_mesh(MeshConfig(mesh_shape=(4, 2)))
    enc.params = shard_encoder_params(enc.params, mesh)
    pairs_idx = pseudo_query_pairs(CORPUS, n_pairs_per_doc=1, seed=0)
    pairs = [(q, CORPUS[i]) for q, i in pairs_idx]
    trainer = ColBERTTrainer(enc, TrainConfig(batch_size=8, doc_len=32,
                                              steps=1), mesh=mesh)
    m = trainer.train(pairs, steps=1)
    assert np.isfinite(m[0]["loss"])


def test_sharded_top_k_final_larger_than_config(setup):
    """retrieve_batch(top_k_final > config.final_top_k) must return the
    requested width — the jitted fn rebuilds per k like HybridRetriever
    (previously the narrow array was silently sliced as a no-op)."""
    from hybrid_rag_colbertv2_tpu.parallel.mesh import shard_dense_index

    cfg, encoder, lex, dense = setup
    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = shard_dense_index(dense, mesh)
    r = ShardedRetriever(cfg, mesh, lex, sharded, encoder)
    assert cfg.final_top_k == 10   # the request below must exceed it
    ids, scores = r.retrieve_batch(["systolic array"], top_k_final=20)
    assert ids.shape == (1, 20) and scores.shape == (1, 20)
    assert (ids[0][:5] >= 0).all()
