"""Bounded per-k compiled-fn caches (VERDICT r2 weak #6): retrievers must
not grow one executable per distinct top_k_final forever, and repeated ks
must never recompile."""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import MeshConfig, RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
from hybrid_rag_colbertv2_tpu.models.colbert import (ColBERTConfig,
                                                     ColBERTEncoder)
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever
from hybrid_rag_colbertv2_tpu.utils.cache import JitCache

CORPUS = [f"document {i} about topic {i % 5} item {i}" for i in range(40)]


def test_jit_cache_lru_semantics():
    c = JitCache(max_entries=3)
    calls = []

    def mk(k):
        def build():
            calls.append(k)
            return f"fn{k}"
        return build

    for k in (1, 2, 3):
        assert c.get_or_build(k, mk(k)) == f"fn{k}"
    assert calls == [1, 2, 3] and len(c) == 3
    # hit: no rebuild, refreshes recency
    assert c.get_or_build(1, mk(1)) == "fn1"
    assert calls == [1, 2, 3]
    # overflow evicts the least recently used (2, not 1)
    c.get_or_build(4, mk(4))
    assert len(c) == 3 and 2 not in c and 1 in c
    # re-requesting the evicted key rebuilds once
    c.get_or_build(2, mk(2))
    assert calls == [1, 2, 3, 4, 2]


@pytest.fixture(scope="module")
def retriever():
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    cfg = RAGConfig(fusion_candidates=24, final_top_k=4)
    lex = LexicalIndex.build(CORPUS)
    embs, lengths = enc.encode_docs(CORPUS, doc_len=32)
    dense = DenseTokenIndex.build(embs, lengths, doc_len=32, dtype="float32")
    mgr = IndexManager(cfg, enc)
    mgr.lexical = lex
    mgr.dense = dense
    return HybridRetriever(cfg, mgr, enc)


def test_hybrid_retriever_k_cache_bounded(retriever):
    import hybrid_rag_colbertv2_tpu.retrieval.cascade as cascade_mod

    r = retriever
    old = cascade_mod._FUSED_CACHE
    cascade_mod._FUSED_CACHE = JitCache(max_entries=4)  # tighter bound
    try:
        cache = cascade_mod._FUSED_CACHE
        for k in range(1, 21):           # 20 distinct k values
            ids, scores = r.retrieve_batch(["topic 3 item 7"],
                                           top_k_final=k)
            assert ids.shape == (1, min(k, r.config.fusion_candidates))
        assert len(cache) <= 4
        distinct = len({min(k, r.config.fusion_candidates)
                        for k in range(1, 21)})
        assert cache.builds == distinct
        # a hot k never recompiles
        before = cache.builds
        r.retrieve_batch(["topic 1"], top_k_final=20)
        assert cache.builds == before
    finally:
        cascade_mod._FUSED_CACHE = old


def test_fused_executables_shared_across_retriever_instances(retriever):
    """Eval/gate harnesses build a fresh HybridRetriever per config; equal
    geometry+knobs must reuse the SAME compiled executable (module-level
    memoization), not re-jit per instance."""
    import hybrid_rag_colbertv2_tpu.retrieval.cascade as cascade_mod

    r = retriever
    r.retrieve_batch(["topic 2"])        # populate the cache
    before = cascade_mod._FUSED_CACHE.builds
    r2 = HybridRetriever(r.config, r.indexes, r.encoder)
    r2.retrieve_batch(["topic 2"])
    assert cascade_mod._FUSED_CACHE.builds == before


def test_encoder_forwards_shared_across_instances():
    """Multi-seed harnesses build one encoder per seed; equal geometry
    must reuse the SAME jitted forward executables (module cache), not
    re-jit per instance (~20 s per doc-forward compile on tunneled TPU)."""
    tok = ColBERTTokenizer.train_bpe(CORPUS[:8], vocab_size=128)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    e1 = ColBERTEncoder(cfg, tok, seed=0)
    e2 = ColBERTEncoder(cfg, tok, seed=1)
    assert e1._apply is e2._apply
    assert e1._apply_q is e2._apply_q
    # different geometry -> different executables
    e3 = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size,
                                           num_layers=1), tok)
    assert e3._apply is not e1._apply


def test_trainer_step_shared_across_instances():
    from hybrid_rag_colbertv2_tpu.train.trainer import (ColBERTTrainer,
                                                        TrainConfig)

    tok = ColBERTTokenizer.train_bpe(CORPUS[:8], vocab_size=128)
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    tc = TrainConfig(steps=2, batch_size=2, doc_len=16)
    t1 = ColBERTTrainer(ColBERTEncoder(cfg, tok, seed=0), tc)
    t2 = ColBERTTrainer(ColBERTEncoder(cfg, tok, seed=1), tc)
    assert t1.step_fn is t2.step_fn and t1.tx is t2.tx
    # different optimizer knobs -> fresh step
    t3 = ColBERTTrainer(ColBERTEncoder(cfg, tok, seed=2),
                        TrainConfig(steps=2, batch_size=2, doc_len=16,
                                    learning_rate=1e-4))
    assert t3.step_fn is not t1.step_fn


def test_sharded_retriever_k_cache_bounded():
    import jax

    from hybrid_rag_colbertv2_tpu.parallel.mesh import (make_mesh,
                                                        shard_dense_index)
    from hybrid_rag_colbertv2_tpu.parallel.sharded import ShardedRetriever

    assert len(jax.devices()) == 8
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    cfg = RAGConfig(fusion_candidates=16, final_top_k=4)
    lex = LexicalIndex.build(CORPUS)
    embs, lengths = enc.encode_docs(CORPUS, doc_len=32)
    dense = DenseTokenIndex.build(embs, lengths, doc_len=32, dtype="float32")
    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    r = ShardedRetriever(cfg, mesh, lex, shard_dense_index(dense, mesh), enc)
    r._fns = JitCache(max_entries=3)
    for k in (2, 4, 6, 8, 10, 4, 2):     # 5 distinct, 2 repeats
        ids, _ = r.retrieve_batch(["topic 3"], top_k_final=k)
        assert ids.shape == (1, k)
    assert len(r._fns) <= 3
    # 2 and 4 were evicted by 6/8/10, so the two repeats rebuild: 7 builds
    assert r._fns.builds == 7
    before = r._fns.builds
    r.retrieve_batch(["topic 0"], top_k_final=2)   # hot now
    assert r._fns.builds == before


def test_jit_cache_concurrent_single_build():
    """ADVICE r3: concurrent get_or_build for the SAME key must build
    once (a duplicate build is a wasted multi-minute tunnel compile);
    different keys may build concurrently; a failed build releases the
    key so a waiter can retry."""
    import threading
    import time

    c = JitCache(max_entries=8)
    n_builds = [0]
    results = []

    def build():
        n_builds[0] += 1
        time.sleep(0.05)
        return "fn"

    threads = [threading.Thread(
        target=lambda: results.append(c.get_or_build("k", build)))
        for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert n_builds[0] == 1 and results == ["fn"] * 8

    # failed build doesn't wedge the key
    def boom():
        raise RuntimeError("compile failed")

    try:
        c.get_or_build("bad", boom)
    except RuntimeError:
        pass
    assert c.get_or_build("bad", lambda: "ok") == "ok"
