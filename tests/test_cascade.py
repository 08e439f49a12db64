"""Full hybrid cascade vs a pure-numpy oracle of the reference algorithm
(BM25 -> MaxSim -> RRF -> rerank; local_rag_complete.py:894-935)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
from hybrid_rag_colbertv2_tpu.models.colbert import ColBERTConfig, ColBERTEncoder
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
from hybrid_rag_colbertv2_tpu.ops.fusion import rrf_reference_py
from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact
from hybrid_rag_colbertv2_tpu.retrieval.cascade import (
    HybridRetriever,
    hybrid_cascade,
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast auburn fox leaped over sleeping hounds",
    "TPUs multiply matrices using a systolic array called the MXU",
    "JAX compiles numerical programs with XLA for TPUs and GPUs",
    "The dog sleeps while the fox runs through the forest",
    "Systolic arrays stream operands through a grid of multipliers",
    "Information retrieval ranks documents by relevance to a query",
    "BM25 is a classic lexical ranking function for retrieval",
    "Reciprocal rank fusion combines rankings from multiple retrievers",
    "ColBERT scores queries and documents with late interaction MaxSim",
    "PDF documents are converted to markdown before chunking",
    "Semantic chunking respects the heading structure of a document",
] * 4  # 48 docs


@pytest.fixture(scope="module")
def setup():
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)
    cfg = RAGConfig()
    enc_cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    encoder = ColBERTEncoder(enc_cfg, tok, seed=0)
    mgr = IndexManager(cfg, encoder)
    lex = LexicalIndex.build(CORPUS)
    mgr.lexical = lex
    embs, lengths = encoder.encode_docs(CORPUS, doc_len=64)
    mgr.dense = DenseTokenIndex.build(embs, lengths, doc_len=64,
                                      dtype="float32")
    mgr.corpus = list(CORPUS)
    return cfg, mgr, encoder, lex


def _oracle(query, lex, dense, encoder, k_each=100, k_fuse=50, k_final=10):
    """The reference cascade, in numpy, with exact MaxSim everywhere."""
    bm25 = lex.score_host(query)
    q_emb = np.asarray(encoder.encode_queries([query]))
    docs = np.asarray(dense.emb_flat).reshape(dense.n_pad, dense.doc_len, -1)
    lens = np.asarray(dense.doc_lengths)
    ms = np.asarray(maxsim_scores_exact(
        jnp.asarray(q_emb), jnp.asarray(docs[: dense.n_docs]),
        jnp.asarray(lens[: dense.n_docs])))[0]
    n = dense.n_docs
    ke = min(k_each, n)
    bm25_rank = [i for i in np.argsort(-bm25)[:ke] if bm25[i] > 0]
    ms_rank = np.argsort(-ms)[:ke].tolist()
    fused = rrf_reference_py(bm25_rank, ms_rank)[: min(k_fuse, n)]
    cand = [cid for cid, _ in fused]
    rr = {cid: float(maxsim_scores_exact(
        jnp.asarray(q_emb), jnp.asarray(docs[cid : cid + 1]),
        jnp.asarray(lens[cid : cid + 1]))[0, 0]) for cid in cand}
    final = sorted(cand, key=lambda c: -rr[c])[:k_final]
    return final, rr


def test_cascade_matches_oracle(setup):
    cfg, mgr, encoder, lex = setup
    dense = mgr.dense
    queries = [
        "how does the systolic array multiply matrices",
        "fox jumping over a dog",
        "rank fusion for retrieval",
    ]
    q_emb = encoder.encode_queries(queries)
    q_terms = jnp.asarray(np.stack([lex.encode_query(q) for q in queries]))
    ids, scores, dbg = hybrid_cascade(
        q_emb, q_terms,
        jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights),
        dense.emb_flat, dense.scales, dense.doc_lengths,
        n_docs=dense.n_docs, max_postings=lex.max_postings,
        doc_len=dense.doc_len, is_int8=False,
        k_each=48, k_fuse=48, k_final=10,
    )
    for bi, q in enumerate(queries):
        final_oracle, rr = _oracle(q, lex, dense, encoder,
                                   k_each=48, k_fuse=48)
        got = [int(i) for i in ids[bi] if i >= 0]
        # rerank scores must match the oracle's exact MaxSim per id
        for gid, gsc in zip(got, scores[bi]):
            np.testing.assert_allclose(gsc, rr[gid], rtol=1e-4)
        # sets match (duplicate texts create score ties => order may differ)
        got_scores = sorted(float(s) for s in scores[bi][: len(got)])
        want_scores = sorted(rr[c] for c in final_oracle)
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4)


def test_retriever_end_to_end(setup):
    cfg, mgr, encoder, lex = setup
    r = HybridRetriever(cfg, mgr, encoder)
    out = r.retrieve("systolic array matrix multiplication")
    assert 1 <= len(out) <= cfg.final_top_k
    assert out[0]["rank"] == 1
    # the encoder is random-init here, so final (ColBERT-reranked) order is
    # not semantic — but the result schema and ordering must hold
    for row in out:
        assert set(row) >= {"chunk_id", "score", "rank", "text"}
        assert row["text"] == CORPUS[row["chunk_id"]]
    s = [o["score"] for o in out]
    assert s == sorted(s, reverse=True)
    # the BM25-relevant doc must be among the fused candidates feeding
    # rerank (semantic top-1 needs trained weights; see train/ tests)
    ids, _ = r.retrieve_batch(["systolic array matrix multiplication"],
                              top_k_final=cfg.fusion_candidates)
    assert any(int(i) % 12 == 2 for i in ids[0] if i >= 0)


def test_cascade_union_structural_floor(setup):
    """final_fusion="union": the final top-k MUST contain every live id
    of BM25's top-m and dense's top-m (m = k_final//2) — the structural
    "hybrid >= max(leg)@m" invariant (VERDICT r4 #1), checked against
    the cascade's own leg orderings on real queries."""
    cfg, mgr, encoder, lex = setup
    dense = mgr.dense
    queries = [
        "how does the systolic array multiply matrices",
        "fox jumping over a dog",
        "rank fusion for retrieval",
        "semantic chunking of markdown headings",
    ]
    q_emb = encoder.encode_queries(queries)
    q_terms = jnp.asarray(np.stack([lex.encode_query(q) for q in queries]))
    k_final = 10
    ids, scores, dbg = hybrid_cascade(
        q_emb, q_terms,
        jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights),
        dense.emb_flat, dense.scales, dense.doc_lengths,
        n_docs=dense.n_docs, max_postings=lex.max_postings,
        doc_len=dense.doc_len, is_int8=False,
        k_each=48, k_fuse=20, k_final=k_final, final_fusion="union",
    )
    m = k_final // 2
    for bi in range(len(queries)):
        got = set(int(i) for i in ids[bi] if i >= 0)
        bm_top = [int(i) for i in dbg["bm25_ids"][bi][:m] if i >= 0]
        ms_top = [int(i) for i in dbg["ms_ids"][bi][:m] if i >= 0]
        for cid in bm_top:
            assert cid in got, (bi, "bm25 floor", cid, sorted(got))
        for cid in ms_top:
            assert cid in got, (bi, "dense floor", cid, sorted(got))
        # reported scores are exact MaxSim of the returned ids, descending
        # only within the fill tier — but every score matches its id
        rr = {int(c): float(v) for c, v in
              zip(dbg["fused_ids"][bi], dbg["rerank"][bi]) if c >= 0}
        for cid, sc in zip(ids[bi], scores[bi]):
            if int(cid) >= 0:
                np.testing.assert_allclose(float(sc), rr[int(cid)],
                                           rtol=1e-5)


def test_retriever_union_mode_end_to_end(setup):
    """HybridRetriever with final_fusion='union' (the gate-menu entry):
    result schema intact, and the floor invariant holds vs bare-leg
    retrievals measured through the same retriever."""
    import copy

    cfg, mgr, encoder, lex = setup
    ucfg = copy.deepcopy(cfg)
    ucfg.final_fusion = "union"
    r = HybridRetriever(ucfg, mgr, encoder)
    out = r.retrieve("reciprocal rank fusion of bm25 rankings")
    assert 1 <= len(out) <= ucfg.final_top_k
    s = [o["score"] for o in out]
    assert all(o["rank"] == i + 1 for i, o in enumerate(out))
    # BM25's top-m must be inside the union results (m = k//2); BM25-only
    # ordering = the (rrf, 1.0) degenerate cascade at the same depth
    bcfg = copy.deepcopy(cfg)
    bcfg.final_fusion = "rrf"
    bcfg.fusion_weight_bm25 = 1.0
    rb = HybridRetriever(bcfg, mgr, encoder)
    bids, _ = rb.retrieve_batch(["reciprocal rank fusion of bm25 rankings"],
                                ucfg.final_top_k)
    got = {o["chunk_id"] for o in out}
    m = ucfg.final_top_k // 2
    for cid in bids[0][:m]:
        if int(cid) >= 0:
            assert int(cid) in got


def test_retriever_batch(setup):
    cfg, mgr, encoder, lex = setup
    ids, scores = HybridRetriever(cfg, mgr, encoder).retrieve_batch(
        ["fox and dog", "lexical ranking"], top_k_final=5)
    assert ids.shape == (2, 5)
    assert (ids >= -1).all() and (ids < len(CORPUS)).all()


def test_cascade_int8_recall(setup):
    """int8 cascade keeps >=0.9 of the fp32 top-10 on this tiny corpus."""
    cfg, mgr, encoder, lex = setup
    dense32 = mgr.dense
    embs3 = dense32.emb_flat.reshape(dense32.n_pad, dense32.doc_len, -1)
    dense8 = DenseTokenIndex.build(
        embs3[: dense32.n_docs], dense32.doc_lengths[: dense32.n_docs],
        doc_len=dense32.doc_len, dtype="int8")
    q = "late interaction retrieval with colbert"
    q_emb = encoder.encode_queries([q])
    q_terms = jnp.asarray(np.stack([lex.encode_query(q)]))
    args = (jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
            jnp.asarray(lex.post_weights))
    ids32, _, _ = hybrid_cascade(
        q_emb, q_terms, *args, dense32.emb_flat, dense32.scales,
        dense32.doc_lengths, n_docs=dense32.n_docs,
        max_postings=lex.max_postings, doc_len=dense32.doc_len,
        is_int8=False)
    ids8, _, _ = hybrid_cascade(
        q_emb, q_terms, *args, dense8.emb_flat, dense8.scales,
        dense8.doc_lengths, n_docs=dense8.n_docs,
        max_postings=lex.max_postings, doc_len=dense8.doc_len,
        is_int8=True)
    a = {int(i) % 12 for i in ids32[0] if i >= 0}   # mod 12: duplicate texts
    b = {int(i) % 12 for i in ids8[0] if i >= 0}
    assert len(a & b) / max(len(a), 1) >= 0.9


def test_retriever_rebinds_after_incremental_add(app_like_setup=None):
    """A live HybridRetriever must serve the post-add_documents index —
    the lexical CSR transfer and the fused jit's statics were bound at
    construction and previously went stale (code-review r2)."""
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
    from hybrid_rag_colbertv2_tpu.models.colbert import (ColBERTConfig,
                                                         ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever

    base = [f"document number {i} about topic{i % 5}" for i in range(12)]
    new_doc = "zyzzyva glossolalia xylophone unique marker text"
    tok = ColBERTTokenizer.train_bpe(base + [new_doc], vocab_size=512)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    cfg = RAGConfig(doc_max_tokens=32, dense_prefilter=0,
                    bm25_postings_cap=0)
    mgr = IndexManager(cfg, enc)
    mgr.build_all(base)
    r = HybridRetriever(cfg, mgr, enc)
    ids0, _ = r.retrieve_batch(["zyzzyva glossolalia"], 5)
    assert 12 not in ids0[0]
    mgr.add_documents(base + [new_doc])
    ids1, _ = r.retrieve_batch(["zyzzyva glossolalia"], 5)
    assert 12 in ids1[0], ids1


def test_k_dense_independent_of_k_each():
    """colbert_top_k (k_dense) must control the dense candidate depth
    independently of bm25_top_k (k_each) — previously one k capped both."""
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade

    rng = np.random.default_rng(0)
    n, L, D = 32, 8, 32
    toks = rng.normal(size=(n, L, D)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    dense = DenseTokenIndex.build(
        jnp.asarray(toks), jnp.asarray(np.full(n, L, np.int32)),
        doc_len=L, dtype="float32")
    lex = LexicalIndex.build(["filler text"] * n)
    q = jnp.asarray(toks[:1, :4])
    qt = jnp.asarray(np.full((1, 4), -1, np.int32))   # no lexical terms
    _, _, dbg = hybrid_cascade(
        q, qt, jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights), dense.emb_flat, None,
        dense.doc_lengths, None, None,
        prefilter=0, n_docs=n, max_postings=lex.max_postings,
        doc_len=L, is_int8=False,
        k_each=2, k_dense=16, k_fuse=16, k_final=8, approx_recall=1.0)
    assert dbg["ms_ids"].shape == (1, 16)       # dense depth = k_dense
    assert dbg["bm25_ids"].shape == (1, 2)      # bm25 depth = k_each
