"""Edge cases across the retrieval stack: tiny corpora, OOV queries,
k > n, empty documents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade


def _mini(n_docs, L=8, D=16, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.normal(size=(n_docs, L, D)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lens = np.full((n_docs,), L, np.int32)
    dense = DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lens),
                                  doc_len=L, dtype="float32")
    corpus = [f"doc number {i} about thing {i}" for i in range(n_docs)]
    lex = LexicalIndex.build(corpus)
    q = rng.normal(size=(1, 4, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return dense, lex, jnp.asarray(q)


def _run(dense, lex, q, q_text, **kw):
    q_terms = jnp.asarray(lex.encode_query(q_text))[None]
    return hybrid_cascade(
        q, q_terms,
        jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
        jnp.asarray(lex.post_weights),
        dense.emb_flat, dense.scales, dense.doc_lengths,
        dense.ensure_pooled() if kw.get("prefilter") else None,
        n_docs=dense.n_docs, max_postings=lex.max_postings,
        doc_len=dense.doc_len, is_int8=dense.is_int8, **kw)


def test_single_doc_corpus():
    dense, lex, q = _mini(1)
    ids, scores, _ = _run(dense, lex, q, "thing 0",
                          k_each=10, k_fuse=5, k_final=3)
    ids = np.asarray(ids)
    assert ids[0, 0] == 0
    assert (ids[0, 1:] == -1).all()      # only one real doc


def test_k_larger_than_corpus():
    dense, lex, q = _mini(3)
    ids, scores, _ = _run(dense, lex, q, "doc number 1",
                          k_each=100, k_fuse=50, k_final=10)
    ids = np.asarray(ids)
    assert set(i for i in ids[0] if i >= 0) <= {0, 1, 2}
    assert sum(1 for i in ids[0] if i >= 0) == 3


def test_oov_only_query_no_crash():
    dense, lex, q = _mini(5)
    ids, scores, _ = _run(dense, lex, q, "zzz qqq completely unknown",
                          k_each=5, k_fuse=4, k_final=2)
    # BM25 contributes nothing; dense side still ranks
    assert (np.asarray(ids) >= -1).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_prefilter_larger_than_everything():
    dense, lex, q = _mini(4)
    ids, _, _ = _run(dense, lex, q, "thing 2", prefilter=10_000,
                     k_each=4, k_fuse=4, k_final=2)
    assert (np.asarray(ids) < 4).all()


def test_empty_markdown_document(tmp_path):
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication

    (tmp_path / "empty.md").write_text("\n\n")
    (tmp_path / "real.md").write_text("# T\n\ncontent about systolic arrays\n")
    cfg = RAGConfig(
        db_path=str(tmp_path / "e.db"),
        bm25_index_path=str(tmp_path / "i/b"),
        colbert_index_path=str(tmp_path / "i/c"),
        images_dir=str(tmp_path / "im"),
        tokenizer_path=str(tmp_path / "i/t.json"),
        min_chunk_size=2, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=256,
    )
    app = RAGApplication(cfg, use_ollama=False)
    out = app.index_documents([str(tmp_path / "empty.md"),
                               str(tmp_path / "real.md")])
    assert out["total_chunks"] >= 1
    app.initialize_chatbot(use_mesh=False)
    rows = app.query("systolic arrays", 1)
    assert rows and "systolic" in rows[0]["text"]
