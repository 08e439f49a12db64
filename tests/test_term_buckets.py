"""BM25 query-term width bucketing: trimming -1 padding columns to the
smallest covering bucket must not change any result (the lexical kernel
ignores id -1), while shrinking the O(B*Q*P) sort for short queries."""

import numpy as np

from hybrid_rag_colbertv2_tpu.config import RAGConfig
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.manager import IndexManager
from hybrid_rag_colbertv2_tpu.models.colbert import (ColBERTConfig,
                                                     ColBERTEncoder)
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
from hybrid_rag_colbertv2_tpu.retrieval.cascade import (HybridRetriever,
                                                        pack_query_batch)

CORPUS = [f"document {i} about topic {i % 7} item {i} extra words here"
          for i in range(48)]


def _setup(**cfg_kw):
    tok = ColBERTTokenizer.train_bpe(CORPUS, vocab_size=256)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    cfg = RAGConfig(**cfg_kw)
    mgr = IndexManager(cfg, enc)
    mgr.lexical = LexicalIndex.build(CORPUS)
    embs, lengths = enc.encode_docs(CORPUS, doc_len=32)
    mgr.dense = DenseTokenIndex.build(embs, lengths, doc_len=32,
                                      dtype="float32")
    return cfg, enc, mgr


def test_packed_width_rounds_to_bucket():
    cfg, enc, mgr = _setup()
    lq = enc.cfg.query_max_tokens
    short = ["topic 3 item 7", "document 5"]
    p8 = pack_query_batch(enc, mgr.lexical, short, 32, (8, 16, 32))
    assert p8.shape[1] == lq + 8
    pfull = pack_query_batch(enc, mgr.lexical, short, 32, None)
    assert pfull.shape[1] == lq + 32
    # trimmed columns were all -1 padding
    np.testing.assert_array_equal(np.asarray(pfull[:, lq:lq + 8]),
                                  np.asarray(p8[:, lq:]))
    assert (np.asarray(pfull[:, lq + 8:]) == -1).all()
    # a term-heavy query escalates to a wider bucket
    many = [" ".join(f"topic item document extra words here about"
                     for _ in range(3))]
    pwide = pack_query_batch(enc, mgr.lexical, many, 32, (8, 16, 32))
    assert pwide.shape[1] > lq + 8


def test_bucketed_width_results_identical():
    cfg_b, enc, mgr = _setup()                       # default buckets on
    assert cfg_b.query_term_buckets == (8, 16, 32)
    cfg_n = RAGConfig(query_term_buckets=())         # ceiling width
    queries = ["topic 3 item 7", "document 5 extra", "words here"]
    r_b = HybridRetriever(cfg_b, mgr, enc)
    r_n = HybridRetriever(cfg_n, mgr, enc)
    ids_b, sc_b = r_b.retrieve_batch(queries)
    ids_n, sc_n = r_n.retrieve_batch(queries)
    np.testing.assert_array_equal(ids_b, ids_n)
    np.testing.assert_allclose(sc_b, sc_n, rtol=1e-6, atol=1e-7)


def test_config_json_roundtrip_coerces_tuple():
    cfg = RAGConfig()
    cfg2 = RAGConfig.from_json(cfg.to_json())
    assert cfg2.query_term_buckets == (8, 16, 32)
    assert isinstance(cfg2.query_term_buckets, tuple)
