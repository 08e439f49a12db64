"""Index manager — owns both indexes over one chunk corpus.

TPU-native equivalent of the reference's ``DualIndexer``
(local_rag_complete.py:838-879): builds the lexical (BM25 CSR) and dense
(ColBERT token-embedding) indexes from a single corpus, persists both, and
reloads them. One global chunk-id space: corpus row index, shared by both
indexes and the chunk store (fixes the reference's corpus-position vs DB-id
mismatch, SURVEY.md section 2).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RAGConfig
from ..utils.logging import StageTimer, get_logger
from .dense import DenseTokenIndex, pick_bucket
from .lexical import LexicalIndex

log = get_logger(__name__)


class DocEncoder(Protocol):
    """What the manager needs from an encoder (models/colbert.py provides it)."""

    def encode_docs(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        """-> (token_embs (N, L, D), lengths (N,))"""
        ...

    def encode_queries(self, texts: Sequence[str]) -> jax.Array:
        """-> (B, Lq, D) with zero rows for padding."""
        ...


class IndexManager:
    """Builds / persists / serves the lexical + dense index pair."""

    def __init__(self, config: RAGConfig, encoder: Optional[DocEncoder] = None):
        self.config = config
        self.encoder = encoder
        self.lexical: Optional[LexicalIndex] = None
        self.dense: Optional[DenseTokenIndex] = None
        self.corpus: Optional[list] = None
        self.timer = StageTimer()

    # ------------------------------------------------------------------
    def build_lexical(self, corpus: Sequence[str]) -> LexicalIndex:
        """Reference: DualIndexer.build_bm25_index (local_rag_complete.py:846)."""
        with self.timer.stage("bm25_build"):
            self.lexical = LexicalIndex.build(
                list(corpus),
                postings_cap=getattr(self.config, "bm25_postings_cap", 0))
            self.lexical.save(self.config.bm25_index_path)
        log.info(
            "BM25 index: %d docs, %d terms, %.2f MB (%.2fs)",
            self.lexical.n_docs, len(self.lexical.vocab),
            self.lexical.memory_bytes() / 2**20,
            self.timer.timings["bm25_build"],
        )
        return self.lexical

    def build_dense(self, corpus: Sequence[str]) -> DenseTokenIndex:
        """Reference: DualIndexer.build_colbert_index (local_rag_complete.py:866)
        -> JinaColBERTRetriever.index (:728). Encodes the corpus with the
        jitted encoder and lays the token embeddings into the padded index."""
        if self.encoder is None:
            raise RuntimeError("IndexManager needs an encoder to build the dense index")
        with self.timer.stage("colbert_encode"):
            embs, lengths = self.encoder.encode_docs(list(corpus))
        with self.timer.stage("colbert_build"):
            max_len = int(jnp.max(lengths)) if lengths.shape[0] else 1
            bucket = pick_bucket(max_len,
                                 self.config.mesh.doc_token_buckets)
            # "auto" resolves by projected HBM residency (the single-
            # bucket estimate is conservative for the bucketed layout)
            dtype = self.config.mesh.resolve_index_dtype(
                len(corpus), bucket, dim=int(embs.shape[-1]))
            if dtype != self.config.mesh.index_dtype:
                log.info("index_dtype=auto -> %s (%d docs x %d tokens)",
                         dtype, len(corpus), bucket)
            if self.config.mesh.index_layout == "bucketed":
                from .bucketed import BucketedDenseIndex

                self.dense = BucketedDenseIndex.build(
                    embs, lengths,
                    bucket_sizes=self.config.mesh.doc_token_buckets,
                    dtype=dtype,
                )
            else:
                self.dense = DenseTokenIndex.build(
                    embs, lengths, doc_len=bucket,
                    dtype=dtype,
                )
            self.dense.save(self.config.colbert_index_path)
        log.info(
            "Dense index: %d docs [%s], %.2f MB (encode %.2fs, build %.2fs)",
            self.dense.n_docs, self.config.mesh.index_layout,
            self.dense.memory_bytes() / 2**20,
            self.timer.timings["colbert_encode"],
            self.timer.timings["colbert_build"],
        )
        return self.dense

    def build_all(self, corpus: Sequence[str]) -> None:
        self.corpus = list(corpus)
        self.build_lexical(self.corpus)
        self.build_dense(self.corpus)

    def add_documents(self, full_corpus: Sequence[str]) -> None:
        """Incremental index update: ``full_corpus`` is the WHOLE corpus in
        global-id order with the new chunks appended at the end. Only the
        new chunks are encoded (the reference re-encodes everything,
        local_rag_complete.py:728-746); the lexical CSR is rebuilt host-side
        (vectorized numpy — cheap next to encoding). Both the flat and the
        length-bucketed layouts append in place; falls back to a full
        rebuild only when nothing is loaded / the corpus shrank."""
        from .bucketed import BucketedDenseIndex

        full_corpus = list(full_corpus)
        if (self.dense is None
                or not isinstance(self.dense,
                                  (DenseTokenIndex, BucketedDenseIndex))
                or self.dense.n_docs > len(full_corpus)):
            self.build_all(full_corpus)
            return
        new_texts = full_corpus[self.dense.n_docs:]
        self.corpus = full_corpus
        self.build_lexical(full_corpus)
        if not new_texts:
            return
        if self.encoder is None:
            raise RuntimeError("IndexManager needs an encoder to add docs")
        bucketed = isinstance(self.dense, BucketedDenseIndex)
        enc_len = (max(self.config.mesh.doc_token_buckets) if bucketed
                   else self.dense.doc_len)
        with self.timer.stage("colbert_encode_new"):
            embs, lengths = self.encoder.encode_docs(
                new_texts, doc_len=enc_len)
        with self.timer.stage("colbert_append"):
            if bucketed:
                self.dense = self.dense.append(
                    embs, lengths,
                    bucket_sizes=self.config.mesh.doc_token_buckets)
            else:
                self.dense = self.dense.append(embs, lengths)
            self.dense.save(self.config.colbert_index_path)
        log.info(
            "Dense index +%d docs -> %d total (encode %.2fs, append %.2fs)",
            len(new_texts), self.dense.n_docs,
            self.timer.timings["colbert_encode_new"],
            self.timer.timings["colbert_append"],
        )

    # ------------------------------------------------------------------
    def load(self) -> None:
        """Reference: DualIndexer.load_indexes (local_rag_complete.py:876)."""
        self.lexical = LexicalIndex.load(self.config.bm25_index_path)
        # Layout detection keys off meta.json (written LAST by both save
        # paths), not file presence — a stale mapping.npz from a previous
        # bucketed save must not misroute a flat index (and vice versa).
        meta = json.loads(
            (Path(self.config.colbert_index_path) / "meta.json").read_text())
        if "n_buckets" in meta:
            from .bucketed import BucketedDenseIndex

            self.dense = BucketedDenseIndex.load(
                self.config.colbert_index_path)
        else:
            self.dense = DenseTokenIndex.load(self.config.colbert_index_path)

    def is_built(self) -> bool:
        return (
            Path(self.config.bm25_index_path, "meta.json").exists()
            and Path(self.config.colbert_index_path, "meta.json").exists()
        )
