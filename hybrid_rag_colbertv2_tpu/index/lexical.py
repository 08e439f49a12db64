"""Lexical (BM25) index: host-side build, device-side scoring arrays.

Replaces the reference's ``bm25s`` index (built in
``DualIndexer.build_bm25_index``, local_rag_complete.py:846-864; queried in
``HybridRetriever._bm25_search``, :937-950). Where bm25s keeps scipy sparse
matrices on CPU, this index precomputes the full BM25 weight of every
(term, document) pair at build time and lays it out as a term-major CSR
that lives in device HBM; query scoring is the gather + scatter-add kernel
in ops/bm25.py, composable into the jitted cascade.

Scoring model (matching bm25s defaults k1=1.5, b=0.75 with the Lucene/ATIRE
idf so weights are always >= 0):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Document ids are *corpus row indices* — one global id space shared with the
dense index and the SQLite chunk store, fixing the reference's 0-based
corpus-position vs 1-based DB-id mismatch (SURVEY.md section 2, latent bugs).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from .textproc import tokenize_lexical


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class LexicalIndex:
    vocab: Dict[str, int]
    indptr: np.ndarray        # (V + 1,) int32
    post_docs: np.ndarray     # (nnz_pad,) int32
    post_weights: np.ndarray  # (nnz_pad,) float32
    n_docs: int
    avgdl: float
    k1: float = 1.5
    b: float = 0.75
    max_postings: int = 0     # longest postings list, rounded up to 128
    query_max_terms: int = 64

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: Sequence[str],
        *,
        k1: float = 1.5,
        b: float = 0.75,
        query_max_terms: int = 64,
    ) -> "LexicalIndex":
        n = len(corpus)
        vocab: Dict[str, int] = {}
        # token ids per doc + per-doc term frequencies
        doc_tfs: List[Dict[int, int]] = []
        doc_lens = np.zeros((n,), np.float64)
        for di, text in enumerate(corpus):
            toks = tokenize_lexical(text)
            doc_lens[di] = len(toks)
            tf: Dict[int, int] = {}
            for t in toks:
                tid = vocab.setdefault(t, len(vocab))
                tf[tid] = tf.get(tid, 0) + 1
            doc_tfs.append(tf)
        v = len(vocab)
        avgdl = float(doc_lens.mean()) if n else 1.0
        avgdl = max(avgdl, 1e-9)

        # document frequency per term
        df = np.zeros((v,), np.int64)
        for tf in doc_tfs:
            for tid in tf:
                df[tid] += 1
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))

        # CSR build: postings sorted by (term, doc)
        counts = df.astype(np.int64)
        indptr = np.zeros((v + 1,), np.int64)
        np.cumsum(counts, out=indptr[1:])
        nnz = int(indptr[-1])
        post_docs = np.zeros((nnz,), np.int32)
        post_weights = np.zeros((nnz,), np.float32)
        cursor = indptr[:-1].copy()
        for di, tf in enumerate(doc_tfs):
            dl = doc_lens[di]
            denom_norm = k1 * (1.0 - b + b * dl / avgdl)
            for tid, f in tf.items():
                w = idf[tid] * f * (k1 + 1.0) / (f + denom_norm)
                pos = cursor[tid]
                post_docs[pos] = di
                post_weights[pos] = w
                cursor[tid] = pos + 1

        max_post = int(counts.max()) if v else 0
        max_post = max(_round_up(max_post, 128), 128)
        nnz_pad = max(_round_up(nnz, 128), 128)
        post_docs = np.pad(post_docs, (0, nnz_pad - nnz), constant_values=n)
        post_weights = np.pad(post_weights, (0, nnz_pad - nnz))
        return cls(
            vocab=vocab,
            indptr=indptr.astype(np.int32),
            post_docs=post_docs,
            post_weights=post_weights,
            n_docs=n,
            avgdl=avgdl,
            k1=k1,
            b=b,
            max_postings=max_post,
            query_max_terms=query_max_terms,
        )

    # ------------------------------------------------------------------
    def encode_query(self, query: str,
                     q_max: Optional[int] = None) -> np.ndarray:
        """Query text -> fixed-size int32 term-id vector, -1 padded.

        Out-of-vocabulary terms are dropped (they can't score anything),
        duplicates are kept (each occurrence accumulates, see ops/bm25.py).
        """
        q_max = q_max or self.query_max_terms
        ids = [self.vocab[t] for t in tokenize_lexical(query)
               if t in self.vocab]
        ids = ids[:q_max]
        out = np.full((q_max,), -1, np.int32)
        out[: len(ids)] = ids
        return out

    def score_host(self, query: str) -> np.ndarray:
        """Reference CPU scorer over the same CSR (tests compare the device
        kernel against this)."""
        scores = np.zeros((self.n_docs,), np.float64)
        for tid in self.encode_query(query):
            if tid < 0:
                continue
            s, e = self.indptr[tid], self.indptr[tid + 1]
            scores[self.post_docs[s:e]] += self.post_weights[s:e]
        return scores.astype(np.float32)

    # ------------------------------------------------------------------
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez(
            path / "postings.npz",
            indptr=self.indptr,
            post_docs=self.post_docs,
            post_weights=self.post_weights,
        )
        meta = {
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "k1": self.k1,
            "b": self.b,
            "max_postings": self.max_postings,
            "query_max_terms": self.query_max_terms,
        }
        (path / "meta.json").write_text(json.dumps(meta))
        (path / "vocab.json").write_text(
            json.dumps(self.vocab, ensure_ascii=False)
        )

    @classmethod
    def load(cls, path: str | Path) -> "LexicalIndex":
        path = Path(path)
        arrs = np.load(path / "postings.npz")
        meta = json.loads((path / "meta.json").read_text())
        vocab = json.loads((path / "vocab.json").read_text())
        return cls(
            vocab=vocab,
            indptr=arrs["indptr"],
            post_docs=arrs["post_docs"],
            post_weights=arrs["post_weights"],
            **meta,
        )

    # ------------------------------------------------------------------
    def memory_bytes(self) -> int:
        return (
            self.indptr.nbytes + self.post_docs.nbytes
            + self.post_weights.nbytes
        )
