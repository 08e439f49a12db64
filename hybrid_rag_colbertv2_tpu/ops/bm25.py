"""On-device sparse BM25 scoring.

The reference delegates lexical scoring to the ``bm25s`` wheel on CPU
(local_rag_complete.py:851-858, :937-950). Here the lexical index is a
term-major CSR of *precomputed* BM25 term-document weights (built host-side
in index/lexical.py) and query scoring runs on device: gather each query
term's postings window and scatter-add the weights into a dense per-document
score vector — so the lexical stage composes with the dense MaxSim stage and
RRF fusion inside a single jitted cascade (SURVEY.md section 2 #9).

Layout:
  indptr       (V + 1,) int32 — postings offsets per term id
  post_docs    (nnz_pad,) int32 — document ids (global), padded
  post_weights (nnz_pad,) f32  — BM25 weight of (term, doc), padded with 0

A query is a fixed-size vector of term ids (padded with -1). Each query
token *occurrence* contributes its term's postings once, matching the
host-side reference scorer (index/lexical.py) used in numerics tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_docs", "max_postings"))
def bm25_scores_device(
    query_terms: jax.Array,    # (B, Q) int32, -1 padded
    indptr: jax.Array,         # (V + 1,) int32
    post_docs: jax.Array,      # (nnz_pad,) int32
    post_weights: jax.Array,   # (nnz_pad,) float32
    *,
    n_docs: int,
    max_postings: int,         # static cap: longest postings list (padded)
) -> jax.Array:                # (B, n_docs) float32
    nnz = post_docs.shape[0]

    def score_one(terms: jax.Array) -> jax.Array:
        t = jnp.clip(terms, 0, indptr.shape[0] - 2)
        start = indptr[t]                                  # (Q,)
        length = indptr[t + 1] - start                     # (Q,)
        offs = jnp.arange(max_postings, dtype=jnp.int32)   # (P,)
        idx = start[:, None] + offs[None, :]               # (Q, P)
        valid = (offs[None, :] < length[:, None]) & (terms >= 0)[:, None]
        idx = jnp.clip(idx, 0, nnz - 1)
        docs = jnp.where(valid, post_docs[idx], n_docs)    # dump slot
        w = jnp.where(valid, post_weights[idx], 0.0)
        dense = jnp.zeros((n_docs + 1,), jnp.float32)
        dense = dense.at[docs.reshape(-1)].add(w.reshape(-1))
        return dense[:n_docs]

    return jax.vmap(score_one)(query_terms)
