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


@functools.partial(jax.jit,
                   static_argnames=("n_docs", "max_postings", "k"))
def bm25_topk_device(
    query_terms: jax.Array,    # (B, Q) int32, -1 padded
    indptr: jax.Array,         # (V + 1,) int32
    post_docs: jax.Array,      # (nnz_pad,) int32
    post_weights: jax.Array,   # (nnz_pad,) float32
    *,
    n_docs: int,
    max_postings: int,
    k: int,
) -> tuple:                    # (vals (B, k) f32, ids (B, k) int32)
    """EXACT BM25 top-k without the (B, N)-wide scatter.

    ``bm25_scores_device`` scatter-adds into a dense N-vector — O(N) memory
    traffic per query (3.8 ms at 1M docs). But a query touches at most
    Q*max_postings postings, so instead: gather the (doc, weight) pairs,
    SORT by doc id (Q*P keys, ~16k), segment-sum runs via a cumsum
    difference, and top-k the per-run totals. All work is O(Q*P log(Q*P)),
    independent of corpus size. Missing slots (score <= 0) are id -1,
    matching the dense scorer's downstream convention.
    """
    nnz = post_docs.shape[0]
    qp = query_terms.shape[1] * max_postings
    kk = min(k, qp)  # padded back to k below so the (B, k) contract holds

    def one(terms):
        t = jnp.clip(terms, 0, indptr.shape[0] - 2)
        start = indptr[t]
        length = indptr[t + 1] - start
        offs = jnp.arange(max_postings, dtype=jnp.int32)
        idx = jnp.clip(start[:, None] + offs[None, :], 0, nnz - 1)
        valid = (offs[None, :] < length[:, None]) & (terms >= 0)[:, None]
        big = jnp.int32(2**30)                    # sentinel sorts last
        docs = jnp.where(valid, post_docs[idx], big).reshape(-1)
        w = jnp.where(valid, post_weights[idx], 0.0).reshape(-1)

        docs_s, w_s = jax.lax.sort_key_val(docs, w)          # (QP,)
        run_start = jnp.concatenate(
            [jnp.ones((1,), bool), docs_s[1:] != docs_s[:-1]])
        run_end = jnp.concatenate(
            [docs_s[1:] != docs_s[:-1], jnp.ones((1,), bool)])
        # per-run totals via segment_sum: each doc's total adds ONLY its
        # own weights, in (term-major) gather order. A cumsum-difference
        # would be cheaper-looking but accumulates unrelated weights and
        # cancels them — ULP noise that depends on what else is in the
        # array, so a doc's score would differ between the replicated and
        # doc-sharded lexical layouts and reorder near-ties (observed);
        # segment_sum makes the two layouts produce bit-equal scores.
        seg = jnp.cumsum(run_start) - 1                      # (QP,)
        sums = jax.ops.segment_sum(w_s, seg, num_segments=qp)
        totals = jnp.where(run_end & (docs_s < big), sums[seg], 0.0)

        vals, pos = jax.lax.top_k(totals, kk)
        ids = docs_s[pos]
        # guard against any id outside the corpus (sentinels score 0 and
        # are already masked; this also uses n_docs defensively)
        ids = jnp.where((vals > 0) & (ids < n_docs), ids, -1)
        if kk < k:  # honor the (B, k) contract on tiny indexes
            vals = jnp.pad(vals, (0, k - kk), constant_values=0.0)
            ids = jnp.pad(ids, (0, k - kk), constant_values=-1)
        return vals, ids.astype(jnp.int32)

    return jax.vmap(one)(query_terms)
