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
        # contiguous-window slice gather (see bm25_topk_device)
        start_c = jnp.clip(jnp.minimum(start, nnz - max_postings), 0, None)
        shift = start - start_c
        docs_w = jax.vmap(lambda s: jax.lax.dynamic_slice(
            post_docs, (s,), (max_postings,)))(start_c)    # (Q, P)
        w_w = jax.vmap(lambda s: jax.lax.dynamic_slice(
            post_weights, (s,), (max_postings,)))(start_c)
        valid = ((offs[None, :] >= shift[:, None])
                 & (offs[None, :] < (shift + length)[:, None])
                 & (terms >= 0)[:, None])
        docs = jnp.where(valid, docs_w, n_docs)            # dump slot
        w = jnp.where(valid, w_w, 0.0)
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
    q_width = query_terms.shape[1]
    qp = q_width * max_postings
    kk = min(k, qp)  # padded back to k below so the (B, k) contract holds

    def one(terms):
        t = jnp.clip(terms, 0, indptr.shape[0] - 2)
        start = indptr[t]
        length = indptr[t + 1] - start
        offs = jnp.arange(max_postings, dtype=jnp.int32)
        # postings windows are CONTIGUOUS, so fetch them with vmapped
        # dynamic_slice (lowers to a gather of P-wide slices — DMA-sized
        # reads) instead of an element-wise post_docs[idx] gather, which
        # the TPU executes element-by-element (measured 3.9 ms of the
        # old kernel's 11 ms at batch 64). Slices that would run past
        # nnz are shifted left by `shift`; the validity window shifts
        # with them (valid postings always fit: length <= nnz - start).
        start_c = jnp.clip(jnp.minimum(start, nnz - max_postings), 0, None)
        shift = start - start_c                               # (Q,) >= 0
        docs_w = jax.vmap(lambda s: jax.lax.dynamic_slice(
            post_docs, (s,), (max_postings,)))(start_c)       # (Q, P)
        w_w = jax.vmap(lambda s: jax.lax.dynamic_slice(
            post_weights, (s,), (max_postings,)))(start_c)
        valid = ((offs[None, :] >= shift[:, None])
                 & (offs[None, :] < (shift + length)[:, None])
                 & (terms >= 0)[:, None])
        big = jnp.int32(2**30)                    # sentinel sorts last
        docs = jnp.where(valid, docs_w, big).reshape(-1)
        w = jnp.where(valid, w_w, 0.0).reshape(-1)

        docs_s, w_s = jax.lax.sort_key_val(docs, w)          # (QP,)
        boundary = docs_s[1:] != docs_s[:-1]
        run_start = jnp.concatenate([jnp.ones((1,), bool), boundary])
        run_end = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        # Per-run totals via a BOUNDED segmented scan: a doc appears at
        # most once per query term occurrence, so no run is longer than
        # Q — ceil(log2(Q)) masked shift-add passes reach every run
        # total, vs a segment_sum scatter-add the TPU serializes
        # (measured 5.0 ms of the old kernel's 11 ms at batch 64). Each
        # element combines only weights from its OWN run in a tree fixed
        # by run-RELATIVE offsets, so (like the scatter-add it replaces,
        # and unlike a cumsum-difference) totals are identical across
        # the replicated and doc-sharded lexical layouts, whose sorted
        # arrays differ only in what surrounds each run.
        acc, flag, step = w_s, run_start, 1
        while step < q_width:
            prev_acc = jnp.concatenate(
                [jnp.zeros((step,), acc.dtype), acc[:-step]])
            prev_flag = jnp.concatenate(
                [jnp.ones((step,), bool), flag[:-step]])
            acc = acc + jnp.where(flag, 0.0, prev_acc)
            flag = flag | prev_flag
            step *= 2
        totals = jnp.where(run_end & (docs_s < big), acc, 0.0)

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
