"""Reciprocal-rank fusion + top-k selection, fully on device.

Behavioral parity with the reference's ``_reciprocal_rank_fusion``
(local_rag_complete.py:960-978): each source list contributes
``1 / (k + rank)`` with rank starting at 1; a document appearing in both
lists accumulates both contributions; results are ordered by fused score
descending. The reference does this in a Python dict on the host; here it is
a scatter-add into a dense per-document score vector followed by a fused
top-k, so the BM25 -> ColBERT -> RRF -> candidate-select stage never leaves
HBM (SURVEY.md section 2 #11).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit,
                   static_argnames=("n_docs", "k", "rrf_k", "approx_recall"))
def rrf_from_topk(
    ids_a: jax.Array,      # (B, Ka) int32 doc ids (global id space)
    ids_b: jax.Array,      # (B, Kb) int32
    n_docs: int = None,    # static total docs
    *,
    k: int,                # number of fused candidates to keep
    rrf_k: int = 60,       # reference hard-codes 60 (local_rag_complete.py:964)
    approx_recall: float = 0.0,  # >0: approx_max_k candidate select over
                                 # the dense fused vector when k <= n/8
) -> Tuple[jax.Array, jax.Array]:
    """Fuse two ranked id lists -> (fused_scores (B,k), fused_ids (B,k)).

    ``ids_*`` rows must be rank-ordered (best first). Entries with id < 0
    are treated as missing (e.g. padding from a short shard) and ignored.
    """
    n = int(n_docs)
    b, ka = ids_a.shape
    kb = ids_b.shape[1]

    def fuse_one(ia: jax.Array, ib: jax.Array) -> jax.Array:
        dense = jnp.zeros((n + 1,), jnp.float32)  # slot n = dump for missing
        wa = 1.0 / (rrf_k + 1.0 + jnp.arange(ka, dtype=jnp.float32))
        wb = 1.0 / (rrf_k + 1.0 + jnp.arange(kb, dtype=jnp.float32))
        sa = jnp.where(ia >= 0, ia, n)
        sb = jnp.where(ib >= 0, ib, n)
        dense = dense.at[sa].add(jnp.where(ia >= 0, wa, 0.0))
        dense = dense.at[sb].add(jnp.where(ib >= 0, wb, 0.0))
        return dense[:n]

    from .prefilter import approx_or_exact_topk

    dense = jax.vmap(fuse_one)(ids_a, ids_b)       # (B, n)
    scores, ids = approx_or_exact_topk(dense, k, approx_recall)
    # docs with zero fused score were in neither list — mark id -1
    ids = jnp.where(scores > 0.0, ids, -1)
    return scores, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_each", "k_out", "rrf_k"))
def reciprocal_rank_fusion(
    scores_a: jax.Array,   # (B, N) e.g. BM25 scores
    scores_b: jax.Array,   # (B, N) e.g. MaxSim scores
    *,
    k_each: int = 100,
    k_out: int = 50,
    rrf_k: int = 60,
) -> Tuple[jax.Array, jax.Array]:
    """Full fused pipeline: per-source top-k -> RRF -> top-k_out.

    Matches the reference cascade: bm25 top-100 (local_rag_complete.py:903)
    + colbert top-100 (:909) -> RRF -> 50 candidates (:916).
    """
    n = scores_a.shape[-1]
    ke = min(k_each, n)
    _, ids_a = jax.lax.top_k(scores_a, ke)
    _, ids_b = jax.lax.top_k(scores_b, ke)
    return rrf_from_topk(ids_a.astype(jnp.int32), ids_b.astype(jnp.int32),
                         n, k=min(k_out, n), rrf_k=rrf_k)


def rrf_reference_py(ranked_a, ranked_b, rrf_k: int = 60):
    """Pure-Python RRF oracle mirroring local_rag_complete.py:960-978
    (dict accumulate, sort by fused score desc). For tests only."""
    scores = {}
    for rank, cid in enumerate(ranked_a, 1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_k + rank)
    for rank, cid in enumerate(ranked_b, 1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_k + rank)
    return sorted(scores.items(), key=lambda x: -x[1])
