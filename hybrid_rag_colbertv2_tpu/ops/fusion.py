"""Reciprocal-rank fusion + top-k selection, fully on device.

Behavioral parity with the reference's ``_reciprocal_rank_fusion``
(local_rag_complete.py:960-978): each source list contributes
``1 / (k + rank)`` with rank starting at 1; a document appearing in both
lists accumulates both contributions; results are ordered by fused score
descending (ties by ascending doc id). The reference does this in a Python
dict on the host; here it is a **corpus-size-independent sort/merge over
the ~Ka+Kb candidate ids** (same technique as the sort-based BM25 top-k,
ops/bm25.py): sort the concatenated ids, segment-sum the rank weights over
equal-id runs, top-k over the merged segments. Cost is O((Ka+Kb) log) per
query regardless of corpus size — no dense (B, N) vector is ever built, so
fusion stays O(1) in N even at 1M+ docs (SURVEY.md section 2 #11).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("k", "rrf_k", "weights"))
def rrf_from_topk(
    ids_a: jax.Array,      # (B, Ka) int32 doc ids (global id space)
    ids_b: jax.Array,      # (B, Kb) int32
    *,
    k: int,                # number of fused candidates to keep
    rrf_k: int = 60,       # reference hard-codes 60 (local_rag_complete.py:964)
    weights: Tuple[float, float] = (1.0, 1.0),
) -> Tuple[jax.Array, jax.Array]:
    """Fuse two ranked id lists -> (fused_scores (B,k), fused_ids (B,k)).

    ``ids_*`` rows must be rank-ordered (best first). Entries with id < 0
    are treated as missing (e.g. padding from a short shard) and ignored.
    When k exceeds the number of distinct fused candidates, the tail is
    padded with score 0 / id -1. Fusion is corpus-size independent — the
    merge domain is just Ka+Kb candidate ids.

    ``weights`` scales each list's rank contributions: (1, 1) is the
    reference's unweighted RRF; asymmetric weights implement the
    calibrated hybrid (retrieval/gate.py) — e.g. (1.5, 0.5) leans on the
    first (BM25) list when the measured gate finds the dense leg weak.
    """
    b, ka = ids_a.shape
    kb = ids_b.shape[1]
    kt = ka + kb

    wa = weights[0] / (rrf_k + 1.0 + jnp.arange(ka, dtype=jnp.float32))
    wb = weights[1] / (rrf_k + 1.0 + jnp.arange(kb, dtype=jnp.float32))

    def fuse_one(ia: jax.Array, ib: jax.Array):
        ids = jnp.concatenate([ia, ib])                       # (Kt,)
        w = jnp.concatenate([jnp.where(ia >= 0, wa, 0.0),
                             jnp.where(ib >= 0, wb, 0.0)])
        sid = jnp.where(ids >= 0, ids, _BIG)                  # missing last
        order = jnp.argsort(sid)
        s_ids = sid[order]
        s_w = w[order]
        # contiguous equal-id runs -> segments; sum each run's weights
        start = jnp.concatenate(
            [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
        seg = jnp.cumsum(start) - 1                           # (Kt,)
        sums = jax.ops.segment_sum(s_w, seg, num_segments=kt)  # (Kt,)
        uids = jax.ops.segment_max(jnp.where(start, s_ids, -1), seg,
                                   num_segments=kt)
        return sums, uids

    sums, uids = jax.vmap(fuse_one)(ids_a, ids_b)             # (B, Kt) each
    kk = min(k, kt)
    scores, pos = jax.lax.top_k(sums, kk)
    ids = jnp.take_along_axis(uids, pos, axis=1)
    # zero fused score = empty/missing segment — mark id -1
    ids = jnp.where(scores > 0.0, ids, -1)
    if kk < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kk)))
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
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
    + colbert top-100 (:909) -> RRF -> 50 candidates (:916). NOTE on
    parity: like the reference's bm25s-top-k + dict RRF, a leg whose
    scores are uniformly zero (e.g. BM25 on an all-OOV query) still
    contributes rank credit for its arbitrary zero-score top-k ids. The
    production cascade avoids this by masking zero-score BM25 slots to
    id -1 before fusion (ops/bm25.bm25_topk_device); pass masked id
    lists to ``rrf_from_topk`` directly for that behavior.
    """
    n = scores_a.shape[-1]
    ke = min(k_each, n)
    _, ids_a = jax.lax.top_k(scores_a, ke)
    _, ids_b = jax.lax.top_k(scores_b, ke)
    return rrf_from_topk(ids_a.astype(jnp.int32), ids_b.astype(jnp.int32),
                         k=min(k_out, n), rrf_k=rrf_k)


def final_topk_select(
    rerank: jax.Array,     # (B, C) exact MaxSim rerank scores
    fused_ids: jax.Array,  # (B, C) candidate ids in RRF order, -1 missing
    k_final: int,
    *,
    rrf_k: int = 60,
    final_fusion: str = "rerank",
    weight_cand: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Final top-k over the fused candidates -> (ids (B,k), scores (B,k)).

    ``final_fusion="rerank"``: order purely by the exact MaxSim rerank —
    reference parity (local_rag_complete.py:928). ``"rrf"``: order by
    RRF(rerank ranking, candidate-RRF ranking) — the candidate list's own
    order already encodes BM25+dense evidence, so fusing it back in hedges
    dense-rerank misses (opt-in via RAGConfig.final_fusion).
    ``weight_cand`` (rrf mode only) tilts that blend: 0.5 = equal (the
    round-2 behavior), higher leans on the candidate order — the
    calibrated-hybrid gate raises it when the measured dense leg is weak.
    Reported scores are ALWAYS the exact MaxSim values; only the ORDER
    changes. Missing candidates (id < 0) never surface; short candidate
    lists pad with id -1.
    """
    live = fused_ids >= 0
    rerank = jnp.where(live, rerank, -jnp.inf)
    if final_fusion == "rrf":
        kc = rerank.shape[1]
        rr_rank = jnp.argsort(jnp.argsort(-rerank, axis=1), axis=1)
        wc, wr = 2.0 * weight_cand, 2.0 * (1.0 - weight_cand)
        sel = (wr / (rrf_k + 1.0 + rr_rank)
               + wc / (rrf_k + 1.0 + jnp.arange(kc, dtype=jnp.float32)))
        sel = jnp.where(live, sel, -jnp.inf)
    elif final_fusion == "rerank":
        sel = rerank
    else:
        raise ValueError(f"unknown final_fusion: {final_fusion!r}")
    sel_vals, top_pos = jax.lax.top_k(sel, min(k_final, sel.shape[1]))
    final_ids = jnp.take_along_axis(fused_ids, top_pos, axis=1)
    final_ids = jnp.where(jnp.isfinite(sel_vals), final_ids, -1)
    top_vals = jnp.take_along_axis(rerank, top_pos, axis=1)
    return final_ids.astype(jnp.int32), top_vals


def rrf_reference_py(ranked_a, ranked_b, rrf_k: int = 60):
    """Pure-Python RRF oracle mirroring local_rag_complete.py:960-978
    (dict accumulate, sort by fused score desc). For tests only."""
    scores = {}
    for rank, cid in enumerate(ranked_a, 1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_k + rank)
    for rank, cid in enumerate(ranked_b, 1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_k + rank)
    return sorted(scores.items(), key=lambda x: -x[1])
