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


def union_floor_split(k_final: int, weight_bm25: float,
                      union_m: int = 0) -> Tuple[int, int]:
    """Weight-tied asymmetric union floors -> (m_bm25, m_dense).

    The total floor budget is 2m (m = ``union_m`` or k_final // 2, so
    the floors always fit k_final) split by the calibrated BM25 leg
    weight: m_bm25 = round(2m * w), clamped to [1, 2m-1] so NEITHER
    floor ever drops to zero for 0 < w < 1 (the gate's protectiveness
    rationale for union). w = 0.5 gives the symmetric (m, m) split
    (round-5 behavior, bit-compatible); w = 0.9 at k_final = 10 gives
    (9, 1) — keep BM25's top-9 and insure with dense's top-1.

    MEASURED (hand-written-questions probe, 2026-08-19, organic corpus):
    the symmetric (5, 5) split scored 0.500 hit@10 on natural questions
    vs BM25-only 0.525 — dense's (weak there) top-5 displaced BM25 ranks
    6-9 where 4 golds lived; the floor-split oracle over the same ranks
    reads (9,1)=0.600, (8,2)=0.575, (5,5)=0.500. Tying the split to the
    measured leg weight lets the SAME calibration that discovers "dense
    is weak here" (w -> 0.9) also protect the deeper BM25 ranks.

    k_final = 1 (m = 0): no two-leg floor fits one slot -> (0, 0), union
    degenerates to the weighted blend.
    """
    m = union_m if union_m > 0 else k_final // 2
    if m <= 0:
        return 0, 0
    tot = 2 * m
    mb = int(tot * weight_bm25 + 0.5)
    mb = max(1, min(tot - 1, mb))
    return mb, tot - mb


@functools.partial(jax.jit,
                   static_argnames=("k", "rrf_k", "weights", "floor_m"))
def rrf_from_topk(
    ids_a: jax.Array,      # (B, Ka) int32 doc ids (global id space)
    ids_b: jax.Array,      # (B, Kb) int32
    *,
    k: int,                # number of fused candidates to keep
    rrf_k: int = 60,       # reference hard-codes 60 (local_rag_complete.py:964)
    weights: Tuple[float, float] = (1.0, 1.0),
    floor_m=0,             # int (symmetric) or (m_a, m_b): each leg's live
                           # top-m ALWAYS survive the cut
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

    ``floor_m`` (the ``final_fusion="union"`` contract,
    final_topk_select): an int floors each leg's live top-m
    symmetrically; an (m_a, m_b) pair floors per leg (the weight-tied
    split, ``union_floor_split``). Floored ids get a bonus tier far
    above any reachable rank-weight sum, so the floors provably survive
    the top-k cut (m_a + m_b <= k required) regardless of ``weights`` —
    without it a leg's top-m id can be crowded out of the candidate set
    by ids appearing in both lists. The returned SCORES of floored ids
    include the bonus (candidate order = floored ids first); the union
    final ordering re-ranks them by best leg rank anyway.
    """
    b, ka = ids_a.shape
    kb = ids_b.shape[1]
    kt = ka + kb

    fa, fb = (floor_m, floor_m) if isinstance(floor_m, int) else floor_m
    wa = weights[0] / (rrf_k + 1.0 + jnp.arange(ka, dtype=jnp.float32))
    wb = weights[1] / (rrf_k + 1.0 + jnp.arange(kb, dtype=jnp.float32))
    if fa > 0 or fb > 0:
        # tier gap 1e3 >> max possible sum (weights sum <= ~4/(rrf_k+1))
        pa = jnp.arange(ka, dtype=jnp.float32)
        pb = jnp.arange(kb, dtype=jnp.float32)
        wa = wa + jnp.where(pa < fa, 1e3 * (fa - pa), 0.0)
        wb = wb + jnp.where(pb < fb, 1e3 * (fb - pb), 0.0)

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
    bm25_ids: jax.Array = None,   # (B, >=m) BM25-ordered top ids ("union")
    dense_ids: jax.Array = None,  # (B, >=m) dense-ordered top ids ("union")
    union_m: int = 0,             # 0 -> k_final // 2
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

    ``final_fusion="union"``: GUARANTEED-MEMBERSHIP ordering. The final
    list provably contains every live id of BM25's top-m_b AND dense's
    top-m_d, where (m_b, m_d) is the WEIGHT-TIED split of the 2m floor
    budget (``union_floor_split``: m = ``union_m`` or k_final // 2;
    m_b = round(2m * weight_cand) clamped so neither floor is 0 for
    0 < weight < 1; w=0.5 -> the symmetric (m, m)). m_b + m_d <= k_final
    always fits; at k_final = 1 the budget is 0 — no two-leg floor fits
    one slot, and union degenerates to the weighted blend. Ordering is the same weighted blend as "rrf" —
    RRF(rerank rank, weighted-leg-RRF rank) at ``weight_cand`` — except
    the guaranteed ids are HOISTED above the rest (stable within the
    blend). Membership makes "hybrid >= max(leg) at depth m" a
    STRUCTURAL invariant instead of a property the scalar weight must
    achieve on every query regime at once — no single
    (rerank|rrf, weight) entry can simultaneously hold the BM25 floor
    on verbatim-anchored paraphrases and the dense floor on
    synonym-adversarial queries (measured, docs/performance.md round-5)
    — while the blend keeps the ORDER calibratable: ("union", 0.9)
    orders like the BM25-protective ("rrf", 0.9) but with the dense
    floor as insurance. The candidate-order term is recomputed from the
    TRUE leg ranks (``bm25_ids``/``dense_ids`` at full depth), not from
    the fused candidate positions — ``rrf_from_topk``'s ``floor_m``
    bonus distorts those to guarantee candidate-set membership
    (candidate-crowd-out is real: ids appearing in both lists can fill
    the whole candidate budget ahead of a single-leg top-m id).

    Reported scores are ALWAYS the exact MaxSim values; only the ORDER
    changes. Missing candidates (id < 0) never surface; short candidate
    lists pad with id -1.
    """
    live = fused_ids >= 0
    rerank = jnp.where(live, rerank, -jnp.inf)
    if final_fusion in ("rrf", "union"):
        kc = rerank.shape[1]
        rr_rank = jnp.argsort(jnp.argsort(-rerank, axis=1), axis=1)
        wc, wr = 2.0 * weight_cand, 2.0 * (1.0 - weight_cand)
        if final_fusion == "union":
            if bm25_ids is None or dense_ids is None:
                raise ValueError(
                    "final_fusion='union' needs bm25_ids and dense_ids")
            # weight-tied floor split; (0, 0) at k_final=1 — no floor
            # can hold both legs in a 1-slot result, so union
            # degenerates to the weighted blend (previously
            # max(1, ...) silently dropped one "guaranteed" id)
            mb, md = union_floor_split(k_final, weight_cand, union_m)

            def leg_rank(leg):
                eq = (fused_ids[:, :, None] == leg[:, None, :]) \
                    & (leg[:, None, :] >= 0)
                pos = jnp.arange(leg.shape[1],
                                 dtype=jnp.float32)[None, None, :]
                return jnp.min(jnp.where(eq, pos, jnp.inf), axis=-1)

            ra = leg_rank(bm25_ids)              # (B, C) inf = absent
            rb = leg_rank(dense_ids)
            # undistorted weighted candidate RRF from true leg ranks
            # (1/(x+inf) -> 0 for absent legs, no NaN)
            rrf_true = (wc / (rrf_k + 1.0 + ra)
                        + (2.0 - wc) / (rrf_k + 1.0 + rb))
            cand_rank = jnp.argsort(jnp.argsort(-rrf_true, axis=1), axis=1)
            guaranteed = (ra < mb) | (rb < md)
            sel = (wr / (rrf_k + 1.0 + rr_rank)
                   + wc / (rrf_k + 1.0 + cand_rank)
                   # uniform hoist tier >> the blend's max 4/(rrf_k+1)
                   + jnp.where(guaranteed, 1e3, 0.0))
        else:
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
