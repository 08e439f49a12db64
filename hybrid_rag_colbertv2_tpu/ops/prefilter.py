"""Pruned (two-stage) dense search: pooled-cosine prefilter + exact MaxSim.

Scaling story (SURVEY.md section 7 'True MaxSim at scale'): the brute-force
MaxSim scan reads the whole ``(N * L, D)`` token index per query batch —
O(N * L * D) bytes and O(N * L * D * Lq) FLOPs. At 1M chunks x 128 tokens
that is ~16 GB of HBM traffic per scan, ~20 ms at v5e bandwidth. This module
cuts both by ~L (the padded token count, 64-256x):

  stage A  proxy = (sum_i q_i) . pooled_doc   — ONE (B, D) x (D, N) matmul
           over a tiny (N, D) pooled-embedding array, top-C candidates;
  stage B  exact fp32 MaxSim only on the C gathered candidates.

The proxy is exactly the score the reference ships as its whole dense stage
(mean-pool cosine mislabeled MaxSim, local_rag_complete.py:802-831, see
ops/maxsim.py). Here it is demoted to what it is good for — a cheap,
well-correlated candidate generator — while ranking is done by the true
late-interaction score. With C >= N the result is bit-identical to the
brute-force scan (degenerate exactness case used by the tests).

All shapes static; the candidate count is rounded up to a multiple of 128
(lane width) and the per-candidate exact scoring is chunked with ``lax.map``
so the gathered fp32 working set stays bounded regardless of C.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .maxsim import NEG_INF
from .quant import unpack_int4, unpack_int4_pairs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def candidate_sims(q: jax.Array,     # (Lq, D) f32 query token embeddings
                   docs: jax.Array,  # (C, L, D) raw — or (C, L/2, D) packed
                   packed_pairs: bool = False,
                   ) -> jax.Array:   # (C, Lq, L) f32, BEFORE dequant/mask
    """Per-candidate token similarity block from RAW gathered index rows.

    Shared by every exact-on-candidates site (pruned stage B, the fused
    cascade reranks): the gather stays in the stored dtype and the
    convert is fused into the dot operand. Nibble-packed int4 pair-rows
    (ops/quant.py::quantize_int4_groups — token 2j in low nibbles, 2j+1 in
    high, full 128-lane width so the gather never triggers an XLA
    relayout of the whole index) are consumed as two einsums whose sims
    interleave back to token order, so the gather traffic is HALF the
    int8 path's and no unpacked copy of the candidates is materialized.
    ``packed_pairs`` must be passed by the caller — the packed array has
    the same width as a raw one (rows differ, which the caller knows)."""
    if packed_pairs:
        lo, hi = unpack_int4(docs)                    # (C, L/2, D) each
        kw = dict(preferred_element_type=jnp.float32)
        s_lo = jnp.einsum("qd,cld->cql", q, lo.astype(jnp.float32), **kw)
        s_hi = jnp.einsum("qd,cld->cql", q, hi.astype(jnp.float32), **kw)
        c, lq, lh = s_lo.shape
        # interleave back to original token order: [even0, odd0, even1, …]
        return jnp.stack([s_lo, s_hi], axis=-1).reshape(c, lq, lh * 2)
    return jnp.einsum("qd,cld->cql", q, docs.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("doc_len", "packed_int4"))
def pooled_doc_embeddings(
    emb_flat: jax.Array,             # (N_pad * L, D) int8/bf16/f32
    scales: Optional[jax.Array],     # (N_pad * L,) f32 when int8, else None
    doc_lengths: jax.Array,          # (N_pad,) int32
    *,
    doc_len: int,
    doc_scales: Optional[jax.Array] = None,  # (N_pad,) f32 for
    # "int8-doc"; (G, N_pad) group scales for "int4-doc"
    packed_int4: bool = False,       # emb_flat is (N_pad * L/2, D) packed
) -> jax.Array:                      # (N_pad, D) bf16, L2-normalized
    """Per-document L2-normalized mean token embedding (the proxy vectors).

    For float/"int8" layouts padded token rows are stored as zeros
    (index/dense.py zeroes them before quantization), so a plain sum over
    the token axis is a sum over valid tokens. The "int8-doc" layout
    duplicates the doc's first row into padding instead, so that path masks
    by ``doc_lengths`` explicitly. Blocked with ``lax.map`` so a 1M-doc
    int8 index never materializes in fp32 (build-time only; the result is
    ~N*D*2 bytes).
    """
    n_pad = doc_lengths.shape[0]
    d = emb_flat.shape[-1]
    # docs per map step — largest divisor of n_pad <= 128 (bucketed
    # sub-indexes can have small n_pad)
    block = math.gcd(n_pad, 128)
    n_blocks = n_pad // block
    rows_per_doc = doc_len // 2 if packed_int4 else doc_len
    embs = emb_flat.reshape(n_blocks, block, rows_per_doc, d)
    if doc_scales is not None:
        if doc_scales.ndim == 2:
            # int4-doc per-token-group scales (G, N) -> per-row (N, L)
            gsz = doc_len // doc_scales.shape[0]
            sc_rows = jnp.repeat(jnp.transpose(doc_scales), gsz, axis=1)
        else:
            sc_rows = jnp.broadcast_to(doc_scales[:, None],
                                       (n_pad, doc_len))
        scs = sc_rows.reshape(n_blocks, block, doc_len)
        lens = doc_lengths.reshape(n_blocks, block)
        tok = jnp.arange(doc_len, dtype=jnp.int32)

        def fd(c):
            e, s, ln = c
            if packed_int4:
                e = unpack_int4_pairs(e)      # (block, L, D) token order
            valid = (tok[None, :] < ln[:, None]).astype(jnp.float32)
            return jnp.sum(e.astype(jnp.float32)
                           * (s * valid)[..., None], axis=1)

        summed = jax.lax.map(fd, (embs, scs, lens))
    elif scales is not None:
        scs = scales.reshape(n_blocks, block, doc_len)

        def f(c):
            e, s = c
            return jnp.sum(e.astype(jnp.float32) * s[..., None], axis=1)

        summed = jax.lax.map(f, (embs, scs))
    else:
        summed = jax.lax.map(
            lambda e: jnp.sum(e.astype(jnp.float32), axis=1), embs)
    summed = summed.reshape(n_pad, d)
    denom = jnp.maximum(doc_lengths.astype(jnp.float32), 1.0)[:, None]
    mean = summed / denom
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return (mean / jnp.maximum(norm, 1e-9)).astype(jnp.bfloat16)


def approx_or_exact_topk(scores: jax.Array, k: int,
                         approx_recall: float = 0.0):
    """Candidate top-k: ``jax.lax.approx_max_k`` (TPU PartialReduce — 30x
    faster than full top_k at (8, 1M)) when it is both enabled and
    meaningful (k <= n/8); exact ``lax.top_k`` otherwise. Values/indices
    contract matches lax.top_k."""
    n = scores.shape[-1]
    if approx_recall and approx_recall < 1.0 and k <= n // 8:
        return jax.lax.approx_max_k(scores, k, recall_target=approx_recall)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit,
                   static_argnames=("n_docs", "c", "approx_recall"))
def pooled_proxy_topk(
    queries: jax.Array,              # (B, Lq, D) — padded query rows zero
    pooled: jax.Array,               # (N_pad, D) from pooled_doc_embeddings
    doc_lengths: jax.Array,          # (N_pad,) int32
    *,
    n_docs: int,
    c: int,
    approx_recall: float = 0.95,
) -> jax.Array:                      # (B, C) candidate ids int32
    """Stage A of the pruned search: pooled-cosine proxy matmul over the
    whole corpus + candidate top-C. O(B*N) but matmul-shaped — amortizes
    across the batch (exposed separately so stage_probe can attribute
    batch-scaling cost, VERDICT r3 next #8)."""
    n_pad = doc_lengths.shape[0]
    qbar = jnp.sum(queries.astype(jnp.float32), axis=1)      # (B, D)
    proxy = jnp.einsum("bd,nd->bn", qbar.astype(jnp.bfloat16), pooled,
                       preferred_element_type=jnp.float32)   # (B, N_pad)
    col = jnp.arange(n_pad, dtype=jnp.int32)
    proxy = jnp.where((col[None, :] < n_docs) & (doc_lengths[None, :] > 0),
                      proxy, NEG_INF)
    _, cand = approx_or_exact_topk(proxy, c, approx_recall)  # (B, C)
    return cand.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("doc_len", "block"))
def exact_maxsim_on_candidates(
    queries: jax.Array,              # (B, Lq, D)
    emb_flat: jax.Array,             # (N_pad * L, D) int8/bf16/f32
    scales: Optional[jax.Array],     # (N_pad * L,) f32 when int8
    doc_lengths: jax.Array,          # (N_pad,) int32
    cand: jax.Array,                 # (B, C) candidate ids (>= 0)
    doc_scales: Optional[jax.Array] = None,
    *,
    doc_len: int,
    block: int = 256,
) -> jax.Array:                      # (B, C) exact fp32 MaxSim scores
    """Stage B of the pruned search: gather candidate token embeddings,
    exact fp32 MaxSim. O(B*C*L*D) gather bytes — the dominant
    non-amortizing stage at large batch.

    Memory layout matters more than FLOPs here (measured: VERDICT r3
    next #8 / docs/performance.md batch-scaling). The original form
    dequantized the gathered docs BEFORE the matmul
    (``(int8 -> f32) * scale`` materialized a 4-byte scaled copy of every
    gathered byte, an unfused elementwise chain ~9x the int8 gather
    traffic — 19.7 ms at batch 64 x C=1024 x 100k docs). This form keeps
    the gather int8 and moves dequantization AFTER the matmul onto the
    (Lq, L) sims — the same algebra as the Pallas scan kernels
    (ops/maxsim.py::_maxsim_int8_kernel): sim(q_i, s_j*e_j) =
    s_j * (q_i . e_j) exactly, with the int8 -> f32 convert fused into
    the dot operand. The dot stays fp32 (int8 values are exact in f32),
    so results still match the fp32 oracle to associativity ulps
    (tests/test_pruned.py pins 1e-5)."""
    n_pad = doc_lengths.shape[0]
    d = emb_flat.shape[-1]
    c = cand.shape[1]
    cb = min(block, c)
    while c % cb != 0:               # c is a multiple of 128
        cb //= 2

    q32 = queries.astype(jnp.float32)
    # nibble-packed int4 pair-rows carry L/2 storage rows per doc at full
    # width (shape-static detection by ROW count, not width)
    packed = emb_flat.shape[0] * 2 == n_pad * doc_len
    embs3 = emb_flat.reshape(n_pad, doc_len // 2 if packed else doc_len, d)
    scs2 = scales.reshape(n_pad, doc_len) if scales is not None else None
    tok = jnp.arange(doc_len, dtype=jnp.int32)

    def exact_one(q, ids):
        def score_block(ib):
            docs = embs3[ib]              # (cb, L, D) raw — or (cb, L/2, D)
            sims = candidate_sims(q, docs, packed_pairs=packed)
            if scs2 is not None:
                sims = sims * scs2[ib][:, None, :]           # dequant on sims
            elif doc_scales is not None and doc_scales.ndim == 2:
                # "int4-doc" per-token-group scales (G, N): expand the
                # gathered (G, cb) columns to per-row (cb, L) scales;
                # duplicated padding rows are masked by the lengths below
                gsz = doc_len // doc_scales.shape[0]
                sc = jnp.repeat(jnp.transpose(doc_scales[:, ib]),
                                gsz, axis=1)                 # (cb, L)
                sims = sims * sc[:, None, :]
            elif doc_scales is not None:
                # "int8-doc": duplicated padding rows are masked by the
                # lengths below
                sims = sims * doc_scales[ib][:, None, None]
            valid = tok[None, :] < doc_lengths[ib][:, None]  # (cb, L)
            sims = jnp.where(valid[:, None, :], sims, NEG_INF)
            per_q = jnp.max(sims, axis=-1)                   # (cb, Lq)
            return jnp.sum(per_q, axis=-1)                   # (cb,)
        return jax.lax.map(score_block, ids.reshape(c // cb, cb)).reshape(c)

    return jax.vmap(exact_one)(q32, cand)                    # (B, C)


@functools.partial(
    jax.jit,
    static_argnames=("doc_len", "n_docs", "n_candidates", "k", "block",
                     "approx_recall"),
)
def maxsim_topk_pruned(
    queries: jax.Array,              # (B, Lq, D) — padded query rows zero
    emb_flat: jax.Array,             # (N_pad * L, D) int8/bf16/f32
    scales: Optional[jax.Array],     # (N_pad * L,) f32 when int8
    doc_lengths: jax.Array,          # (N_pad,) int32
    pooled: jax.Array,               # (N_pad, D) from pooled_doc_embeddings
    doc_scales: Optional[jax.Array] = None,  # (N_pad,) f32 for
    # "int8-doc"; (G, N_pad) group scales for "int4-doc"
    *,
    doc_len: int,
    n_docs: int,
    n_candidates: int,
    k: int,
    block: int = 256,    # candidates scored per lax.map step; the fp32
                         # working set is B*block*L*D*4 bytes. Swept on
                         # v5e at 1M docs: 512/1024 are ~8% faster than
                         # 256 but double/quadruple the transient — keep
                         # 256 as the safe default, tune per deployment.
    approx_recall: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:    # (B, k) scores f32, (B, k) ids int32
    """Two-stage dense top-k: pooled-cosine top-C, exact MaxSim rerank.

    Candidate selection uses approx_max_k when C <= N/8 (the prefilter is
    already an approximation and exact scoring follows; per-element recall
    0.95 of an 8-16x-oversampled candidate set is final-recall neutral —
    bench.py measures recall@10 = 1.000 on device). Degenerate exactness
    (C >= N -> identical to the brute scan) is preserved because the gate
    falls back to exact top_k."""
    n_pad = doc_lengths.shape[0]
    c = min(_round_up(n_candidates, 128), n_pad)
    cand = pooled_proxy_topk(queries, pooled, doc_lengths, n_docs=n_docs,
                             c=c, approx_recall=approx_recall)
    exact = exact_maxsim_on_candidates(
        queries, emb_flat, scales, doc_lengths, cand,
        doc_scales=doc_scales, doc_len=doc_len, block=block)  # (B, C)
    kk = min(k, c)
    vals, pos = jax.lax.top_k(exact, kk)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    ids = jnp.where(vals > NEG_INF / 2, ids, -1)
    if kk < k:
        # keep the documented (B, k) contract when k exceeds the rounded
        # candidate count C (mirrors bm25_topk_device's padding)
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, ids.astype(jnp.int32)
