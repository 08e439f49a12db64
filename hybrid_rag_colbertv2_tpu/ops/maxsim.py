"""True MaxSim (late-interaction) scoring kernels.

The reference *claims* MaxSim but implements mean-pool cosine
(``_maxsim_score``, local_rag_complete.py:802-831: mean over the sequence
dim at :821-822, pairwise cosine at :825-829). These kernels implement the
real ColBERT late-interaction score the reference's docstring
(local_rag_complete.py:807-812) and README describe:

    score(q, d) = sum_i  max_j  q_i . d_j

with proper masking of padded document tokens, fp32 accumulation, and
bf16 / int8 operands. This is the single hottest op in the framework
(SURVEY.md section 2 #8): it powers both the first-stage dense scan and the
top-50 rerank (the reference re-encodes candidates for rerank,
local_rag_complete.py:779-800 — here rerank reuses indexed embeddings).

Index layout (see index/dense.py): documents are length-bucketed and padded
to a static ``L`` tokens; embeddings are stored flattened as ``(N * L, D)``
(token-major) so the kernel is one big ``(rows, D) x (D, Lq)`` matmul per
tile — ideal for the MXU — followed by a per-doc max/sum reduction.

Performance envelope (measured, v5e, 100k docs x 128 tokens int8, batch 8):
the bare (12.8M, 128) x (128, 256) matmul runs at ~5 ms (170 TFLOPS; the
int8xint8->int32 MXU path at 4 ms), while the per-token-row-scale kernel
measures ~21 ms — the gap is the VPU post-processing of the
3.3-GIGA-element sims matrix (per-row dequant scale-mul + padding bias +
max over L), which per-token-row scales force to touch every sims element.
Tile size does not move it (64/128/256 docs/tile identical).

``maxsim_scores_int8_doc`` closes that gap with per-DOCUMENT scales
(index dtype "int8-doc", ops/quant.py::quantize_int8_docs): the max
commutes with a positive per-doc scale, so dequantization moves to the
(docs, B*Lq) maxima, and padded token rows are stored as duplicates of the
doc's first row so no -inf bias pass is needed — the only remaining
per-sims-element work is the max reduction itself. Trade-off: coarser
quantization (per-doc absmax). The per-token-row kernel stays the default;
"int8-doc" is the opt-in fast exact scan.

Masking convention (shared with ``maxsim_scores_exact`` so numerics tests
compare like for like):
  * padded document tokens (j >= doc_length) are excluded from the max via a
    -1e30 bias;
  * padded query rows are all-zero vectors, so their max over *valid* doc
    tokens is exactly 0 and they contribute nothing to the sum. Documents
    with length 0 (padding docs) score ~-1e30 * Lq and can never enter
    top-k.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _default_interpret() -> bool:
    # Pallas TPU kernels only compile on TPU; interpret elsewhere (CI runs
    # on a virtual CPU mesh, SURVEY.md section 4c).
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Exact jnp reference (any backend). Used for numerics tests and as the
# fallback path for odd shapes.
# ---------------------------------------------------------------------------

def maxsim_scores_exact(
    queries: jax.Array,       # (B, Lq, D) — padded query rows must be zero
    doc_embs: jax.Array,      # (N, L, D)
    doc_lengths: jax.Array,   # (N,) int32
) -> jax.Array:               # (B, N) float32
    """Brute-force MaxSim in plain jnp (einsum); fp32 accumulation."""
    q = queries.astype(jnp.float32)
    d = doc_embs.astype(jnp.float32)
    # sims: (B, N, Lq, L)
    sims = jnp.einsum("bqd,nld->bnql", q, d, preferred_element_type=jnp.float32)
    tok_idx = jnp.arange(d.shape[1], dtype=jnp.int32)  # (L,)
    valid = tok_idx[None, :] < doc_lengths[:, None]    # (N, L)
    sims = jnp.where(valid[None, :, None, :], sims, NEG_INF)
    per_q = jnp.max(sims, axis=-1)                     # (B, N, Lq)
    # padded query rows are zero vectors -> max over valid doc tokens == 0,
    # except for zero-length (padding) docs where everything is NEG_INF.
    return jnp.sum(per_q, axis=-1)                     # (B, N)


# ---------------------------------------------------------------------------
# Pallas tiled kernel — bf16/f32 operands
# ---------------------------------------------------------------------------

def _pick_docs_per_tile(doc_len: int, blq: int = 256,
                        vmem_budget: int = 32 << 20) -> int:
    """Docs per tile sized so the fp32 sims block (rows x B*Lq) fits the
    VMEM budget; power of two for clean grids."""
    rows_target = max(1024, min(32768, vmem_budget // (4 * blq)))
    t = max(1, rows_target // doc_len)
    p = 1
    while p * 2 <= t:
        p *= 2
    return p


def _fit_tile(t: int, n: int) -> int:
    """Shrink a power-of-two tile until it divides n. Without this, a
    tile that doesn't divide n_pad falls back to jnp.pad of the ENTIRE
    (N*L, D) index inside the jit — a full-index copy (2x transient HBM)
    on every call at index scale. The index builders pad doc counts to
    multiples of 128, so shrinking reaches a divisor at >=128 for any
    built index; odd hand-built doc counts still use the pad path."""
    while t > 1 and n % t != 0:
        t //= 2
    return max(t, 1)


def _maxsim_kernel(q_ref, emb_ref, sel_ref, out_ref, *,
                   docs_per_tile, doc_len):
    """One doc-tile grid cell, ALL queries at once.

    q_ref:   (B*Lq, D)          — all query token embeddings, batch-major
                                  (zero-padded rows)
    emb_ref: (docs_per_tile * L, D) — flattened doc-token embeddings
    sel_ref: (B*Lq, B) f32      — 0/1 selector: column b sums rows of query b
    out_ref: (docs_per_tile, B) f32

    Folding the batch into the matmul's N dimension keeps the MXU wide
    (B*Lq lanes instead of Lq) and cuts grid steps by B — the original
    (tiles x batch) grid spent most of its time in per-step overhead
    (measured 65 ms for a 1.6 GiB scan; this layout is bandwidth-bound).

    Padding mask: the index builder zeroes all padded token rows, so a row
    with zero L1 norm is padding — its similarities get a -inf bias before
    the max over doc tokens. No lengths array needed in the kernel.
    """
    # (rows, D) @ (D, B*Lq) -> (rows, B*Lq); MXU, fp32 accumulate.
    sims = jax.lax.dot_general(
        emb_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rownorm = jnp.sum(jnp.abs(emb_ref[:].astype(jnp.float32)), axis=1,
                      keepdims=True)                  # (rows, 1)
    sims = sims + jnp.where(rownorm > 0.0, 0.0, NEG_INF)
    blq = sims.shape[-1]
    sims3 = sims.reshape(docs_per_tile, doc_len, blq)
    per_q = jnp.max(sims3, axis=1)                    # (docs_per_tile, B*Lq)
    # sum over each query's Lq rows: tiny (T, B*Lq) @ (B*Lq, B) matmul.
    # HIGHEST precision: the default MXU mode rounds per_q to bf16, which
    # costs ~0.1% absolute error on fp32 indexes (caught by check_env on
    # device); this matmul is negligible next to the main one.
    out_ref[:, :] = jax.lax.dot_general(
        per_q, sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit,
    static_argnames=("doc_len", "docs_per_tile", "interpret"),
)
def maxsim_scores(
    queries: jax.Array,       # (B, Lq, D)
    emb_flat: jax.Array,      # (N * L, D)  bf16/f32, token-major
    doc_lengths: jax.Array,   # (N,) int32
    *,
    doc_len: int,
    docs_per_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:               # (B, N) float32
    """Tiled Pallas MaxSim over a flattened padded index."""
    if interpret is None:
        interpret = _default_interpret()
    b, lq, d = queries.shape
    n = doc_lengths.shape[0]
    assert emb_flat.shape[0] == n * doc_len, (emb_flat.shape, n, doc_len)
    t = docs_per_tile or _fit_tile(
        _pick_docs_per_tile(doc_len, b * lq), n)
    if n % t != 0:
        # pad docs (zero embeddings, zero lengths -> never retrieved)
        n_pad = (t - n % t) * 1
        emb_flat = jnp.pad(emb_flat, ((0, n_pad * doc_len), (0, 0)))
        doc_lengths = jnp.pad(doc_lengths, (0, n_pad))
        n_full = n + n_pad
    else:
        n_full = n
    num_tiles = n_full // t

    rows = t * doc_len
    q_flat = queries.reshape(b * lq, d).astype(emb_flat.dtype)
    sel = jnp.kron(jnp.eye(b, dtype=jnp.float32),
                   jnp.ones((lq, 1), jnp.float32))      # (B*Lq, B)
    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, docs_per_tile=t, doc_len=doc_len),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b * lq, d), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * lq, b), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, b), lambda ti: (ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_full * doc_len * d * lq,
            bytes_accessed=emb_flat.size * emb_flat.dtype.itemsize
            + b * lq * d * 4 + b * n_full * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_flat, emb_flat, sel)
    return out.T[:, :n]


# ---------------------------------------------------------------------------
# Pallas tiled kernel — int8 operands with per-token-row scales
# ---------------------------------------------------------------------------

def _maxsim_int8_kernel(q_ref, emb_ref, scale_ref, sel_ref, out_ref, *,
                        docs_per_tile, doc_len):
    """int8 variant of _maxsim_kernel: sims row r is dequantized by
    scale[r] after the matmul.

    scale_ref: (docs_per_tile, L) f32 — per doc-token-row quantization
    scale; padding rows have scale 0, which doubles as the mask (bias
    -inf where scale==0). The scales ride as a (N, L) 2-D operand, NOT a
    (N*L, 1) column vector: XLA lays pallas operands out (8, 128)-tiled,
    so a single-lane column pads x128 in HBM — 32 GB for a 1M x 64-token
    index (measured compile-time OOM); (N, 64) pads only 2x."""
    emb = emb_ref[:].astype(jnp.bfloat16)
    sims = jax.lax.dot_general(
        emb,
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (rows, B*Lq)
    blq = sims.shape[-1]
    sims3 = sims.reshape(docs_per_tile, doc_len, blq)
    scale = scale_ref[:][..., None]                   # (t, L, 1)
    sims3 = sims3 * scale + jnp.where(scale > 0.0, 0.0, NEG_INF)
    per_q = jnp.max(sims3, axis=1)                    # (docs_per_tile, B*Lq)
    out_ref[:, :] = jax.lax.dot_general(
        per_q, sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _maxsim_int8_doc_kernel(q_ref, emb_ref, sel_ref, out_ref, *,
                            docs_per_tile, doc_len):
    """Per-document-scale int8 variant: NO per-element dequant or bias.

    Relies on the "int8-doc" storage contract (ops/quant.py): padded token
    rows duplicate the doc's first row (max unaffected), zero-length docs
    are all-zero with scale 0 (score exactly 0; they live beyond n_docs and
    are sliced off by the caller).

    The per-doc dequant scale is applied OUTSIDE the kernel on the (B, N)
    output — a positive per-doc scale commutes with both the max and the
    selector sum, and a per-doc operand would be a single-lane column the
    (8, 128)-tiled pallas-operand layout pads x128 in HBM.
    """
    emb = emb_ref[:].astype(jnp.bfloat16)
    sims = jax.lax.dot_general(
        emb,
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (rows, B*Lq)
    blq = sims.shape[-1]
    sims3 = sims.reshape(docs_per_tile, doc_len, blq)
    per_q = jnp.max(sims3, axis=1)                    # (docs_per_tile, B*Lq)
    out_ref[:, :] = jax.lax.dot_general(
        per_q, sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _maxsim_int4_group_kernel(q_ref, emb_ref, gs_ref, sel_ref, out_ref, *,
                              docs_per_tile, doc_len, n_groups):
    """Per-token-GROUP-scale int4 variant of ``_maxsim_int8_doc_kernel``.

    emb_ref holds nibble-packed TOKEN-ROW PAIRS at full lane width
    (rows = docs_per_tile * L/2, D): low nibble = even token row, high
    nibble = odd token row, feature j at byte j
    (ops/quant.py::quantize_int4_groups — the layout keeps the minor dim
    at the native 128-lane tile; a D/2-wide layout makes XLA relayout
    the whole array around every gather elsewhere). Unpack is two
    arithmetic shifts; the scan is two full-K matmuls over half the
    rows each — the same MACs as int8-doc at HALF the HBM read — and
    ``max(lo_sims, hi_sims)`` IS the max over each token pair.

    gs_ref: (n_groups, docs_per_tile) f32 — per-(group, doc) dequant
    scale, DOC AXIS MINOR so the operand needs no 128-lane padding
    (a (docs, G) layout would pad x128/G in HBM; a per-doc column pads
    x128 — the measured compile-OOM from CLAUDE.md). A positive scale
    commutes with the max WITHIN its group, so dequantization applies
    to the (t, G, B*Lq) per-group maxima — touching 2/(group) of the
    pair_max elements instead of all of them (the measured 4x VPU tax
    on the per-token-row int8 kernel). No -inf bias pass: padded token
    rows duplicate their group's first valid row (or the doc's row 0
    with group 0's scale for fully-padded groups), so every group's
    scaled max is exactly a valid row's contribution; zero-length docs
    are all-zero with all-zero scales and score exactly 0.
    """
    p = emb_ref[:].astype(jnp.int32)                  # (rows, D) packed
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)   # even token rows
    hi = jnp.right_shift(p, 4)                        # odd token rows
    q = q_ref[:]                                      # (B*Lq, D) bf16
    dn = (((1,), (1,)), ((), ()))
    sims_lo = jax.lax.dot_general(
        lo.astype(jnp.bfloat16), q, dimension_numbers=dn,
        preferred_element_type=jnp.float32)           # (rows, B*Lq)
    sims_hi = jax.lax.dot_general(
        hi.astype(jnp.bfloat16), q, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    pair_max = jnp.maximum(sims_lo, sims_hi)          # max over the pair
    blq = pair_max.shape[-1]
    pairs_per_group = doc_len // (2 * n_groups)
    sims4 = pair_max.reshape(docs_per_tile, n_groups, pairs_per_group, blq)
    gmax = jnp.max(sims4, axis=2)                     # (t, G, B*Lq)
    gs = jnp.transpose(gs_ref[:])[..., None]          # (t, G, 1)
    per_q = jnp.max(gmax * gs, axis=1)                # (t, B*Lq)
    out_ref[:, :] = jax.lax.dot_general(
        per_q, sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit,
    static_argnames=("doc_len", "docs_per_tile", "interpret"),
)
def maxsim_scores_int4_doc(
    queries: jax.Array,       # (B, Lq, D) bf16/f32
    emb_flat: jax.Array,      # (N * L // 2, D) int8 nibble-packed pairs
    group_scales: jax.Array,  # (G, N) float32 per-token-group scales,
                              # doc axis MINOR (quantize_int4_groups)
    doc_lengths: jax.Array,   # (N,) int32 (layout contract only; unused)
    *,
    doc_len: int,
    docs_per_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:               # (B, N) float32
    """int4-doc full scan: half the HBM traffic of the int8-doc kernel at
    the same MACs (two full-K matmuls over half the rows each), with
    per-token-group dequantization applied to the per-group maxima
    inside the kernel (see _maxsim_int4_group_kernel)."""
    del doc_lengths  # masking is baked into the index layout (dup rows)
    if interpret is None:
        interpret = _default_interpret()
    b, lq, d = queries.shape
    ng, n = group_scales.shape
    assert doc_len % 2 == 0 and doc_len % ng == 0 \
        and (doc_len // ng) % 2 == 0, (doc_len, ng)
    assert emb_flat.shape == (n * doc_len // 2, d), (emb_flat.shape, n, d)
    t = docs_per_tile or _fit_tile(
        _pick_docs_per_tile(doc_len, b * lq), n)
    if n % t != 0:
        n_pad = t - n % t
        emb_flat = jnp.pad(emb_flat, ((0, n_pad * doc_len // 2), (0, 0)))
        group_scales = jnp.pad(group_scales, ((0, 0), (0, n_pad)))
        n_full = n + n_pad
    else:
        n_full = n
    num_tiles = n_full // t
    rows = t * doc_len // 2
    q_flat = queries.reshape(b * lq, d).astype(jnp.bfloat16)
    sel = jnp.kron(jnp.eye(b, dtype=jnp.float32),
                   jnp.ones((lq, 1), jnp.float32))      # (B*Lq, B)

    out = pl.pallas_call(
        functools.partial(_maxsim_int4_group_kernel, docs_per_tile=t,
                          doc_len=doc_len, n_groups=ng),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b * lq, d), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, t), lambda ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * lq, b), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, b), lambda ti: (ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_full * doc_len * d * lq,
            bytes_accessed=emb_flat.size + group_scales.size * 4
            + b * lq * d * 2 + b * n_full * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        q_flat,
        emb_flat,
        group_scales,
        sel,
    )
    # zero-length padding docs have all-zero scales and score exactly 0
    return out.T[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("doc_len", "docs_per_tile", "interpret"),
)
def maxsim_scores_int8_doc(
    queries: jax.Array,       # (B, Lq, D) bf16/f32
    emb_flat: jax.Array,      # (N * L, D) int8, "int8-doc" layout
    doc_scales: jax.Array,    # (N,) float32 per-document dequant scale
    doc_lengths: jax.Array,   # (N,) int32 (layout contract only; unused)
    *,
    doc_len: int,
    docs_per_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:               # (B, N) float32
    del doc_lengths  # masking is baked into the index layout (dup rows)
    if interpret is None:
        interpret = _default_interpret()
    b, lq, d = queries.shape
    n = doc_scales.shape[0]
    t = docs_per_tile or _fit_tile(
        _pick_docs_per_tile(doc_len, b * lq), n)
    if n % t != 0:
        n_pad = t - n % t
        emb_flat = jnp.pad(emb_flat, ((0, n_pad * doc_len), (0, 0)))
        doc_scales = jnp.pad(doc_scales, (0, n_pad))
        n_full = n + n_pad
    else:
        n_full = n
    num_tiles = n_full // t
    rows = t * doc_len
    q_flat = queries.reshape(b * lq, d).astype(jnp.bfloat16)
    sel = jnp.kron(jnp.eye(b, dtype=jnp.float32),
                   jnp.ones((lq, 1), jnp.float32))      # (B*Lq, B)

    out = pl.pallas_call(
        functools.partial(_maxsim_int8_doc_kernel, docs_per_tile=t,
                          doc_len=doc_len),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b * lq, d), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * lq, b), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, b), lambda ti: (ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_full * doc_len * d * lq,
            bytes_accessed=emb_flat.size + doc_scales.size * 4
            + b * lq * d * 2 + b * n_full * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        q_flat,
        emb_flat,
        sel,
    )
    # dequant outside the kernel (commutes with max + selector sum);
    # zero-length padding docs have scale 0 and score exactly 0
    return (out.T * doc_scales[None, :])[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("doc_len", "docs_per_tile", "interpret"),
)
def maxsim_scores_int8(
    queries: jax.Array,       # (B, Lq, D) bf16/f32
    emb_flat: jax.Array,      # (N * L, D) int8
    scales: jax.Array,        # (N * L,) float32 per-row dequant scale
    doc_lengths: jax.Array,   # (N,) int32
    *,
    doc_len: int,
    docs_per_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:               # (B, N) float32
    if interpret is None:
        interpret = _default_interpret()
    b, lq, d = queries.shape
    n = doc_lengths.shape[0]
    t = docs_per_tile or _fit_tile(
        _pick_docs_per_tile(doc_len, b * lq), n)
    if n % t != 0:
        n_pad = t - n % t
        emb_flat = jnp.pad(emb_flat, ((0, n_pad * doc_len), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad * doc_len))
        doc_lengths = jnp.pad(doc_lengths, (0, n_pad))
        n_full = n + n_pad
    else:
        n_full = n
    num_tiles = n_full // t
    rows = t * doc_len
    q_flat = queries.reshape(b * lq, d).astype(jnp.bfloat16)
    sel = jnp.kron(jnp.eye(b, dtype=jnp.float32),
                   jnp.ones((lq, 1), jnp.float32))      # (B*Lq, B)

    out = pl.pallas_call(
        functools.partial(_maxsim_int8_kernel, docs_per_tile=t,
                          doc_len=doc_len),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b * lq, d), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, doc_len), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * lq, b), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, b), lambda ti: (ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_full * doc_len * d * lq,
            bytes_accessed=emb_flat.size + scales.size * 4
            + b * lq * d * 2 + b * n_full * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        q_flat,
        emb_flat,
        scales.reshape(n_full, doc_len),   # 2-D: lane-padding-safe layout
        sel,
    )
    return out.T[:, :n]
