"""int8 row quantization for the dense token-embedding index.

The reference stores its index as a raw ``torch.save`` of fp32 embeddings
(local_rag_complete.py:742-746). Here the HBM-resident index is int8 with a
per-token-row absmax scale (SURVEY.md section 7: '1M x 256 x 128 x int8 ~
33 GB'), dequantized inside the MaxSim kernel (ops/maxsim.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def quantize_int8_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize (rows, D) -> int8 values + per-row fp32 scales.

    Symmetric absmax quantization: v = round(x / scale), scale = absmax/127.
    All-zero rows (padding tokens) get scale 0 so they dequantize to 0.
    """
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)                      # (rows,)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def dequantize_int8_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[:, None]


@jax.jit
def quantize_int8_docs(
    embs3: jax.Array,          # (N, L, D) fp — padded token rows zero
    lengths: jax.Array,        # (N,) int32
) -> Tuple[jax.Array, jax.Array]:
    """Per-DOCUMENT absmax int8 quantization (index dtype ``int8-doc``).

    One fp32 scale per document instead of per token-row. Because a
    positive per-doc scale commutes with the max over doc tokens, the
    MaxSim scan kernel needs NO per-element dequant multiply — the scale is
    applied to the (docs, B*Lq) maxima instead of the (docs*L, B*Lq) sims
    (ops/maxsim.py::maxsim_scores_int8_doc). Padding-mask trick: padded
    token rows are stored as COPIES of the document's first token row, so
    the max over all L rows equals the max over valid rows and the kernel
    needs no -inf bias pass either. Zero-length (padding) docs stay
    all-zero with scale 0 and score exactly 0.

    Cost: coarser quantization (rows share the doc's largest absmax) —
    measured recall impact documented in docs/performance.md.
    """
    x = embs3.astype(jnp.float32)
    n, l, d = x.shape
    absmax = jnp.max(jnp.abs(x), axis=(1, 2))                  # (N,)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None, None]), -127, 127)
    tok = jnp.arange(l, dtype=jnp.int32)
    valid = tok[None, :, None] < lengths[:, None, None]
    q = jnp.where(valid, q, q[:, 0:1, :])                      # dup row 0
    return q.astype(jnp.int8).reshape(n * l, d), scale


def int4_group_size(doc_len: int, group: int = 8) -> int:
    """Token rows per int4 quantization group: the largest of
    (group, group/2, …, 2) dividing ``doc_len``. Must stay EVEN so group
    boundaries align with the nibble-packed pair-rows."""
    g = group
    while g > 2 and doc_len % g != 0:
        g //= 2
    assert doc_len % g == 0 and g % 2 == 0, (doc_len, g)
    return g


@functools.partial(jax.jit, static_argnames=("group",))
def quantize_int4_groups(
    embs3: jax.Array,          # (N, L, D) fp — padded token rows zero
    lengths: jax.Array,        # (N,) int32
    *,
    group: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Per-TOKEN-GROUP absmax int4 quantization, nibble-PACKED (index
    dtype ``int4-doc``): HALF the HBM residency and half the candidate-
    gather bytes of int8 — the measured floor of the pruned cascade's
    stage B is XLA's scattered-row gather rate (docs/architecture.md),
    so packing directly buys latency there, and doubles the
    chunks-per-chip ceiling.

    Scale granularity: ``group`` (default 8, via ``int4_group_size``)
    consecutive token rows share one fp32 absmax scale — between the
    round-4 per-document scale (recall@10 vs exact 0.938: one outlier
    row inflated the 4-bit grid for all L rows) and per-token-row
    (whose dequant multiply must touch every sims element — the
    measured 4x VPU tax on the int8 per-row kernel). The scan kernel
    applies scales to per-GROUP maxima — L/group of the sims elements —
    and the scales array is (G, N) fp32 with the doc axis MINOR, so it
    needs no 128-lane padding (G=8 exactly fills the sublane tile) and
    adds <1% to the packed index's HBM.

    Packing layout — TOKEN-ROW PAIRS at FULL lane width: storage row
    ``s`` of a document packs its token rows ``2s`` (LOW nibbles) and
    ``2s + 1`` (HIGH nibbles); byte ``j`` carries feature ``j`` of both,
    as signed 4-bit values in [-7, 7] (scale = group absmax / 7).
    Storage is therefore ``(N * L/2, D)`` — the minor dim stays the
    native 128-lane tile. The obvious alternative (feature halves,
    ``(N * L, D/2)``) keeps a 64-wide minor dim, and XLA relays out the
    ENTIRE array around every candidate gather at that width — measured
    15x slower stage-B at 1M docs (docs/architecture.md). With
    pair-rows the MaxSim kernel runs two full-K matmuls over half the
    rows each (same MACs as int8-doc, half the HBM read) and the max
    over the (lo, hi) sims IS the max over token pairs. Sign recovery
    is two arithmetic shifts (``unpack_int4``).

    Padding contract (keeps the kernel's max bias-free AND bit-equal to
    the masked oracle): a padded token row inside a partially-valid
    group duplicates the group's FIRST row (valid rows are a prefix, so
    the group start is valid — the dup's stored bytes equal a valid
    row's, leaving the group max untouched); a fully-padded group
    duplicates the DOC's first row and inherits group 0's scale (its
    dequantized contribution is then exactly row 0's, <= the doc max).
    Zero-length (padding) docs stay all-zero with all scales 0 and
    score exactly 0. ``L`` must be a multiple of ``group``.

    -> packed (N * L // 2, D) int8, (G, N) f32 group scales
       (G = L // group; doc axis minor — the kernel-operand layout).
    """
    x = embs3.astype(jnp.float32)
    n, l, d = x.shape
    g = int4_group_size(l, group)
    ng = l // g
    xg = x.reshape(n, ng, g, d)
    absmax = jnp.max(jnp.abs(xg), axis=(2, 3))                 # (N, G)
    scale = absmax / 7.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xg / safe[:, :, None, None]), -7, 7
                 ).astype(jnp.int32)                           # (N,G,g,D)
    # dup fill per group: group's first row if the group has any valid
    # row (valid rows are a prefix of the doc), else the doc's row 0
    gstart = jnp.arange(ng, dtype=jnp.int32) * g               # (G,)
    g_live = gstart[None, :] < lengths[:, None]                # (N, G)
    fill = jnp.where(g_live[:, :, None], q[:, :, 0, :],
                     q[:, 0:1, 0, :])                          # (N, G, D)
    scale = jnp.where(g_live, scale, scale[:, 0:1])            # (N, G)
    tok = jnp.arange(l, dtype=jnp.int32).reshape(ng, g)
    valid = tok[None] < lengths[:, None, None]                 # (N, G, g)
    q = jnp.where(valid[..., None], q, fill[:, :, None, :])
    q = q.reshape(n, l, d)
    lo = q[:, 0::2, :]                                         # even rows
    hi = q[:, 1::2, :]                                         # odd rows
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4))
    # values fit int8 exactly: hi<<4 in [-112, 112], low nibble adds < 16
    return (packed.astype(jnp.int8).reshape(n * (l // 2), d),
            jnp.transpose(scale))                              # (G, N)


@jax.jit
def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Packed int4 bytes -> (lo, hi) sign-extended values (same shape as
    ``packed``, int32 in [-8, 7]; quantize_int4_groups only emits [-7, 7]).
    lo is the EVEN token row of the pair, hi the ODD one."""
    p = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)   # arithmetic shifts
    hi = jnp.right_shift(p, 4)                        # sign-extends nibble
    return lo, hi


def unpack_int4_pairs(packed: jax.Array) -> jax.Array:
    """(..., L/2, D) packed pair-rows -> (..., L, D) int32 values in
    original token order (even rows from low nibbles interleaved with the
    odd rows from high nibbles)."""
    lo, hi = unpack_int4(packed)
    st = jnp.stack([lo, hi], axis=-2)                 # (..., L/2, 2, D)
    return st.reshape(*packed.shape[:-2], packed.shape[-2] * 2,
                      packed.shape[-1])


@jax.jit
def dequantize_int4_groups(packed_flat: jax.Array,  # (N * L // 2, D) int8
                           group_scales: jax.Array,  # (G, N) f32 — or a
                           # legacy (N,) per-doc vector (treated uniform)
                           ) -> jax.Array:          # (N * L, D) f32
    """Test/oracle helper: full fp32 reconstruction of an int4-doc index
    (production kernels never materialize this — they consume the packed
    pair-rows directly)."""
    rows = packed_flat.shape[0]
    d = packed_flat.shape[-1]
    if group_scales.ndim == 1:                       # legacy per-doc
        n = group_scales.shape[0]
        sc_rows = group_scales[:, None]              # (N, 1) broadcast
    else:
        ng, n = group_scales.shape
        g = (rows // n) * 2 // ng                    # rows per group
        sc_rows = jnp.repeat(jnp.transpose(group_scales), g,
                             axis=1)                 # (N, L)
    lh = rows // n                                   # L / 2
    full = unpack_int4_pairs(
        packed_flat.reshape(n, lh, d)).astype(jnp.float32)
    return (full * sc_rows[:, :, None]).reshape(n * lh * 2, d)
