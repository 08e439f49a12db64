"""int8 row quantization for the dense token-embedding index.

The reference stores its index as a raw ``torch.save`` of fp32 embeddings
(local_rag_complete.py:742-746). Here the HBM-resident index is int8 with a
per-token-row absmax scale (SURVEY.md section 7: '1M x 256 x 128 x int8 ~
33 GB'), dequantized inside the MaxSim kernel (ops/maxsim.py).
"""

from __future__ import annotations

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


@jax.jit
def quantize_int4_docs(
    embs3: jax.Array,          # (N, L, D) fp — padded token rows zero
    lengths: jax.Array,        # (N,) int32
) -> Tuple[jax.Array, jax.Array]:
    """Per-document absmax int4 quantization, nibble-PACKED (index dtype
    ``int4-doc``): HALF the HBM residency and half the candidate-gather
    bytes of int8 — the measured floor of the pruned cascade's stage B is
    XLA's scattered-row gather rate (docs/architecture.md), so packing
    directly buys latency there, and doubles the chunks-per-chip ceiling.

    Packing layout — TOKEN-ROW PAIRS at FULL lane width: storage row
    ``s`` of a document packs its token rows ``2s`` (LOW nibbles) and
    ``2s + 1`` (HIGH nibbles); byte ``j`` carries feature ``j`` of both,
    as signed 4-bit values in [-7, 7] (scale = absmax / 7). Storage is
    therefore ``(N * L/2, D)`` — the minor dim stays the native 128-lane
    tile. The obvious alternative (feature halves, ``(N * L, D/2)``)
    keeps a 64-wide minor dim, and XLA relays out the ENTIRE array
    around every candidate gather at that width — measured 15x slower
    stage-B at 1M docs (6.7 ms vs 0.44 ms per GiB gathered; see
    docs/architecture.md). With pair-rows the MaxSim kernel runs two
    full-K matmuls over half the rows each (same MACs as int8-doc, half
    the HBM read) and the max over the (lo, hi) sims IS the max over
    token pairs. Sign recovery is two arithmetic shifts
    (``unpack_int4``).

    Same layout contract as quantize_int8_docs otherwise: one fp32 scale
    per doc (dequant commutes with the max, applied after it), padded
    token rows duplicate the doc's first row, zero-length docs stay
    all-zero with scale 0. ``L`` must be even.

    -> packed (N * L // 2, D) int8, (N,) f32 per-doc scales.
    """
    x = embs3.astype(jnp.float32)
    n, l, d = x.shape
    assert l % 2 == 0, l
    absmax = jnp.max(jnp.abs(x), axis=(1, 2))                  # (N,)
    scale = absmax / 7.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None, None]), -7, 7)
    tok = jnp.arange(l, dtype=jnp.int32)
    valid = tok[None, :, None] < lengths[:, None, None]
    q = jnp.where(valid, q, q[:, 0:1, :]).astype(jnp.int32)    # dup row 0
    lo = q[:, 0::2, :]                                         # even rows
    hi = q[:, 1::2, :]                                         # odd rows
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4))
    # values fit int8 exactly: hi<<4 in [-112, 112], low nibble adds < 16
    return (packed.astype(jnp.int8).reshape(n * (l // 2), d), scale)


@jax.jit
def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Packed int4 bytes -> (lo, hi) sign-extended values (same shape as
    ``packed``, int32 in [-8, 7]; quantize_int4_docs only emits [-7, 7]).
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
def dequantize_int4_docs(packed_flat: jax.Array,   # (N * L // 2, D) int8
                         doc_scales: jax.Array,    # (N,) f32
                         ) -> jax.Array:           # (N * L, D) f32
    """Test/oracle helper: full fp32 reconstruction of an int4-doc index
    (production kernels never materialize this — they consume the packed
    pair-rows directly)."""
    rows = packed_flat.shape[0]
    n = doc_scales.shape[0]
    lh = rows // n                                    # L / 2
    d = packed_flat.shape[-1]
    full = unpack_int4_pairs(
        packed_flat.reshape(n, lh, d)).astype(jnp.float32)
    return (full * doc_scales[:, None, None]).reshape(n * lh * 2, d)
