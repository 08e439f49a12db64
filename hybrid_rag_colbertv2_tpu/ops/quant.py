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
