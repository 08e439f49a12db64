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
