"""int8 row quantization (ops/quant.py) unit tests."""

import jax.numpy as jnp
import numpy as np

from hybrid_rag_colbertv2_tpu.ops.quant import (
    dequantize_int8_rows,
    quantize_int8_rows,
)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    q, scale = quantize_int8_rows(jnp.asarray(x))
    back = np.asarray(dequantize_int8_rows(q, scale))
    # symmetric absmax: per-element error <= scale/2 = absmax/254
    bound = (np.abs(x).max(axis=1) / 254.0 + 1e-7)[:, None]
    assert (np.abs(back - x) <= bound).all()


def test_zero_rows_scale_zero():
    x = jnp.zeros((4, 16), jnp.float32)
    q, scale = quantize_int8_rows(x)
    assert np.asarray(scale).tolist() == [0.0] * 4
    assert np.asarray(dequantize_int8_rows(q, scale)).max() == 0.0


def test_values_in_int8_range_and_absmax_hits_127():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 64)).astype(np.float32) * 10
    q, scale = quantize_int8_rows(jnp.asarray(x))
    q = np.asarray(q)
    assert q.dtype == np.int8
    assert q.min() >= -127 and q.max() <= 127
    # each row's absmax element quantizes to +-127
    rows = np.arange(32)
    cols = np.abs(x).argmax(axis=1)
    assert (np.abs(q[rows, cols]) == 127).all()
