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


# ---------------------------------------------------------------------------
# DenseTokenIndex.convert — layout migration without re-encoding
# ---------------------------------------------------------------------------

def _mk_idx(_unused_rng, dtype, n=64, l=16, d=128):
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex

    # own generator: the session-scoped `rng` fixture makes draws
    # order-dependent, and the int4 top-k overlap bound below is only
    # guaranteed for a fixed draw
    rng = np.random.default_rng(7)
    docs = rng.standard_normal((n, l, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    lengths = rng.integers(1, l + 1, size=(n,)).astype(np.int32)
    tok = np.arange(l)
    docs = docs * (tok[None, :, None] < lengths[:, None, None])
    idx = DenseTokenIndex.build(jnp.asarray(docs), jnp.asarray(lengths),
                                doc_len=l, dtype=dtype)
    return idx, docs, lengths


def test_convert_int8_to_int4_composes(rng):
    """convert(int8 -> int4-doc) == quantize_int4(dequantize_int8(x))."""
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.ops.quant import quantize_int4_groups

    idx, docs, lengths = _mk_idx(rng, "int8")
    out = idx.convert("int4-doc")
    assert out.quant == "int4-doc" and out.n_docs == idx.n_docs
    deq = (np.asarray(idx.emb_flat).astype(np.float32)
           * np.asarray(idx.scales)[:, None]).reshape(idx.n_pad, 16, 128)
    want_p, want_s = quantize_int4_groups(jnp.asarray(deq),
                                          idx.doc_lengths)
    np.testing.assert_array_equal(np.asarray(out.emb_flat),
                                  np.asarray(want_p))
    np.testing.assert_allclose(np.asarray(out.doc_scales),
                               np.asarray(want_s), rtol=1e-6)


def test_convert_search_stays_close(rng):
    """Search through a converted index ranks like the source index."""
    import jax.numpy as jnp

    idx, docs, lengths = _mk_idx(rng, "int8")
    qrng = np.random.default_rng(8)   # order-independent draw
    q = qrng.standard_normal((2, 8, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s_src = np.asarray(idx.search_scores(jnp.asarray(q)))
    for target in ("int8-doc", "int4-doc", "bfloat16"):
        out = idx.convert(target)
        s = np.asarray(out.search_scores(jnp.asarray(q)))
        top_a = set(np.argsort(-s_src[0])[:5].tolist())
        top_b = set(np.argsort(-s[0])[:5].tolist())
        assert len(top_a & top_b) >= 4, (target, top_a, top_b)


def test_convert_same_dtype_is_identity(rng):
    idx, *_ = _mk_idx(rng, "int8-doc")
    assert idx.convert("int8-doc") is idx


def test_convert_from_int4_roundtrip(rng):
    """int4 -> float carries exactly the dequantized int4 values on
    valid token rows, and restores ZEROS on padding rows (the float
    layout's contract; the int4-doc source stores duplicated rows
    there)."""
    from hybrid_rag_colbertv2_tpu.ops.quant import dequantize_int4_groups

    idx, docs, lengths = _mk_idx(rng, "int4-doc")
    out = idx.convert("float32")
    got = np.asarray(out.emb_flat).reshape(idx.n_pad, 16, 128)
    deq = np.asarray(dequantize_int4_groups(
        idx.emb_flat, idx.doc_scales)).reshape(idx.n_pad, 16, 128)
    valid = (np.arange(16)[None, :]
             < np.asarray(idx.doc_lengths)[:, None])
    np.testing.assert_allclose(got[valid], deq[valid],
                               rtol=1e-6, atol=1e-7)
    assert (got[~valid] == 0).all()


def test_convert_bucketed_layout(rng):
    """BucketedDenseIndex.convert requantizes every bucket; routing
    arrays are untouched and search still ranks the planted doc."""
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.index.bucketed import BucketedDenseIndex

    lrng = np.random.default_rng(9)
    n, d = 48, 128
    lens = np.concatenate([np.full(24, 12), np.full(24, 40)]).astype(
        np.int32)
    docs = lrng.standard_normal((n, 48, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    tok = np.arange(48)
    docs = docs * (tok[None, :, None] < lens[:, None, None])
    bidx = BucketedDenseIndex.build(
        jnp.asarray(docs), jnp.asarray(lens), bucket_sizes=(16, 48),
        dtype="int8", docs_pad_multiple=16)
    q = jnp.asarray(docs[7][None, :8])       # planted: doc 7's tokens
    v1, i1 = bidx.search_topk(q, k=5)
    out = bidx.convert("int4-doc")
    assert out.buckets[0].quant == "int4-doc"
    assert out.n_docs == bidx.n_docs
    v2, i2 = out.search_topk(q, k=5)
    assert int(np.asarray(i2)[0, 0]) == int(np.asarray(i1)[0, 0]) == 7
