"""Sharded index checkpointing (index/checkpoint.py) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import MeshConfig
from hybrid_rag_colbertv2_tpu.index.checkpoint import load_sharded, save_sharded
from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
from hybrid_rag_colbertv2_tpu.parallel.mesh import make_mesh, shard_dense_index


def _make_index(dtype="int8", n=200, L=16, D=32):
    rng = np.random.default_rng(0)
    toks = rng.normal(size=(n, L, D)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lens = rng.integers(L // 2, L + 1, n).astype(np.int32)
    return DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lens),
                                 doc_len=L, dtype=dtype)


@pytest.mark.parametrize("dtype", ["int8", "float32"])
def test_roundtrip_single_device(tmp_path, dtype):
    dense = _make_index(dtype)
    save_sharded(dense, tmp_path / "ck")
    back = load_sharded(tmp_path / "ck")
    np.testing.assert_array_equal(np.asarray(back.emb_flat),
                                  np.asarray(dense.emb_flat))
    np.testing.assert_array_equal(np.asarray(back.doc_lengths),
                                  np.asarray(dense.doc_lengths))
    if dtype == "int8":
        np.testing.assert_allclose(np.asarray(back.scales),
                                   np.asarray(dense.scales))
    assert back.n_docs == dense.n_docs and back.doc_len == dense.doc_len


def test_restore_directly_into_sharding(tmp_path):
    """Save from a sharded index, restore sharded: shardings match the
    mesh layout and search results are identical."""
    dense = _make_index("int8")
    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    sharded = shard_dense_index(dense, mesh)
    save_sharded(sharded, tmp_path / "ck")

    back = load_sharded(tmp_path / "ck", mesh=mesh)
    # restored arrays are actually sharded over the mesh
    assert len(back.emb_flat.sharding.device_set) == 8
    assert len(back.doc_lengths.sharding.device_set) == 8

    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 4, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s0 = np.asarray(dense.search_scores(jnp.asarray(q)))
    s1 = np.asarray(back.search_scores(jnp.asarray(q)))
    np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-5)


def test_roundtrip_int8_doc_scales(tmp_path):
    """The int8-doc layout's per-document scales must survive the orbax
    path (they were silently dropped before round 2's fix)."""
    dense = _make_index("int8-doc")
    assert dense.doc_scales is not None
    save_sharded(dense, tmp_path / "ck")
    back = load_sharded(tmp_path / "ck")
    assert back.doc_scales is not None
    np.testing.assert_allclose(np.asarray(back.doc_scales),
                               np.asarray(dense.doc_scales))
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 4, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(back.search_scores(jnp.asarray(q))),
        np.asarray(dense.search_scores(jnp.asarray(q))),
        rtol=1e-5, atol=1e-5)


def test_bucketed_roundtrip_into_mesh(tmp_path):
    """Bucketed index: save single-device, restore onto the 8-device mesh;
    routing arrays and per-bucket search results survive."""
    from hybrid_rag_colbertv2_tpu.index.bucketed import BucketedDenseIndex
    from hybrid_rag_colbertv2_tpu.index.checkpoint import (
        load_sharded_bucketed, save_sharded_bucketed)

    rng = np.random.default_rng(0)
    n, L, D = 300, 32, 32
    toks = rng.normal(size=(n, L, D)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lens = rng.integers(4, L + 1, n).astype(np.int32)
    bidx = BucketedDenseIndex.build(jnp.asarray(toks), jnp.asarray(lens),
                                    bucket_sizes=(16, 32), dtype="int8")
    save_sharded_bucketed(bidx, tmp_path / "bk")

    mesh = make_mesh(MeshConfig(mesh_shape=(8, 1)))
    back = load_sharded_bucketed(tmp_path / "bk", mesh=mesh)
    assert back.n_docs == bidx.n_docs
    assert len(back.buckets) == len(bidx.buckets)
    np.testing.assert_array_equal(np.asarray(back.bucket_of),
                                  np.asarray(bidx.bucket_of))
    for b0, b1 in zip(bidx.buckets, back.buckets):
        assert len(b1.emb_flat.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(b1.emb_flat),
                                      np.asarray(b0.emb_flat))
    q = rng.normal(size=(2, 4, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v0, i0 = bidx.search_topk(jnp.asarray(q), 10)
    v1, i1 = back.search_topk(jnp.asarray(q), 10)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)


def test_npz_roundtrip_bfloat16(tmp_path):
    """npz cannot hold ml_dtypes bfloat16 natively — the raw-bits uint16
    view must round-trip (previously load raised TypeError and a saved
    bf16 index was unrecoverable, code-review r2)."""
    dense = _make_index("bfloat16")
    dense.save(tmp_path / "bf16")
    back = DenseTokenIndex.load(tmp_path / "bf16")
    assert back.emb_flat.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back.emb_flat, dtype=np.float32),
        np.asarray(dense.emb_flat, dtype=np.float32))
