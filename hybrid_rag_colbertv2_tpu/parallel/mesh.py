"""Device mesh + index sharding layout.

The reference has NO distributed machinery (single-process MPS-or-CPU,
local_rag_complete.py:86; SURVEY.md section 2 'Parallelism strategies:
NONE'). This is the TPU build's replacement: a ``jax.sharding.Mesh`` whose
``data`` axis shards the *document* dimension of both the dense token index
and the per-document arrays across ICI, while queries and the small BM25
CSR stay replicated. Per-shard top-k keeps the full k so the post-allgather
global top-k is exact (SURVEY.md section 7, 'Sharded top-k correctness').
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig
from ..index.bucketed import BucketedDenseIndex
from ..index.dense import DenseTokenIndex


def make_mesh(
    mesh_cfg: Optional[MeshConfig] = None,
    devices=None,
) -> Mesh:
    mesh_cfg = mesh_cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    shape = mesh_cfg.resolved_mesh_shape(len(devices))
    if shape[0] * shape[1] > len(devices):
        raise ValueError(f"mesh {shape} needs more than {len(devices)} devices")
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, mesh_cfg.axis_names)


def shard_dense_index(dense: DenseTokenIndex, mesh: Mesh,
                      axis: str = "data") -> DenseTokenIndex:
    """Re-place a dense index with its doc axis sharded over ``axis``.

    The index builder pads n_docs to a multiple of 128, which divides
    evenly for any power-of-two shard count <= 128.
    """
    import jax.numpy as jnp

    n_shards = mesh.shape[axis]
    if dense.n_pad % n_shards != 0:
        raise ValueError(
            f"n_pad={dense.n_pad} not divisible by {n_shards} shards")
    row_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    emb = jax.device_put(dense.emb_flat, row_sharding)
    lengths = jax.device_put(dense.doc_lengths, vec_sharding)
    scales = (jax.device_put(dense.scales, vec_sharding)
              if dense.scales is not None else None)
    if dense.doc_scales is None:
        doc_scales = None
    elif dense.doc_scales.ndim == 2:
        # int4-doc group scales (G, N): the doc axis is MINOR (axis 1)
        doc_scales = jax.device_put(dense.doc_scales,
                                    NamedSharding(mesh, P(None, axis)))
    else:
        doc_scales = jax.device_put(dense.doc_scales, vec_sharding)
    pooled = (jax.device_put(dense.pooled, row_sharding)
              if dense.pooled is not None else None)
    return DenseTokenIndex(
        emb_flat=emb, doc_lengths=lengths, n_docs=dense.n_docs,
        doc_len=dense.doc_len, dim=dense.dim, scales=scales, pooled=pooled,
        doc_scales=doc_scales,
    )


def shard_bucketed_index(bidx: BucketedDenseIndex, mesh: Mesh,
                         axis: str = "data") -> BucketedDenseIndex:
    """Shard every bucket's doc axis over ``axis``; the per-bucket
    ``global_ids`` (padded to each sub-index's capacity, -1 in padding)
    shard identically so each shard maps its local rows to global corpus
    ids without communication. bucket_of/row_of stay replicated (they are
    (N,) int32 — tiny)."""
    vec_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    subs = [shard_dense_index(b, mesh, axis) for b in bidx.buckets]
    gids = [jax.device_put(g, vec_sharding) for g in bidx.global_ids]
    return BucketedDenseIndex(
        buckets=subs, global_ids=gids,
        bucket_of=jax.device_put(bidx.bucket_of, rep),
        row_of=jax.device_put(bidx.row_of, rep),
        n_docs=bidx.n_docs,
    )
