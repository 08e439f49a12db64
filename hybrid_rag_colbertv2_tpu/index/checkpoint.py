"""Sharded index checkpointing (orbax/tensorstore).

The npz persistence in dense.py gathers every array to one host — correct
on a single machine, wrong at pod scale where the index only exists
sharded across hosts (SURVEY.md section 5, checkpoint/resume: 'arrays +
quantization scales serialized per shard'). Orbax writes each shard from
the process that owns it and restores directly into the requested
sharding, so a 33 GB doc-sharded index never flows through one host.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dense import DenseTokenIndex


def _ckpt_dir(path) -> Path:
    return Path(path).absolute() / "orbax"


def save_sharded(dense: DenseTokenIndex, path) -> None:
    """Save a (possibly sharded) dense index; each process writes only the
    shards it owns."""
    import orbax.checkpoint as ocp

    d = _ckpt_dir(path)
    tree = {"emb_flat": dense.emb_flat, "doc_lengths": dense.doc_lengths}
    if dense.scales is not None:
        tree["scales"] = dense.scales
    if dense.pooled is not None:
        tree["pooled"] = dense.pooled
    if dense.doc_scales is not None:          # "int8-doc" layout
        tree["doc_scales"] = dense.doc_scales
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(d / "arrays", tree, force=True)
    meta = {
        "n_docs": dense.n_docs,
        "doc_len": dense.doc_len,
        "dim": dense.dim,
        "dtype": str(dense.emb_flat.dtype),
        "n_pad": dense.n_pad,
        "has_scales": dense.scales is not None,
        "has_pooled": dense.pooled is not None,
        "has_doc_scales": dense.doc_scales is not None,
        # int4-doc group scales are (G, n_pad) with the doc axis MINOR
        "doc_scale_groups": (int(dense.doc_scales.shape[0])
                             if dense.doc_scales is not None
                             and dense.doc_scales.ndim == 2 else 0),
        # nibble-packed "int4-doc" stores L/2 full-width pair-rows per
        # doc (emb_rows < n_pad * doc_len); emb_width covers checkpoints
        # from the earlier feature-halves layout (width dim/2)
        "emb_rows": int(dense.emb_flat.shape[0]),
        "emb_width": int(dense.emb_flat.shape[-1]),
    }
    # orbax coordinates the array writes across processes; the metadata
    # file is ours — only one process may write it on shared storage
    if jax.process_index() == 0:
        Path(d / "meta.json").write_text(json.dumps(meta))


def load_sharded(path, mesh=None, axis: str = "data") -> DenseTokenIndex:
    """Restore a dense index, placing the doc axis over ``mesh``'s ``axis``
    (replicated single-device when ``mesh`` is None). Restores shard-local:
    each device reads only its slice from tensorstore."""
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P, SingleDeviceSharding

    d = _ckpt_dir(path)
    meta = json.loads((d / "meta.json").read_text())
    n_pad, doc_len, dim = meta["n_pad"], meta["doc_len"], meta["dim"]

    if mesh is not None:
        row_s = NamedSharding(mesh, P(axis, None))
        vec_s = NamedSharding(mesh, P(axis))
    else:
        dev = jax.devices()[0]
        row_s = vec_s = SingleDeviceSharding(dev)

    def abs_arr(shape, dtype, sharding):
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype),
                                    sharding=sharding)

    if meta.get("emb_width", dim) != dim:
        raise ValueError(
            "checkpoint uses the retired feature-halves int4 layout "
            "(emb_width < dim) — rebuild the index from the store "
            f"({d})")
    target = {
        # "emb_rows" < n_pad * doc_len for the nibble-packed int4-doc
        # pair-row layout; older checkpoints have no emb_rows key
        "emb_flat": abs_arr((meta.get("emb_rows", n_pad * doc_len), dim),
                            meta["dtype"], row_s),
        "doc_lengths": abs_arr((n_pad,), "int32", vec_s),
    }
    if meta["has_scales"]:
        target["scales"] = abs_arr((n_pad * doc_len,), "float32", vec_s)
    if meta["has_pooled"]:
        target["pooled"] = abs_arr((n_pad, dim), "bfloat16", row_s)
    # checkpoints predating the int8-doc layout have no has_doc_scales key
    ng = meta.get("doc_scale_groups", 0)
    if meta.get("has_doc_scales"):
        if ng:
            # int4-doc group scales: doc axis minor -> sharded on axis 1
            gs_s = (NamedSharding(mesh, P(None, axis)) if mesh is not None
                    else vec_s)
            target["doc_scales"] = abs_arr((ng, n_pad), "float32", gs_s)
        else:
            target["doc_scales"] = abs_arr((n_pad,), "float32", vec_s)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(d / "arrays", target)
    if (meta.get("has_doc_scales") and not ng
            and meta.get("emb_rows", n_pad * doc_len) < n_pad * doc_len):
        # legacy round-4 per-doc int4 checkpoint: uniform broadcast over
        # the group axis is exact under the group kernel (index/dense.py)
        from ..ops.quant import int4_group_size

        ng_up = doc_len // int4_group_size(doc_len)
        gs = jnp.tile(tree["doc_scales"][None, :], (ng_up, 1))
        if mesh is not None:
            gs = jax.device_put(gs, NamedSharding(mesh, P(None, axis)))
        tree["doc_scales"] = gs
    return DenseTokenIndex(
        emb_flat=tree["emb_flat"],
        doc_lengths=tree["doc_lengths"],
        n_docs=meta["n_docs"],
        doc_len=doc_len,
        dim=dim,
        scales=tree.get("scales"),
        pooled=tree.get("pooled"),
        doc_scales=tree.get("doc_scales"),
    )


def save_sharded_bucketed(bidx, path) -> None:
    """Sharded checkpoint of a length-bucketed index: one orbax sub-
    checkpoint per bucket (each bucket is itself a doc-axis-sharded
    DenseTokenIndex) + the replicated routing arrays. At pod scale each
    process writes only the bucket shards it owns, like save_sharded."""
    import orbax.checkpoint as ocp

    root = Path(path).absolute()
    for bi, b in enumerate(bidx.buckets):
        save_sharded(b, root / f"bucket{bi}")
    routing = {
        "bucket_of": bidx.bucket_of,
        "row_of": bidx.row_of,
        "global_ids": {str(i): g for i, g in enumerate(bidx.global_ids)},
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(root / "routing", routing, force=True)
    if jax.process_index() == 0:
        (root / "meta.json").write_text(json.dumps(
            {"n_docs": bidx.n_docs, "n_buckets": len(bidx.buckets)}))


def load_sharded_bucketed(path, mesh=None, axis: str = "data"):
    """Restore a bucketed index with every bucket's doc axis placed over
    ``mesh``'s ``axis`` (routing arrays replicated)."""
    import orbax.checkpoint as ocp
    from jax.sharding import (NamedSharding, PartitionSpec as P,
                              SingleDeviceSharding)

    from .bucketed import BucketedDenseIndex

    root = Path(path).absolute()
    meta = json.loads((root / "meta.json").read_text())
    buckets = [load_sharded(root / f"bucket{bi}", mesh=mesh, axis=axis)
               for bi in range(meta["n_buckets"])]
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        vec_s = NamedSharding(mesh, P(axis))
    else:
        rep = vec_s = SingleDeviceSharding(jax.devices()[0])
    n = meta["n_docs"]

    def abs_arr(shape, sharding):
        return jax.ShapeDtypeStruct(shape, jnp.dtype("int32"),
                                    sharding=sharding)

    target = {
        "bucket_of": abs_arr((n,), rep),
        "row_of": abs_arr((n,), rep),
        "global_ids": {str(i): abs_arr((b.n_pad,), vec_s)
                       for i, b in enumerate(buckets)},
    }
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(root / "routing", target)
    gids = [tree["global_ids"][str(i)] for i in range(len(buckets))]
    return BucketedDenseIndex(
        buckets=buckets, global_ids=gids,
        bucket_of=tree["bucket_of"], row_of=tree["row_of"], n_docs=n)
