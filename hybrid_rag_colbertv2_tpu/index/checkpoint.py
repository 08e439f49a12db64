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

    target = {
        "emb_flat": abs_arr((n_pad * doc_len, dim), meta["dtype"], row_s),
        "doc_lengths": abs_arr((n_pad,), "int32", vec_s),
    }
    if meta["has_scales"]:
        target["scales"] = abs_arr((n_pad * doc_len,), "float32", vec_s)
    if meta["has_pooled"]:
        target["pooled"] = abs_arr((n_pad, dim), "bfloat16", row_s)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(d / "arrays", target)
    return DenseTokenIndex(
        emb_flat=tree["emb_flat"],
        doc_lengths=tree["doc_lengths"],
        n_docs=meta["n_docs"],
        doc_len=doc_len,
        dim=dim,
        scales=tree.get("scales"),
        pooled=tree.get("pooled"),
    )
