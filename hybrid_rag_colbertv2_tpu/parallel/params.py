"""Tensor-parallel parameter sharding for the ColBERT encoder.

Megatron-style layout over the mesh's ``model`` axis:

  * attention query/key/value kernels: shard the output (head) dim;
  * attention out kernel: shard the input dim (heads) — the following
    residual add triggers one psum;
  * MLP intermediate kernel: shard the output (ffn) dim; MLP output kernel:
    shard the input dim — one psum per block;
  * embeddings / LayerNorms / the 128-d projection: replicated (tiny).

With ``jax.jit`` + these NamedShardings on the params and batch-sharded
inputs, XLA inserts the all-reduces — no manual collectives (SURVEY.md
section 5: scale via sharding annotations, not a comm library). Composes
with the trainer's DP batch axis for 2-D (data x model) meshes.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [p for p in path]
    joined = "/".join(names)
    if leaf.ndim != 2:
        return P()  # biases, LayerNorm scales, embeddings rows
    if "attention" in joined:
        if names[-2] in ("query", "key", "value"):
            return P(None, "model")
        if names[-2] == "out":
            return P("model", None)
    if names[-2] == "intermediate":
        return P(None, "model")
    if names[-2] == "output":
        return P("model", None)
    return P()  # colbert_linear + anything unrecognized: replicated


def shard_encoder_params(params: Dict, mesh: Mesh) -> Dict:
    """Re-place an encoder param tree with TP shardings over ``mesh``.

    Dimensions must divide the 'model' axis size (heads and ffn dims are
    powers of two in all presets).
    """

    def place(path, leaf):
        names = tuple(str(getattr(p, "key", p)) for p in path)
        spec = _spec_for(names, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def describe_shardings(params: Dict) -> Dict[str, str]:
    """path -> sharding string (debug/tests)."""
    out = {}

    def rec(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        out[names] = str(getattr(leaf, "sharding", None))
        return leaf

    jax.tree_util.tree_map_with_path(rec, params)
    return out
