"""Multi-host (pod-scale) runtime: DCN x ICI meshes and process bootstrap.

The reference is a single-process program with no distributed machinery
(SURVEY.md section 2, 'Distributed communication backend: NONE'). For pod
scale the TPU build splits the mesh into two qualitatively different
fabrics (SURVEY.md section 5):

  * ICI (intra-slice interconnect) — fast; carries the per-query
    collectives of the sharded cascade (allgather of top-k candidates,
    psum of rerank partials; parallel/sharded.py).
  * DCN (data-center network between hosts) — slow; should carry only
    *data parallelism*: independent query batches or disjoint corpus
    partitions, with no per-query collectives crossing it.

Layout rule: shard the document axis over ICI within each slice; replicate
(or partition the corpus coarsely) over DCN. ``make_pod_mesh`` builds the
corresponding hybrid mesh with the DCN axis OUTERMOST (device order from
``create_hybrid_device_mesh`` guarantees ICI neighbours stay adjacent).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils.logging import get_logger

log = get_logger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap JAX's multi-host runtime (one call per host process).

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all arguments
    auto-detect; explicit args follow ``jax.distributed.initialize``. Safe
    to call on a single host: returns False and leaves JAX untouched when
    there is nothing to coordinate.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return True
    multi_host_env = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not multi_host_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # backends already initialized (e.g. single-host run that touched
        # jax before calling us, with stray TPU_* env vars around) — treat
        # as single-host rather than crashing the app
        log.warning("skipping distributed init: %s", e)
        return False
    log.info("distributed runtime up: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def make_pod_mesh(
    dcn_axis: int = -1,              # -1: one DCN slot per process
    ici_shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("dcn", "data", "model"),
    devices=None,
) -> Mesh:
    """Build a (dcn, data, model) hybrid mesh.

    ``dcn_axis`` — number of DCN (inter-host) partitions; default one per
    process. ``ici_shape`` — (data, model) split of each slice's devices;
    default (local_devices, 1). Falls back to a plain reshaped mesh when
    all devices are on one host (tests / single-slice).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_dcn = jax.process_count() if dcn_axis == -1 else dcn_axis
    per_slice = n // n_dcn
    if ici_shape is None:
        ici_shape = (per_slice, 1)
    if ici_shape[0] * ici_shape[1] != per_slice:
        raise ValueError(
            f"ici_shape {ici_shape} != {per_slice} devices per DCN slot")

    if n_dcn > 1 and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        # rank-3 shapes: DCN partitions only the leading axis, ICI the rest
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, *ici_shape),
            dcn_mesh_shape=(n_dcn, 1, 1),
            devices=devices,
        )
    else:
        arr = np.asarray(devices).reshape((n_dcn, *ici_shape))
    return Mesh(arr, tuple(axis_names))
