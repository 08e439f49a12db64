"""Pod-scale mesh helpers (parallel/distributed.py) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from hybrid_rag_colbertv2_tpu.parallel.distributed import (
    initialize_distributed,
    make_pod_mesh,
)


def test_single_host_initialize_is_noop():
    assert initialize_distributed() is False


def test_pod_mesh_shape_and_axes():
    mesh = make_pod_mesh(dcn_axis=2, ici_shape=(2, 2))
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dcn", "data", "model")


def test_pod_mesh_defaults_single_process():
    mesh = make_pod_mesh()                 # 1 process -> dcn axis of 1
    assert mesh.devices.shape == (1, 8, 1)


def test_dcn_data_parallel_queries_ici_collectives():
    """DP over the dcn axis (independent query batches), doc-sharded scan
    with collectives over the ici 'data' axis only — the pod layout rule."""
    mesh = make_pod_mesh(dcn_axis=2, ici_shape=(4, 1))
    n_docs_local, d = 8, 16
    # per-ici-shard doc scores: (dcn=2 replicas each see their own queries)
    scores = jnp.arange(2 * 4 * n_docs_local, dtype=jnp.float32).reshape(
        2, 4 * n_docs_local)  # (dcn_batch, docs)

    def body(s):  # s: (1, n_docs_local) per device
        lv, li = jax.lax.top_k(s, 2)
        offset = jax.lax.axis_index("data") * n_docs_local
        gi = li + offset
        av = jax.lax.all_gather(lv, "data", axis=1, tiled=True)
        ai = jax.lax.all_gather(gi, "data", axis=1, tiled=True)
        v, pos = jax.lax.top_k(av, 2)
        return jnp.take_along_axis(ai, pos, axis=1)

    fn = shard_map(body, mesh=mesh, in_specs=P("dcn", "data"),
                   out_specs=P("dcn", None), check_vma=False)
    out = np.asarray(jax.jit(fn)(scores))
    # each dcn replica got the global argmax of ITS batch, no cross-dcn mix
    assert out.shape == (2, 2)
    np.testing.assert_array_equal(out[0], [31, 30])
    np.testing.assert_array_equal(out[1], [31, 30])
