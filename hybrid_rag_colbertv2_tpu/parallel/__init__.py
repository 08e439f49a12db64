from .mesh import make_mesh, shard_dense_index  # noqa: F401
from .sharded import ShardedRetriever, make_sharded_cascade  # noqa: F401
from .params import shard_encoder_params, describe_shardings  # noqa: F401
