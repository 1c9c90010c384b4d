from .mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    shard_batch,
    shard_params_replicated,
    with_data_parallel,
)
