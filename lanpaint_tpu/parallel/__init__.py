from .mesh import (  # noqa: F401
    MeshSpec,
    hidream_ep_rules,
    make_mesh,
    shard_batch,
    shard_params_replicated,
    shard_params_tp,
    tp_param_shardings,
    tp_plan_bytes,
    with_data_parallel,
)
