from vqa_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    param_spec,
    replicated,
    shard_variables,
    variables_shardings,
)
