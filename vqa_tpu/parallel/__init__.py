from vqa_tpu.parallel import distributed  # noqa: F401
from vqa_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    mesh_from_config,
    param_spec,
    replicated,
    shard_variables,
    variables_shardings,
)
