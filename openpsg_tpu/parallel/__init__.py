from openpsg_tpu.parallel.mesh import make_mesh  # noqa: F401
from openpsg_tpu.parallel.sharding import (  # noqa: F401
    param_sharding_rules,
    shard_params,
    batch_sharding,
)
