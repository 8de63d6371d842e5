from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_spec,
    param_specs,
    shard_params,
)
