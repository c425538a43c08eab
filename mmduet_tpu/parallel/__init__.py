from .mesh import make_mesh, MeshAxes
from .sharding import (
    param_shardings,
    batch_shardings,
    shard_params,
    replicated,
)
