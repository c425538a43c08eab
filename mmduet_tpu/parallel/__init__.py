from .mesh import make_mesh, MeshAxes, initialize_distributed
from .sharding import (
    param_shardings,
    batch_shardings,
    opt_state_shardings,
    train_state_shardings,
    shard_train_state,
    shard_params,
    replicated,
)
