from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    replicated,
    shard_batch,
    stacked_batch_sharding,
)
from .distributed import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    make_multihost_mesh,
    process_batch_slice,
    shard_global_batch,
)
