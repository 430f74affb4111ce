from .distributed import (  # noqa: F401
    global_mesh,
    host_local_batch,
    initialize_distributed,
    is_distributed,
)
from .mesh import (  # noqa: F401
    data_parallel_loss_fn,
    gspmd_loss_fn,
    make_mesh,
    replicate,
    shard_batch,
)
from .shard_filter import (  # noqa: F401
    build_plan_sharded,
    build_plan_sharded_join,
    filter_sharded,
)
