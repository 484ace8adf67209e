"""Device-mesh data parallelism, multi-host scale-out, checkpoints."""

from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .multihost import (  # noqa: F401
    global_mesh,
    global_state,
    init_distributed,
)
from .shard import (  # noqa: F401
    DP_AXIS,
    make_mesh,
    pad_to_devices,
    shard_state,
    sharded_run_segment,
)
