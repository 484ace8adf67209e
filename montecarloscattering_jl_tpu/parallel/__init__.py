"""Device-mesh data parallelism and checkpoint/resume."""

from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .shard import (  # noqa: F401
    DP_AXIS,
    make_mesh,
    pad_to_devices,
    shard_state,
    sharded_run_segment,
)
