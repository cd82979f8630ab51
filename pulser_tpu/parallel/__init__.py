"""Multi-chip parallelism: trajectory sharding over device meshes."""

from pulser_tpu.parallel.trajectories import (
    default_mesh,
    pad_to_multiple,
    run_trajectories_sharded,
    sesolve_ip_states_sharded,
)

__all__ = [
    "default_mesh",
    "pad_to_multiple",
    "run_trajectories_sharded",
    "sesolve_ip_states_sharded",
]
