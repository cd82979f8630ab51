"""Multi-chip parallelism: trajectory/state sharding over meshes."""

from pulser_tpu.parallel.capacity import (
    CapacityError,
    capacity_report,
    check_capacity,
    single_chip_ceiling,
)
from pulser_tpu.parallel.mesh2d import (
    default_2d_mesh,
    sesolve_ip_2d_sharded,
)
from pulser_tpu.parallel.state_sharding import (
    STATE_SHARD_MIN_QUBITS,
    sesolve_ip_statevector_sharded,
)
from pulser_tpu.parallel.trajectories import (
    default_mesh,
    pad_to_multiple,
    run_trajectories_sharded,
    sesolve_ip_states_sharded,
)

__all__ = [
    "STATE_SHARD_MIN_QUBITS",
    "CapacityError",
    "capacity_report",
    "check_capacity",
    "default_2d_mesh",
    "default_mesh",
    "sesolve_ip_2d_sharded",
    "sesolve_ip_statevector_sharded",
    "single_chip_ceiling",
    "pad_to_multiple",
    "run_trajectories_sharded",
    "sesolve_ip_states_sharded",
]
