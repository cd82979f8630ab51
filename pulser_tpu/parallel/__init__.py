"""Multi-chip parallelism: trajectory sharding over device meshes."""

from pulser_tpu.parallel.trajectories import run_trajectories_sharded

__all__ = ["run_trajectories_sharded"]
