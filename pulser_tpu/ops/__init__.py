"""TPU compute kernels: structured Hamiltonian application & solvers."""

from pulser_tpu.ops.apply import (
    apply_axis,
    apply_col,
    apply_flip_flop,
    apply_row,
    build_drive_matrices,
    hamiltonian_matvec,
    sum_axis_ops,
)
from pulser_tpu.ops.solver import (
    EvolutionPlan,
    build_plan,
    mesolve_rk4,
    sesolve_rk4,
)

__all__ = [
    "apply_axis",
    "apply_col",
    "apply_flip_flop",
    "apply_row",
    "build_drive_matrices",
    "hamiltonian_matvec",
    "sum_axis_ops",
    "EvolutionPlan",
    "build_plan",
    "mesolve_rk4",
    "sesolve_rk4",
]
