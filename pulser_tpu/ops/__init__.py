"""TPU compute kernels: structured Hamiltonian application & solvers."""

from pulser_tpu.ops.apply import (
    apply_axis_c,
    apply_axis_r,
    apply_col_c,
    apply_flip_flop_r,
    apply_row_c,
    build_drive_matrices,
    c2r,
    hamiltonian_matvec,
    neg_i,
    r2c,
)
from pulser_tpu.ops.solver import (
    EvolutionPlan,
    build_plan,
    mesolve_rk4,
    sesolve_rk4,
)

__all__ = [
    "apply_axis_c",
    "apply_axis_r",
    "apply_col_c",
    "apply_flip_flop_r",
    "apply_row_c",
    "build_drive_matrices",
    "c2r",
    "hamiltonian_matvec",
    "neg_i",
    "r2c",
    "EvolutionPlan",
    "build_plan",
    "mesolve_rk4",
    "sesolve_rk4",
]
