"""HBM capacity model for the statevector/density-matrix solvers.

Every basis now has a sharded path: ``d=2`` states split on the qubit
bits (XOR-partner ``ppermute``, :mod:`.state_sharding`), ``d=3``/``d=4``
states split on the flat ``4^n`` index via the d→4 digit embedding
(``tests/test_parallel.py::test_qutrit_basis_routes_to_qudit_sharding``),
and density matrices split on rows. This module therefore models two
regimes, both against the same memory accounting:

- **below the sharding threshold** (``state_shard_min_qubits()`` /
  ``rho_shard_min_qubits()``) the solve runs on one chip, and the
  ceiling is one chip's HBM;
- **at or above it** the state divides evenly across the mesh, so the
  ceiling is (per-chip HBM) × (mesh devices).

:func:`check_capacity` turns the model into an upfront contract: the
emulator consults it before allocating, so an over-capacity request
raises :class:`CapacityError` with the modeled footprint instead of
OOMing mid-solve.

Memory model (measured on a v5e, see the constants): the XLA RK4 scan
keeps the state as a ``(2, d^N)`` real pair and XLA's fusion holds a
small constant number of live stage buffers, plus one ``(n_eval, 2,
d^N)`` output block and the ``(d^N,)`` interaction diagonal.
"""

from __future__ import annotations

import math

from pulser_tpu.exceptions.base import PulserError


class CapacityError(PulserError, MemoryError):
    """A requested solve exceeds the modeled HBM capacity."""


#: Live (2, dim) real-pair buffers the fused RK4 scan holds at peak —
#: state + 4 stage derivatives + 2 rotation temporaries + headroom.
#: Anchored against device memory_stats() on the v5e (a 2^20 f32 solve
#: peaks at ~8 buffer-equivalents; we budget conservatively).
LIVE_STATE_BUFFERS = 10

#: Fraction of the chip's HBM the solver may plan for (the rest covers
#: the compiled program, staged coefficients and the runtime).
HBM_BUDGET_FRACTION = 0.9

#: v5e (the benchmark chip) HBM per chip, in bytes.
V5E_HBM_BYTES = 16 * 1024**3


def solve_bytes(
    d: int, n: int, n_eval: int = 1, itemsize: int = 4
) -> int:
    """Peak solver HBM footprint for an ``n``-qudit, dim-``d`` solve.

    Args:
        d: Qudit dimension (2 = qubits, 3 = qutrits, 4 = leakage).
        n: Qudit count.
        n_eval: Evaluation-time states kept on device.
        itemsize: Real dtype size (4 = float32 pairs ≙ complex64).
    """
    dim = d**n
    state = 2 * dim * itemsize
    return (
        LIVE_STATE_BUFFERS * state
        + n_eval * state
        + dim * itemsize  # interaction diagonal
    )


def single_chip_ceiling(
    d: int,
    hbm_bytes: int = V5E_HBM_BYTES,
    n_eval: int = 1,
    itemsize: int = 4,
) -> int:
    """Largest ``n`` whose statevector solve fits one chip's HBM.

    For every ``d`` this is the single-device regime's hard ceiling;
    the sharding thresholds (``state_shard_min_qubits()``, compared
    against ``n`` for ``d=2`` and against the effective ``2n`` for
    ``d in (3, 4)``) default below it deliberately, so on multi-chip
    hosts the sharded path takes over before the wall and the ceiling
    grows with the mesh (see :func:`check_capacity`).
    """
    budget = hbm_bytes * HBM_BUDGET_FRACTION
    n = int(
        math.floor(
            math.log(
                budget
                / (
                    (LIVE_STATE_BUFFERS + n_eval) * 2 * itemsize
                    + itemsize
                ),
                d,
            )
        )
    )
    while solve_bytes(d, n + 1, n_eval, itemsize) <= budget:
        n += 1
    while n > 0 and solve_bytes(d, n, n_eval, itemsize) > budget:
        n -= 1
    return n


def measured_hbm_bytes() -> "int | None":
    """The attached accelerator's HBM, when one is present."""
    import jax

    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit")
    return int(limit) if limit else None


def capacity_report() -> dict:
    """Ceilings per basis dimension for the active (or v5e) chip."""
    hbm = measured_hbm_bytes() or V5E_HBM_BYTES
    return {
        "hbm_bytes": int(hbm),
        "ceilings": {
            d: single_chip_ceiling(d, hbm) for d in (2, 3, 4)
        },
    }


def check_capacity(
    d: int,
    n: int,
    *,
    n_eval: int = 1,
    itemsize: int = 4,
    n_devices: int = 1,
    density_matrix: bool = False,
    what: str = "solve",
) -> None:
    """Raise :class:`CapacityError` if a solve exceeds the HBM budget.

    The emulator calls this before allocating (see
    ``emulator/simulation.py``), turning the capacity model into an
    upfront contract. A density matrix over ``n`` dim-``d`` qudits is
    accounted as a ``d^(2n)``-amplitude state. When the solve shards
    (``n_devices > 1``) the state divides evenly, so the budget scales
    with the mesh.

    Skips silently when the attached accelerator reports no HBM limit
    (CPU test meshes) — there the model's constants don't apply.
    """
    hbm = measured_hbm_bytes()
    if hbm is None:
        return
    eff_n = 2 * n if density_matrix else n
    need = solve_bytes(d, eff_n, n_eval=n_eval, itemsize=itemsize)
    budget = hbm * HBM_BUDGET_FRACTION * max(1, int(n_devices))
    if need <= budget:
        return
    kind = "density-matrix" if density_matrix else "statevector"
    ceiling = single_chip_ceiling(
        d, int(hbm * max(1, int(n_devices))), n_eval, itemsize
    )
    if density_matrix:
        ceiling //= 2
    raise CapacityError(
        f"The requested {what} needs ~{_human_bytes(need)} of HBM "
        f"for an n={n}, d={d} {kind} ({n_eval} evaluation state(s) "
        f"kept on device), but the modeled budget is "
        f"{_human_bytes(budget)} "
        f"({HBM_BUDGET_FRACTION:.0%} of {n_devices} × "
        f"{_human_bytes(hbm)}). The modeled ceiling at this "
        f"configuration is n={ceiling}. Reduce the atom count or the "
        f"number of evaluation times, or run on a larger device mesh "
        f"(the state shards across chips; see pulser_tpu.parallel)."
    )


def _human_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB"):
        if n < 1024:
            return f"{n:.0f} {unit}"
        n /= 1024
    return f"{n:.1f} GiB"
