"""Single-chip capacity model for the statevector solvers.

The distributed-statevector path (:mod:`.state_sharding`) is a ``d=2``
specialization — the XOR-partner ``ppermute`` exchange relies on every
drive pair flipping one qubit BIT. Qutrit (``digital`` + ``rydberg``,
``d=3``) and leakage (``d=4``) bases therefore run single-chip (the
emulator falls back automatically, see
``tests/test_parallel.py::test_qutrit_basis_falls_back_to_single_device``),
and their scale ceiling is one chip's HBM. This module makes that
ceiling an explicit, testable contract instead of an OOM surprise.

Memory model (measured on a v5e, see the constants): the XLA RK4 scan
keeps the state as a ``(2, d^N)`` real pair and XLA's fusion holds a
small constant number of live stage buffers, plus one ``(n_eval, 2,
d^N)`` output block and the ``(d^N,)`` interaction diagonal.
"""

from __future__ import annotations

import math


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

    The ``d = 2`` answer is where :mod:`.state_sharding` takes over
    (``STATE_SHARD_MIN_QUBITS`` defaults below it deliberately, so
    sharding engages before the wall); for ``d in (3, 4)`` it is the
    hard ceiling until a qudit-sharded matvec exists.
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
