"""The HBM capacity contract for the solvers.

Every basis shards (d=2 via XOR-partner ppermute, d=3/4 via the d→4
digit embedding — ``test_parallel.py::test_qutrit_basis_routes_to_
qudit_sharding`` — and ρ via row sharding), so the model covers two
regimes: single-chip below the sharding thresholds, and (per-chip HBM)
× (mesh size) above them. These tests pin the documented ceilings,
keep the memory model self-consistent, and assert the emulator's
upfront ``check_capacity`` contract raises instead of OOMing.
"""

import pytest

from pulser_tpu.parallel import (
    CapacityError,
    capacity,
    check_capacity,
    single_chip_ceiling,
)


def test_v5e_ceilings_documented():
    """The ceilings quoted in docs/NUMERICS.md for a 16 GB chip."""
    assert single_chip_ceiling(2) == 27
    assert single_chip_ceiling(3) == 17
    assert single_chip_ceiling(4) == 13


def test_ceiling_is_maximal():
    """N_max fits the budget; N_max + 1 does not."""
    budget = capacity.V5E_HBM_BYTES * capacity.HBM_BUDGET_FRACTION
    for d in (2, 3, 4):
        n = single_chip_ceiling(d)
        assert capacity.solve_bytes(d, n) <= budget
        assert capacity.solve_bytes(d, n + 1) > budget


def test_ceiling_monotone_in_memory_and_dim():
    for d in (2, 3, 4):
        assert single_chip_ceiling(d, 8 * 1024**3) <= (
            single_chip_ceiling(d, 32 * 1024**3)
        )
    for hbm in (8 * 1024**3, 64 * 1024**3):
        assert (
            single_chip_ceiling(2, hbm)
            > single_chip_ceiling(3, hbm)
            > single_chip_ceiling(4, hbm)
        )


def test_solve_bytes_scales_with_eval_states():
    one = capacity.solve_bytes(2, 20, n_eval=1)
    many = capacity.solve_bytes(2, 20, n_eval=101)
    state = 2 * 2**20 * 4
    assert many - one == 100 * state


def test_capacity_report_shape():
    rep = capacity.capacity_report()
    assert set(rep) == {"hbm_bytes", "ceilings"}
    assert set(rep["ceilings"]) == {2, 3, 4}
    assert rep["hbm_bytes"] > 0
    # On the CPU test mesh there is no HBM limit; the report then
    # quotes the v5e reference chip.
    for d, n in rep["ceilings"].items():
        assert n == single_chip_ceiling(d, rep["hbm_bytes"])


def test_sharding_threshold_engages_before_the_wall():
    """STATE_SHARD_MIN_QUBITS sits below the d=2 ceiling, so the
    sharded path takes over before single-chip HBM runs out."""
    from pulser_tpu.parallel import state_sharding

    assert (
        state_sharding.state_shard_min_qubits()
        < single_chip_ceiling(2)
    )


def test_check_capacity_skips_without_hbm_stats(monkeypatch):
    """CPU test meshes report no HBM limit; the contract stays out
    of the way there."""
    monkeypatch.setattr(capacity, "measured_hbm_bytes", lambda: None)
    check_capacity(2, 40)  # absurd size, but no model applies


def test_check_capacity_within_budget(monkeypatch):
    monkeypatch.setattr(
        capacity, "measured_hbm_bytes", lambda: capacity.V5E_HBM_BYTES
    )
    n_max = single_chip_ceiling(2)
    check_capacity(2, n_max)  # fits
    with pytest.raises(CapacityError) as exc:
        check_capacity(2, n_max + 1)
    msg = str(exc.value)
    assert "GiB" in msg and f"n={n_max}" in msg


def test_check_capacity_budget_scales_with_mesh(monkeypatch):
    monkeypatch.setattr(
        capacity, "measured_hbm_bytes", lambda: capacity.V5E_HBM_BYTES
    )
    n_max = single_chip_ceiling(2)
    # 8 chips buy three more qubits of statevector.
    check_capacity(2, n_max + 3, n_devices=8)
    with pytest.raises(CapacityError):
        check_capacity(2, n_max + 4, n_devices=8)


def test_check_capacity_density_matrix_costs_double(monkeypatch):
    monkeypatch.setattr(
        capacity, "measured_hbm_bytes", lambda: capacity.V5E_HBM_BYTES
    )
    n_rho = single_chip_ceiling(2) // 2
    check_capacity(2, n_rho, density_matrix=True)
    with pytest.raises(CapacityError):
        check_capacity(2, n_rho + 1, density_matrix=True)


def test_check_capacity_is_error_and_memoryerror():
    assert issubclass(CapacityError, MemoryError)
    from pulser_tpu.exceptions.base import PulserError

    assert issubclass(CapacityError, PulserError)


def test_emulator_consults_capacity_before_allocating(monkeypatch):
    """An over-capacity run raises the modeled ceiling upfront (the
    emulator calls check_capacity before the solver allocates)."""
    import pulser_tpu as tpu
    from pulser_tpu.emulator import TpuEmulator

    reg = tpu.Register.square(3, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    # Pretend the attached chip has 2 KiB of HBM: any 9-qubit solve
    # must now be rejected upfront by the contract.
    monkeypatch.setattr(
        capacity, "measured_hbm_bytes", lambda: 2048
    )
    with pytest.raises(CapacityError, match="ceiling"):
        sim.run()
