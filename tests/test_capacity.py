"""The single-chip capacity contract for non-shardable bases.

Statevector sharding is a d=2 specialization (XOR-partner ppermute);
qutrit/leakage bases run single-chip and their ceiling is one chip's
HBM. These tests pin the documented ceilings and keep the memory
model self-consistent, complementing
``test_parallel.py::test_qutrit_basis_falls_back_to_single_device``
(which asserts the fallback itself).
"""


from pulser_tpu.parallel import capacity, single_chip_ceiling


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
