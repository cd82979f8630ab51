"""Multi-device mesh tests: sharded execution must equal serial.

conftest.py forces an 8-virtual-device CPU platform, so every test in
this file exercises the real ``shard_map``/``psum`` multi-chip code
paths that run over ICI on TPU pods.
"""

from __future__ import annotations

import numpy as np
import jax

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.ops.solver import (
    build_plan,
    mcsolve_rk4,
    sesolve_rk4_batched,
)
from pulser_tpu.parallel import default_mesh, run_trajectories_sharded

PAIRS = ((1, 0, 0),)  # ground-rydberg sigma_gr / sigma_rr


def test_conftest_provides_virtual_mesh():
    assert len(jax.devices()) == 8
    mesh = default_mesh()
    assert mesh is not None
    assert mesh.shape["traj"] == 8


def test_default_mesh_disabled_by_env(monkeypatch):
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    assert default_mesh() is None


def _make_plans(n_traj, n, n_knots=21, t_end=0.4, seed=0):
    """Random per-trajectory plans sharing one grid (like noise)."""
    rng = np.random.default_rng(seed)
    knots = np.linspace(0.0, t_end, n_knots)
    eval_times = np.array([0.0, t_end / 2, t_end])
    plans, diags = [], []
    for _ in range(n_traj):
        phase = np.exp(
            1j * rng.uniform(0, 2 * np.pi, size=(1, n, 1))
        )
        amp = rng.uniform(1, 6, size=(1, n, n_knots)) * phase
        det = rng.normal(0, 3, size=(1, n, n_knots))
        plans.append(
            build_plan(
                knots,
                {"amp": amp, "det": det},
                eval_times,
                max_step=1e-3,
            )
        )
        diags.append(rng.uniform(0, 20, size=2**n))
    return plans, np.stack(diags)


def _ip_occ(n, d=2, k=0):
    """Detuning-projector occupancies, as the emulator builds them."""
    dim = d**n
    idx = np.arange(dim)
    occ = np.zeros((1, n, dim))
    for q in range(n):
        occ[0, q] = ((idx // (d ** (n - 1 - q))) % d == k).astype(
            float
        )
    return occ


def test_sesolve_batched_sharded_matches_serial():
    """Trajectory-sharded batched sesolve == single-device vmap.

    Uses 6 trajectories on an 8-device mesh to also exercise the
    padding path (6 is not divisible by 8).
    """
    n = 4
    plans, diags = _make_plans(6, n)
    psi0 = np.zeros(2**n, complex)
    psi0[-1] = 1.0
    occ = _ip_occ(n)
    serial = sesolve_rk4_batched(
        psi0, plans, diags, PAIRS, 2, n, occ, dtype=np.complex128
    )
    sharded = sesolve_rk4_batched(
        psi0,
        plans,
        diags,
        PAIRS,
        2,
        n,
        occ,
        dtype=np.complex128,
        mesh=default_mesh(),
    )
    assert sharded.shape == serial.shape == (6, 3, 2**n)
    np.testing.assert_allclose(sharded, serial, atol=1e-12)
    # Sanity: the evolution is unitary
    norms = np.linalg.norm(sharded[:, -1], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_mcsolve_sharded_matches_serial():
    """Quantum-jump trajectories sharded over the mesh == serial.

    Trajectory results are RNG-key-deterministic, so the only
    difference is the psum reduction order (~1e-15 in f64).
    """
    n = 3
    plans, diags = _make_plans(1, n, seed=4)
    psi0 = np.zeros(2**n, complex)
    psi0[-1] = 1.0
    c_op = np.sqrt(0.4) * np.array([[0, 0], [1, 0]], complex)
    kwargs = dict(ntraj=16, seed=11, dtype=np.complex128)
    rho_serial = mcsolve_rk4(
        psi0, plans[0], diags[0], PAIRS, 2, n, [c_op], **kwargs
    )
    rho_sharded = mcsolve_rk4(
        psi0,
        plans[0],
        diags[0],
        PAIRS,
        2,
        n,
        [c_op],
        mesh=default_mesh(),
        **kwargs,
    )
    np.testing.assert_allclose(rho_sharded, rho_serial, atol=1e-10)
    # Physicality: unit trace, Hermitian
    for rho in rho_sharded:
        np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-9)
        np.testing.assert_allclose(rho, rho.conj().T, atol=1e-12)


def _noisy_sequence(mod_device):
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(400, 2 * np.pi, 1.0, 0.0), "ryd")
    return seq


def test_emulator_noisy_sesolve_sharded_matches_serial(
    mod_device, monkeypatch
):
    """End-to-end noisy emulation: sharded == serial NoisyResults.

    The host-side RNG draws (trajectory generation, bitstring
    sampling) are identical under a fixed seed, and the sesolve path
    has no cross-trajectory reduction, so expectations and histograms
    must agree exactly.
    """
    nm = tpu.NoiseModel(
        amp_sigma=0.05, laser_waist=120.0, runs=12, samples_per_run=2
    )
    obs = np.diag([1, 0] * 8).astype(complex)

    np.random.seed(31)
    sim = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device), noise_model=nm
    )
    assert sim._can_batch_trajectories()
    res_sharded = sim.run()

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    np.random.seed(31)
    sim2 = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device), noise_model=nm
    )
    res_serial = sim2.run()

    e_sharded = np.asarray(res_sharded.expect([obs])[0], float)
    e_serial = np.asarray(res_serial.expect([obs])[0], float)
    np.testing.assert_allclose(e_sharded, e_serial, atol=1e-12)
    # Full histogram equality at every evaluation time
    for r_sh, r_se in zip(res_sharded.results, res_serial.results):
        assert r_sh == r_se


def test_emulator_mcsolve_sharded_matches_serial(
    mod_device, monkeypatch
):
    """Stochastic noise + collapse ops → mcsolve; sharded == serial.

    DEFAULT solver selection picks the quantum-jump solver when
    stochastic noise is combined with Lindblad terms (mirroring the
    reference's auto-selection, simulation.py:705-721); the sharded
    density-matrix psum must agree with the serial average.
    """
    nm = tpu.NoiseModel(
        amp_sigma=0.05,
        laser_waist=120.0,
        dephasing_rate=0.3,
        runs=2,
        samples_per_run=2,
    )
    obs = np.diag([1, 0] * 8).astype(complex)

    np.random.seed(47)
    sim = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device), noise_model=nm
    )
    res_sharded = sim.run()

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    np.random.seed(47)
    sim2 = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device), noise_model=nm
    )
    res_serial = sim2.run()

    e_sharded = np.asarray(res_sharded.expect([obs])[0], float)
    e_serial = np.asarray(res_serial.expect([obs])[0], float)
    np.testing.assert_allclose(e_sharded, e_serial, atol=1e-7)


def test_run_trajectories_sharded_histogram():
    """The histogram psum over the mesh sums to the trajectory count
    and matches an unsharded brute-force computation."""
    mesh = default_mesh()
    n = 4
    dim = 2**n
    n_steps = 40
    n_traj = 16
    rng = np.random.default_rng(9)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    base = 0.5 * 2 * np.pi * np.ones((n_steps, 3, 1, n))
    fluct = 1.0 + 0.05 * rng.normal(size=(n_traj, 1, 1, 1, 1))
    amp_stages = (base[None] * fluct).astype(complex)
    det_stages = np.zeros((n_traj, n_steps, 3, 1, n))
    dts = np.full(n_steps, 1e-3)
    diag = rng.uniform(0, 30, size=dim)

    hist = np.asarray(
        run_trajectories_sharded(
            mesh,
            psi0,
            amp_stages,
            det_stages,
            dts,
            diag,
            PAIRS,
            2,
            n,
        )
    )
    assert abs(hist.sum() - n_traj) < 1e-6
    assert hist.shape == (dim,)
    assert (hist >= 0).all()


def test_statevector_sharded_matches_single_device():
    """12-qubit distributed statevector == single-device IP solve.

    The 2^12 axis shards over the 8-device mesh (3 sharded qubits);
    drives on sharded qubits move partner blocks with ppermute.
    """
    from jax.sharding import Mesh
    from pulser_tpu.ops.solver import sesolve_rk4
    from pulser_tpu.parallel import sesolve_ip_statevector_sharded

    n = 12
    rng = np.random.default_rng(2)
    n_knots = 11
    t_end = 0.25
    knots = np.linspace(0.0, t_end, n_knots)
    eval_times = np.array([0.0, t_end / 2, t_end])
    amp = rng.uniform(2, 8, size=(1, n, n_knots)) * np.exp(
        1j * rng.uniform(0, 2 * np.pi, size=(1, n, 1))
    )
    det = rng.normal(0, 4, size=(1, n, n_knots))
    plan = build_plan(
        knots, {"amp": amp, "det": det}, eval_times, max_step=1e-3
    )
    diag = rng.uniform(0, 25, size=2**n)
    psi0 = np.zeros(2**n, complex)
    psi0[-1] = 1.0

    occ = _ip_occ(n)
    ref = sesolve_rk4(
        psi0,
        plan,
        diag,
        PAIRS,
        2,
        n,
        dtype=np.complex128,
        ip_occ=occ,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    shd = sesolve_ip_statevector_sharded(
        psi0, plan, diag, PAIRS, n, mesh, dtype=np.complex128
    )
    assert shd.shape == ref.shape == (3, 2**n)
    np.testing.assert_allclose(shd, ref, atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(shd[-1]), 1.0, atol=1e-8
    )


def test_statevector_sharded_rejects_bad_mesh():
    from jax.sharding import Mesh
    from pulser_tpu.parallel import sesolve_ip_statevector_sharded
    import pytest

    plans, diags = _make_plans(1, 2)
    psi0 = np.zeros(4, complex)
    psi0[-1] = 1.0
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    with pytest.raises(ValueError, match="cannot shard"):
        sesolve_ip_statevector_sharded(
            psi0, plans[0], diags[0], PAIRS, 2, mesh
        )


def test_emulator_uses_statevector_sharding(monkeypatch):
    """With the threshold lowered, the emulator's coherent solve runs
    through the distributed-statevector path and matches the
    single-chip result."""
    from pulser_tpu.parallel import state_sharding

    reg = tpu.Register.square(2, spacing=6.0, prefix="q")

    def mk():
        seq = tpu.Sequence(reg, tpu.devices.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(300, 2 * np.pi, 2.0, 0.3), "ryd"
        )
        return seq

    calls = []
    orig = state_sharding.sesolve_ip_statevector_sharded

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(
        state_sharding, "sesolve_ip_statevector_sharded", spy
    )
    monkeypatch.setenv("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "4")
    psi_sharded = (
        TpuEmulator.from_sequence(mk())
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert calls, "statevector-sharded path was not taken"

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    psi_single = (
        TpuEmulator.from_sequence(mk())
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    np.testing.assert_allclose(psi_sharded, psi_single, atol=1e-9)


def test_mesolve_batched_sharded_matches_serial():
    """Mesh-sharded dissipative (Lindblad) trajectory batch == serial.

    The density-matrix batch splits its trajectory axis over the
    8-device mesh (reference semantics: serial mesolve loop,
    simulation.py:848-861); 6 trajectories also exercise padding.
    """
    from pulser_tpu.ops.solver import mesolve_rk4_batched

    n = 3
    plans, diags = _make_plans(6, n, seed=7)
    psi0 = np.zeros(2**n, complex)
    psi0[0] = 1.0
    rho0 = np.outer(psi0, psi0.conj())
    c_op = np.sqrt(0.25) * np.array([[1, 0], [0, -1]], complex)
    serial = mesolve_rk4_batched(
        rho0, plans, diags, PAIRS, 2, n, [c_op], dtype=np.complex128
    )
    sharded = mesolve_rk4_batched(
        rho0,
        plans,
        diags,
        PAIRS,
        2,
        n,
        [c_op],
        dtype=np.complex128,
        mesh=default_mesh(),
    )
    assert sharded.shape == serial.shape == (6, 3, 2**n, 2**n)
    np.testing.assert_allclose(sharded, serial, atol=1e-12)
    # Physicality on every trajectory/time: unit trace, Hermitian
    tr = np.trace(sharded, axis1=-2, axis2=-1)
    np.testing.assert_allclose(tr.real, 1.0, atol=1e-8)
    np.testing.assert_allclose(
        sharded, np.conj(np.swapaxes(sharded, -1, -2)), atol=1e-10
    )


def test_mcsolve_batched_sharded_matches_serial():
    """Mesh-sharded MCWF trajectory batch == serial (same seeds)."""
    from pulser_tpu.ops.solver import mcsolve_rk4_batched

    n = 3
    plans, diags = _make_plans(5, n, seed=9)
    psi0 = np.zeros(2**n, complex)
    psi0[-1] = 1.0
    c_op = np.sqrt(0.5) * np.array([[0, 0], [1, 0]], complex)
    seeds = [101, 202, 303, 404, 505]
    serial = mcsolve_rk4_batched(
        psi0,
        plans,
        diags,
        PAIRS,
        2,
        n,
        [c_op],
        seeds,
        dtype=np.complex128,
    )
    sharded = mcsolve_rk4_batched(
        psi0,
        plans,
        diags,
        PAIRS,
        2,
        n,
        [c_op],
        seeds,
        dtype=np.complex128,
        mesh=default_mesh(),
    )
    assert sharded.shape == serial.shape == (5, 3, 2**n)
    np.testing.assert_allclose(sharded, serial, atol=1e-12)
    norms = np.linalg.norm(sharded[:, -1], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)


def test_emulator_mesolve_batched_sharded_matches_serial(
    mod_device, monkeypatch
):
    """Forced MESOLVER + stochastic noise: sharded batch == serial.

    Covers the emulator's dissipative master-equation batch
    (_noisy_runs_batched_lindblad → mesolve_rk4_batched with the
    default mesh), the one path round 2 left single-device.
    """
    from pulser_tpu.emulator.simulation import Solver

    nm = tpu.NoiseModel(
        amp_sigma=0.05,
        laser_waist=120.0,
        dephasing_rate=0.3,
        runs=6,
        samples_per_run=2,
    )
    obs = np.diag([1, 0] * 8).astype(complex)

    np.random.seed(53)
    sim = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device),
        noise_model=nm,
        solver=Solver.MESOLVER,
    )
    assert sim._can_batch_lindblad()
    assert not sim._lindblad_solver_choice()
    res_sharded = sim.run()

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    np.random.seed(53)
    sim2 = TpuEmulator.from_sequence(
        _noisy_sequence(mod_device),
        noise_model=nm,
        solver=Solver.MESOLVER,
    )
    res_serial = sim2.run()

    e_sharded = np.asarray(res_sharded.expect([obs])[0], float)
    e_serial = np.asarray(res_serial.expect([obs])[0], float)
    np.testing.assert_allclose(e_sharded, e_serial, atol=1e-9)
    for r_sh, r_se in zip(res_sharded.results, res_serial.results):
        assert r_sh == r_se


def test_xy_statevector_sharded_matches_single_device():
    """12-qubit XY-mode distributed statevector == single-chip solve.

    The flip-flop coupling (reference hamiltonian.py:276-331) rides
    XOR-partner ppermutes for the 3 sharded qubits; drives, detuning
    projectors and the stacking diagonal follow _sesolve_scan exactly.
    """
    from jax.sharding import Mesh
    from pulser_tpu.ops.solver import sesolve_rk4

    n = 12
    xy_pairs = ((0, 1, 1),)  # u<->d drive, detuning projector on d
    rng = np.random.default_rng(8)
    n_knots = 9
    t_end = 0.2
    knots = np.linspace(0.0, t_end, n_knots)
    eval_times = np.array([0.0, t_end / 2, t_end])
    amp = rng.uniform(2, 6, size=(1, n, n_knots)) * np.exp(
        1j * rng.uniform(0, 2 * np.pi, size=(1, n, 1))
    )
    det = rng.normal(0, 3, size=(1, n, n_knots))
    plan = build_plan(
        knots, {"amp": amp, "det": det}, eval_times, max_step=1e-3
    )
    # symmetric zero-diagonal flip-flop couplings + stacking diagonal
    u = rng.normal(0, 2, size=(n, n))
    u = (u + u.T) / 2
    np.fill_diagonal(u, 0.0)
    xy_static = u[None]
    diag = rng.uniform(0, 10, size=2**n)
    psi0 = np.zeros(2**n, complex)
    psi0[0] = 1.0

    ref = sesolve_rk4(
        psi0,
        plan,
        diag,
        xy_pairs,
        2,
        n,
        xy_static=xy_static,
        xy_indices=(0, 1),
        dtype=np.complex128,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    shd = sesolve_rk4(
        psi0,
        plan,
        diag,
        xy_pairs,
        2,
        n,
        xy_static=xy_static,
        xy_indices=(0, 1),
        dtype=np.complex128,
        state_mesh=mesh,
    )
    assert shd.shape == ref.shape == (3, 2**n)
    np.testing.assert_allclose(shd, ref, atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(shd[-1]), 1.0, atol=1e-8
    )


def test_emulator_xy_uses_statevector_sharding(monkeypatch):
    """XY emulation routes through the sharded path and matches."""
    from pulser_tpu.parallel import state_sharding

    reg = tpu.Register.square(2, spacing=8.0, prefix="q")

    def mk():
        seq = tpu.Sequence(reg, tpu.devices.MockDevice)
        seq.declare_channel("mw", "mw_global")
        seq.add(
            tpu.Pulse.ConstantPulse(250, 2 * np.pi, 1.0, 0.2), "mw"
        )
        return seq

    calls = []
    orig = state_sharding.xy_sesolve_statevector_sharded

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(
        state_sharding, "xy_sesolve_statevector_sharded", spy
    )
    monkeypatch.setenv("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "4")
    psi_sharded = (
        TpuEmulator.from_sequence(mk())
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert calls, "XY statevector-sharded path was not taken"

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    psi_single = (
        TpuEmulator.from_sequence(mk())
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    np.testing.assert_allclose(psi_sharded, psi_single, atol=1e-7)


def test_qutrit_basis_routes_to_qudit_sharding(monkeypatch):
    """A qutrit-basis (digital+rydberg) emulation above the sharding
    threshold routes to the embedded d=4 qudit sharded path (never
    the d=2 specialization) and matches the single-device solve."""
    from pulser_tpu.parallel import state_sharding

    reg = tpu.Register.square(2, spacing=6.0, prefix="q")

    def mk():
        seq = tpu.Sequence(reg, tpu.devices.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.declare_channel("ram", "raman_global")
        seq.add(
            tpu.Pulse.ConstantPulse(200, 2 * np.pi, 1.0, 0.0), "ryd"
        )
        seq.add(
            tpu.Pulse.ConstantPulse(200, np.pi, -1.0, 0.5),
            "ram",
            protocol="no-delay",
        )
        return seq

    calls = []
    qudit_calls = []
    orig = state_sharding.sesolve_ip_statevector_sharded
    orig_qudit = state_sharding.qudit_sesolve_ip_statevector_sharded

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    def spy_qudit(*args, **kwargs):
        qudit_calls.append(1)
        return orig_qudit(*args, **kwargs)

    monkeypatch.setattr(
        state_sharding, "sesolve_ip_statevector_sharded", spy
    )
    monkeypatch.setattr(
        state_sharding,
        "qudit_sesolve_ip_statevector_sharded",
        spy_qudit,
    )
    monkeypatch.setenv("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "2")
    sim = TpuEmulator.from_sequence(mk())
    assert sim.dim == 3  # three-level basis: d=2 path ineligible
    psi = (
        sim.run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert not calls, "d=3 solve must not take the d=2 sharded path"
    assert qudit_calls, "d=3 solve must take the qudit sharded path"
    # Same solve with sharding force-disabled is identical.
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    psi_ref = (
        TpuEmulator.from_sequence(mk())
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    np.testing.assert_allclose(psi, psi_ref, atol=1e-9)
    assert abs(np.linalg.norm(psi) - 1) < 1e-6


def test_mesolve_rho_sharded_matches_serial():
    """Row-sharded density-matrix Lindblad solve == single-device.

    Shards ρ's 2^N row axis over the 8-device mesh (the multi-chip
    route for density matrices past one chip's HBM) with both a
    diagonal (dephasing-mask) and an off-diagonal (relaxation, L ρ L†
    block-move) collapse operator in play, so every dissipator code
    path runs under the SPMD partitioner.
    """
    from jax.sharding import Mesh

    from pulser_tpu.ops.solver import mesolve_rk4

    n, d = 5, 2
    dim = d**n
    rng = np.random.default_rng(7)
    knots = np.linspace(0.0, 0.3, 16)
    eval_times = np.array([0.0, 0.15, 0.3])
    amp = rng.uniform(1, 5, size=(1, n, 16)) * np.exp(
        1j * rng.uniform(0, 2 * np.pi, (1, n, 16))
    )
    det = rng.normal(0, 3, size=(1, n, 16))
    plan = build_plan(
        knots, {"amp": amp, "det": det}, eval_times, max_step=1e-3
    )
    diag = rng.uniform(0, 10, size=dim)
    c_deph = np.sqrt(0.5) * np.diag([1.0, -1.0]).astype(complex)
    c_rel = np.sqrt(0.3) * np.array([[0, 1], [0, 0]], complex)
    psi0 = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    psi0 /= np.linalg.norm(psi0)
    rho0 = np.outer(psi0, psi0.conj())

    serial = mesolve_rk4(
        rho0,
        plan,
        diag,
        PAIRS,
        d,
        n,
        [c_deph, c_rel],
        dtype=np.complex128,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    sharded = mesolve_rk4(
        rho0,
        plan,
        diag,
        PAIRS,
        d,
        n,
        [c_deph, c_rel],
        dtype=np.complex128,
        state_mesh=mesh,
    )
    np.testing.assert_allclose(sharded, serial, atol=1e-9)
    # Traces stay unit through the dissipative evolution.
    traces = np.einsum("tii->t", sharded)
    np.testing.assert_allclose(traces.real, 1.0, atol=1e-5)


def test_mesolve_rho_sharded_rejects_bad_mesh():
    """A mesh that does not divide 2^N must fail loudly."""
    import pytest
    from jax.sharding import Mesh

    from pulser_tpu.ops.solver import mesolve_rk4

    n, d = 2, 2  # dim 4 over 8 devices: not divisible
    knots = np.linspace(0.0, 0.1, 4)
    plan = build_plan(
        knots,
        {
            "amp": np.ones((1, n, 4), complex),
            "det": np.zeros((1, n, 4)),
        },
        np.array([0.1]),
        max_step=1e-3,
    )
    rho0 = np.eye(4, dtype=complex) / 4
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    with pytest.raises(ValueError, match="cannot shard"):
        mesolve_rk4(
            rho0,
            plan,
            np.zeros(4),
            PAIRS,
            d,
            n,
            [],
            state_mesh=mesh,
        )


def test_emulator_uses_rho_sharding(mod_device, monkeypatch):
    """With the ρ threshold lowered, the emulator's deterministic
    Lindblad solve routes through the row-sharded density-matrix path
    and matches the single-chip result."""
    from pulser_tpu.parallel import state_sharding

    def mk():
        seq = tpu.Sequence(
            tpu.Register.square(2, spacing=7.0, prefix="q"),
            mod_device,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(300, 2 * np.pi, 1.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(dephasing_rate=0.2)

    meshes = []
    orig = state_sharding.default_state_mesh

    def spy(*args, **kwargs):
        m = orig(*args, **kwargs)
        meshes.append(m)
        return m

    monkeypatch.setattr(state_sharding, "default_state_mesh", spy)
    monkeypatch.setenv("PULSER_TPU_RHO_SHARD_MIN_QUBITS", "4")
    res_sharded = TpuEmulator.from_sequence(
        mk(), noise_model=nm
    ).run()
    assert meshes and meshes[0] is not None, (
        "ρ-sharded path was not taken"
    )

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    res_serial = TpuEmulator.from_sequence(
        mk(), noise_model=nm
    ).run()

    obs = np.diag([1, 0] * 8).astype(complex)
    np.testing.assert_allclose(
        np.asarray(res_sharded.expect([obs])[0], float),
        np.asarray(res_serial.expect([obs])[0], float),
        atol=1e-9,
    )


def _qudit_occ(pairs, n, d):
    """(nb, n, d**n) detuning-projector occupancies."""
    dim = d**n
    idx = np.arange(dim)
    occ = np.zeros((len(pairs), n, dim))
    for b, (_, _, kp) in enumerate(pairs):
        for q in range(n):
            occ[b, q] = (
                (idx // (d ** (n - 1 - q))) % d == kp
            ).astype(float)
    return occ


def _qudit_case(n, d, pairs, seed):
    rng = np.random.default_rng(seed)
    nb = len(pairs)
    n_knots = 9
    t_end = 0.15
    knots = np.linspace(0.0, t_end, n_knots)
    eval_times = np.array([0.0, t_end / 2, t_end])
    amp = rng.uniform(2, 6, size=(nb, n, n_knots)) * np.exp(
        1j * rng.uniform(0, 2 * np.pi, size=(nb, n, 1))
    )
    det = rng.normal(0, 3, size=(nb, n, n_knots))
    plan = build_plan(
        knots, {"amp": amp, "det": det}, eval_times, max_step=1e-3
    )
    diag = rng.uniform(0, 10, size=d**n)
    psi0 = np.zeros(d**n, complex)
    psi0[0] = 1.0
    return plan, diag, psi0


def test_qutrit_sharded_sesolve_matches_serial():
    """8-qutrit (d=3 'all' basis) distributed statevector == serial.

    The qutrit tensor embeds into the d=4 (two bits per digit) flat
    index (state_sharding.qudit_sesolve_ip_statevector_sharded); the
    8-device mesh takes the top 3 bits, so digit 0 is fully sharded
    and digit 1 splits across the device/local boundary — the
    ground-rydberg pair (1,0) rides a pure ppermute while the
    digital pair (1,2) (XOR mask 3) exercises the combined
    ppermute + local-bit-reversal exchange.
    """
    from jax.sharding import Mesh
    from pulser_tpu.ops.solver import sesolve_rk4

    n, d = 8, 3
    pairs = ((1, 0, 0), (1, 2, 2))  # ryd: g<->r, raman: g<->h
    plan, diag, psi0 = _qudit_case(n, d, pairs, seed=12)
    occ = _qudit_occ(pairs, n, d)
    ref = sesolve_rk4(
        psi0, plan, diag, pairs, d, n, ip_occ=occ,
        dtype=np.complex128,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    shd = sesolve_rk4(
        psi0, plan, diag, pairs, d, n, ip_occ=occ,
        dtype=np.complex128, state_mesh=mesh,
    )
    assert shd.shape == ref.shape == (3, d**n)
    np.testing.assert_allclose(shd, ref, atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(shd[-1]), 1.0, atol=1e-8
    )


def test_leakage_d4_sharded_sesolve_matches_serial():
    """6-qudit d=4 (leakage) distributed statevector == serial.

    Native power-of-two digits: no embedding, the 4^6 axis shards
    evenly over the 8-device mesh (k=3, boundary digit split).
    """
    from jax.sharding import Mesh
    from pulser_tpu.ops.solver import sesolve_rk4

    n, d = 6, 4
    pairs = ((1, 0, 0), (1, 2, 2))
    plan, diag, psi0 = _qudit_case(n, d, pairs, seed=21)
    occ = _qudit_occ(pairs, n, d)
    ref = sesolve_rk4(
        psi0, plan, diag, pairs, d, n, ip_occ=occ,
        dtype=np.complex128,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("state",))
    shd = sesolve_rk4(
        psi0, plan, diag, pairs, d, n, ip_occ=occ,
        dtype=np.complex128, state_mesh=mesh,
    )
    np.testing.assert_allclose(shd, ref, atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(shd[-1]), 1.0, atol=1e-8
    )


def test_qudit_embed_indices_roundtrip():
    from pulser_tpu.parallel.state_sharding import (
        qudit_embed_indices,
    )

    g4 = qudit_embed_indices(3, 3)
    # digits (a, b, c) -> a*16 + b*4 + c
    assert g4[0] == 0
    assert g4[1] == 1  # (0,0,1)
    assert g4[3] == 4  # (0,1,0)
    assert g4[9] == 16  # (1,0,0)
    assert g4[26] == 2 * 16 + 2 * 4 + 2
    assert len(np.unique(g4)) == 27


def test_sesolve_ip_2d_mesh_matches_batched():
    """(2, 4) trajectory×state mesh == the plain vmapped batch.

    The 2D composition (SURVEY §2.3): trajectories shard over the
    'traj' axis with zero collectives; within each group the 2^n
    state splits over the 'state' hypercube with XOR-partner
    ppermutes — the per-device body is the 1D state sharding's,
    vmapped over the local trajectory block.
    """
    from jax.sharding import Mesh

    from pulser_tpu.ops.solver import build_plan_batched
    from pulser_tpu.ops.solver import sesolve_rk4_batched
    from pulser_tpu.parallel.mesh2d import sesolve_ip_2d_sharded

    n, n_traj = 7, 6
    dim = 2**n
    rng = np.random.default_rng(17)
    n_knots = 11
    knots = np.linspace(0.0, 0.4, n_knots)
    eval_times = np.array([0.0, 0.2, 0.4])
    amp = np.stack(
        [
            rng.uniform(1, 4, size=(1, n, n_knots))
            * np.exp(
                1j * rng.uniform(0, 2 * np.pi, size=(1, n, 1))
            )
            for _ in range(n_traj)
        ]
    )
    det = np.stack(
        [
            rng.normal(0, 2, size=(1, n, 1))
            * np.ones((1, n, n_knots))
            for _ in range(n_traj)
        ]
    )
    plans = build_plan_batched(
        knots, {"amp": amp, "det": det}, eval_times, max_step=2e-3
    )
    diags = np.stack(
        [rng.uniform(0, 6, dim) for _ in range(n_traj)]
    )
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    pairs = ((1, 0, 0),)

    serial = sesolve_rk4_batched(
        psi0, plans, diags, pairs, 2, n, True,
        dtype=np.complex128, mesh=None,
    )
    devices = jax.devices()
    assert len(devices) >= 8, "conftest provides 8 virtual devices"
    mesh2 = Mesh(
        np.array(devices[:8]).reshape(2, 4),
        axis_names=("traj", "state"),
    )
    sharded = sesolve_ip_2d_sharded(
        psi0, plans, diags, pairs, n, mesh2, dtype=np.complex128
    )
    assert sharded.shape == serial.shape == (n_traj, 3, dim)
    np.testing.assert_allclose(sharded, serial, atol=1e-10)
    np.testing.assert_allclose(
        np.linalg.norm(sharded[:, -1], axis=-1), 1.0, atol=1e-9
    )


def test_emulator_noisy_run_routes_to_2d_mesh(monkeypatch):
    """A forced (2, 4) mesh carries the pure-state noisy batch and
    reproduces the serial result distribution-for-distribution
    (identical trajectory RNG; identical integration grid)."""
    from pulser_tpu.parallel import mesh2d

    reg = tpu.Register.rectangle(2, 3, spacing=7.0, prefix="q")

    def build():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(300, 2 * np.pi, -1.0, 0.0),
            "ryd",
        )
        return seq

    nm = tpu.NoiseModel(
        amp_sigma=0.05, laser_waist=120.0, runs=5, samples_per_run=2
    )

    monkeypatch.setenv("PULSER_TPU_TRAJ_STATE_MESH", "2x4")
    assert mesh2d.default_2d_mesh(6, 5) is not None
    np.random.seed(29)
    sim = TpuEmulator.from_sequence(build(), noise_model=nm)
    assert sim._can_batch_trajectories()
    res_2d = sim.run()

    monkeypatch.delenv("PULSER_TPU_TRAJ_STATE_MESH")
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    np.random.seed(29)
    sim2 = TpuEmulator.from_sequence(build(), noise_model=nm)
    res_serial = sim2.run()

    for r_2d, r_se in zip(res_2d.results, res_serial.results):
        assert r_2d == r_se


def test_default_2d_mesh_policy(monkeypatch):
    """The automatic 2D mesh engages only past the state-sharding
    threshold with enough devices, splitting state first."""
    from pulser_tpu.parallel import mesh2d

    monkeypatch.setenv("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "6")
    m = mesh2d.default_2d_mesh(7, 8)
    assert m is not None
    assert m.shape["state"] >= 2 and m.shape["traj"] >= 2
    assert m.shape["state"] * m.shape["traj"] <= 8
    # Below the threshold: no 2D mesh
    assert mesh2d.default_2d_mesh(5, 8) is None
    # Too few trajectories: no 2D mesh
    assert mesh2d.default_2d_mesh(7, 1) is None
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    assert mesh2d.default_2d_mesh(7, 8) is None
