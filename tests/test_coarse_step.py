"""Interaction-picture step coarsening.

The IP solve rotates the full diagonal away with exact phase
integrals, so the step may exceed the 1 ns coefficient grid as long
as it resolves the rotated drive's fastest oscillation (the largest
single-flip energy gap + detuning; ``Hamiltonian.max_flip_gap``).
These tests pin the policy: when it engages, the accuracy contract,
user caps, and the env opt-out.
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator


def _afm_seq():
    reg = tpu.Register.square(3, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om, d0, df = 2.0 * 2 * np.pi, -6 * 2 * np.pi, 2 * 2 * np.pi
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, 0.0, om), d0, 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            om, tpu.RampWaveform(2700, d0, df), 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, om, 0.0), df, 0.0
        ),
        "ryd",
    )
    return seq


def _final(sim, **run_kwargs):
    psi = (
        sim.run(**run_kwargs)
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    return np.asarray(psi)


def _fidelity(a, b):
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    return abs(np.vdot(a, b)) ** 2


def test_max_flip_gap_value():
    """Row sums of |U|: the 3x3 lattice's interior atom dominates."""
    sim = TpuEmulator.from_sequence(_afm_seq())
    h = sim._current_hamiltonian
    U_nn = tpu.MockDevice.interaction_coeff / 6.0**6
    # interior atom: 4 nearest + 4 diagonal neighbours
    expected = 4 * U_nn + 4 * U_nn / 8.0
    # (f32 register coordinates shift the distances at the 1e-7 level)
    assert h.max_flip_gap == pytest.approx(expected, rel=1e-6)


def test_coarse_step_engages_and_matches(monkeypatch):
    """Default coarse policy: larger steps, 1-F <= 1e-8 vs the 1 ns
    grid, and unit-norm outputs."""
    monkeypatch.setenv("PULSER_TPU_COARSE_STEP", "0")
    sim_fine = TpuEmulator.from_sequence(
        _afm_seq(), evaluation_times="Minimal"
    )
    psi_fine = _final(sim_fine)
    assert sim_fine._sticky_steps.get("sesolve") == 1e-3
    assert "sesolve_coarse" not in sim_fine._sticky_steps

    monkeypatch.delenv("PULSER_TPU_COARSE_STEP")
    sim = TpuEmulator.from_sequence(
        _afm_seq(), evaluation_times="Minimal"
    )
    psi = _final(sim)
    coarse = sim._sticky_steps.get("sesolve_coarse")
    assert coarse is not None and coarse > 1e-3
    assert 1 - _fidelity(psi_fine, psi) < 1e-8
    # Renormalized outputs: the coarse-step norm drift is removed.
    assert abs(np.linalg.norm(psi) - 1) < 1e-9


def test_user_max_step_still_binds():
    sim = TpuEmulator.from_sequence(
        _afm_seq(), evaluation_times="Minimal"
    )
    psi_capped = _final(sim, max_step=1e-3)

    sim_fine = TpuEmulator.from_sequence(
        _afm_seq(), evaluation_times="Minimal"
    )
    import os

    os.environ["PULSER_TPU_COARSE_STEP"] = "0"
    try:
        psi_fine = _final(sim_fine)
    finally:
        del os.environ["PULSER_TPU_COARSE_STEP"]
    np.testing.assert_array_equal(psi_capped, psi_fine)


def test_env_forces_coarse_cap(monkeypatch):
    """PULSER_TPU_COARSE_STEP=<float> caps the coarse ladder."""
    monkeypatch.setenv("PULSER_TPU_COARSE_STEP", "2e-3")
    sim = TpuEmulator.from_sequence(
        _afm_seq(), evaluation_times="Minimal"
    )
    _final(sim)
    coarse = sim._sticky_steps.get("sesolve_coarse")
    assert coarse is not None and coarse <= 2e-3


def test_weak_drive_sequence_coarsens_further(monkeypatch):
    """An isolated atom has no flip gap: the step is bounded only by
    the drive and the 4 ns cap."""
    reg = tpu.Register.from_coordinates([(0.0, 0.0)], prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(2000, np.pi), 0.0, 0.0
        ),
        "ryd",
    )
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    psi = _final(sim)
    assert sim._current_hamiltonian.max_flip_gap == 0.0
    assert sim._sticky_steps.get("sesolve_coarse") == 4e-3
    # pi pulse: P(r) = 1
    assert abs(psi[0]) ** 2 == pytest.approx(1.0, abs=1e-6)


def test_dense_eval_times_unaffected():
    """With per-ns evaluation times the grid is pinned by the eval
    points; coarsening must not lose any of them."""
    sim = TpuEmulator.from_sequence(_afm_seq())  # default: Full
    res = sim.run()
    assert len(res.states) == len(sim.evaluation_times)
    norms = [np.linalg.norm(s.full()) for s in res.states]
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_noisy_coherent_batch_coarsens(monkeypatch, mod_device):
    """The trajectory batch shares the coarse IP grid; observables
    match the fine-grid batch to solver tolerance."""
    nm = tpu.NoiseModel(
        amp_sigma=0.05, laser_waist=120.0, runs=6, samples_per_run=2
    )
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")

    def mk():
        seq = tpu.Sequence(reg, mod_device)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(400, 2 * np.pi, 1.0, 0.0), "ryd"
        )
        return seq

    obs = np.diag([1, 0] * 8).astype(complex)

    np.random.seed(7)
    sim = TpuEmulator.from_sequence(mk(), noise_model=nm)
    e_coarse = np.asarray(sim.run().expect([obs])[0], float)
    assert sim._sticky_steps.get("sesolve_batch_coarse", 0) > 1e-3

    monkeypatch.setenv("PULSER_TPU_COARSE_STEP", "0")
    np.random.seed(7)
    sim2 = TpuEmulator.from_sequence(mk(), noise_model=nm)
    e_fine = np.asarray(sim2.run().expect([obs])[0], float)
    assert "sesolve_batch_coarse" not in sim2._sticky_steps
    np.testing.assert_allclose(e_coarse, e_fine, atol=5e-6)


# ------------------------------------------------------------- MCWF IP


def test_mcwf_ip_eligibility():
    from pulser_tpu.ops.solver import mcwf_ip_eligible

    deph = np.sqrt(0.8) * np.array([[1, 0], [0, 0]], complex)
    rel = np.sqrt(0.5) * np.array([[0, 0], [1, 0]], complex)
    z = np.diag([1.0, -1.0]).astype(complex)  # diagonal, 2 entries
    sx = np.array([[0, 1], [1, 0]], complex)  # 2 off-diag units
    assert mcwf_ip_eligible([deph, rel, z])
    assert not mcwf_ip_eligible([sx])
    assert not mcwf_ip_eligible([deph, sx])


def test_mcwf_ip_matches_lab_per_trajectory():
    """With the SAME grid the IP and lab MCWF unravellings draw the
    same thresholds and jump at the same steps: per-trajectory density
    matrices agree to integration tolerance."""
    from pulser_tpu.ops.solver import build_plan, mcsolve_rk4

    n, d = 3, 2
    dim = d**n
    PAIRS = ((1, 0, 0),)
    rng = np.random.default_rng(5)
    knots = np.linspace(0, 0.5, 26)
    amp = (
        rng.uniform(1, 5, size=(1, n, 26))
        * np.exp(1j * rng.uniform(0, 2 * np.pi, (1, n, 1)))
    ).astype(complex)
    det = rng.normal(0, 3, size=(1, n, 26))
    plan = build_plan(
        knots, {"amp": amp, "det": det}, np.array([0.25, 0.5]),
        max_step=1e-3,
    )
    diag = rng.uniform(0, 40, size=dim)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    ops = [
        np.sqrt(0.8) * np.array([[1, 0], [0, 0]], complex),
        np.sqrt(0.5) * np.array([[0, 0], [1, 0]], complex),
    ]
    for seed in (2, 5, 7):  # seeds with jumps (verified divergent
        # before the jump-frame fix)
        kw = dict(ntraj=4, seed=seed, dtype=np.complex128)
        a = mcsolve_rk4(
            psi0, plan, diag, PAIRS, d, n, ops, **kw
        )
        b = mcsolve_rk4(
            psi0, plan, diag, PAIRS, d, n, ops, ip=True, **kw
        )
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_mcwf_coarse_ip_unbiased_vs_mesolve():
    """The coarse-grid IP unravelling converges to the same master
    equation as the fine-grid lab unravelling."""
    from pulser_tpu.ops.solver import (
        build_plan,
        mcsolve_rk4,
        mesolve_rk4,
    )

    n, d = 2, 2
    dim = d**n
    PAIRS = ((1, 0, 0),)
    knots = np.linspace(0, 0.4, 401)
    t = np.linspace(0, 1, 401)
    amp = (4.0 * np.sin(np.pi * t)[None, None, :]).astype(
        complex
    ) * np.ones((1, n, 1))
    det = 2.0 * np.cos(np.pi * t)[None, None, :] * np.ones((1, n, 1))
    evals = np.array([0.4])
    diag = np.array([30.0, 0.0, 0.0, 0.0])
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    ops = [np.sqrt(1.5) * np.array([[1, 0], [0, 0]], complex)]

    plan_fine = build_plan(
        knots, {"amp": amp, "det": det}, evals, max_step=1e-3
    )
    plan_coarse = build_plan(
        knots, {"amp": amp, "det": det}, evals, max_step=4e-3,
        coarsen=True,
    )
    assert len(plan_coarse.dts) < len(plan_fine.dts) / 3

    rho_me = mesolve_rk4(
        np.outer(psi0, psi0.conj()), plan_fine, diag, PAIRS, d, n,
        ops, dtype=np.complex128,
    )[-1]
    NT = 600
    a = mcsolve_rk4(
        psi0, plan_fine, diag, PAIRS, d, n, ops,
        ntraj=NT, seed=3, dtype=np.complex128,
    )[-1]
    b = mcsolve_rk4(
        psi0, plan_coarse, diag, PAIRS, d, n, ops,
        ntraj=NT, seed=3, ip=True, dtype=np.complex128,
    )[-1]
    # Monte-Carlo scale: 1/sqrt(600) ~ 0.04; both must sit inside it
    assert np.abs(a - rho_me).max() < 0.05
    assert np.abs(b - rho_me).max() < 0.05
    assert abs(np.trace(b).real - 1) < 1e-9


def test_emulator_mcwf_coarse_engages(mod_device):
    """The dissipative batch picks the coarse MCWF-IP grid under
    stochastic noise + dephasing."""
    nm = tpu.NoiseModel(
        amp_sigma=0.05,
        laser_waist=120.0,
        dephasing_rate=0.1,
        runs=3,
        samples_per_run=2,
    )
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(400, 2 * np.pi, 1.0, 0.0), "ryd")

    np.random.seed(11)
    sim = TpuEmulator.from_sequence(seq, noise_model=nm)
    assert sim._can_batch_lindblad()
    res = sim.run()
    assert sim._sticky_steps.get("mcwf_coarse", 0) > 1e-3
    assert sum(res.results[-1].values()) == pytest.approx(1.0)


def test_pallas_kernel_handles_coarse_plan():
    """The fused Pallas sesolve (interpret mode) on a COARSENED plan
    equals the XLA IP path — the exact combination the flagship TPU
    benchmark runs."""
    from pulser_tpu.ops import solver as S

    reg = tpu.Register.rectangle(2, 7, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(16, 0.0, 4 * np.pi), -4 * np.pi, 0.3
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            4 * np.pi,
            tpu.RampWaveform(24, -4 * np.pi, 2 * np.pi),
            0.3,
        ),
        "ryd",
    )
    sim = TpuEmulator.from_sequence(seq)
    ham = sim._current_hamiltonian
    knots = ham.sampling_times
    evals = np.array([knots[-1] * 0.5, knots[-1]])
    plan = S.build_plan(
        knots,
        {"amp": ham.amp_coeffs, "det": ham.det_coeffs},
        evals,
        max_step=4e-3,
        coarsen=True,
    )
    assert len(plan.dts) < len(knots)  # genuinely coarse
    psi0 = sim.initial_state.full()[:, 0].astype(np.complex64)
    ip_occ = sim._make_ip_occ(ham)
    xla = S.sesolve_rk4(
        psi0,
        plan,
        ham.int_diag,
        ham.pairs,
        ham.dim,
        ham.n_qudits,
        ip_occ=ip_occ,
        dtype=np.complex64,
    )
    pal = S._sesolve_rk4_pallas(
        psi0, plan, ham.int_diag, ham.n_qudits, np.complex64,
        interpret=True,
    )
    assert np.max(np.abs(xla - pal)) < 1e-6


# ---------------------------------------------------- mesolve IP


def test_mesolve_ip_eligibility():
    from pulser_tpu.ops.solver import mesolve_ip_eligible

    deph = np.sqrt(0.8) * np.array([[1, 0], [0, 0]], complex)
    z = np.diag([1.0, -1.0]).astype(complex)
    rel = np.sqrt(0.5) * np.array([[0, 0], [1, 0]], complex)
    assert mesolve_ip_eligible([deph, z])
    assert mesolve_ip_eligible([])  # pure coherent dm evolution
    # off-diagonal units gain state-dependent phases in L rho L†
    assert not mesolve_ip_eligible([rel])


def test_mesolve_ip_matches_lab():
    """Same grid: the IP master equation equals the lab-frame one to
    the lab path's own truncation; coarse grid stays accurate."""
    from pulser_tpu.ops.solver import build_plan, mesolve_rk4

    n, d = 3, 2
    dim = d**n
    PAIRS = ((1, 0, 0),)
    knots = np.linspace(0, 0.4, 401)
    t = np.linspace(0, 1, 401)
    amp = (
        (3.0 * np.sin(np.pi * t) + 1.0)[None, None, :]
        * np.ones((1, n, 1))
    ).astype(complex)
    det = (
        2.0 * np.cos(np.pi * t)[None, None, :] * np.ones((1, n, 1))
    )
    evals = np.array([0.2, 0.4])
    rng = np.random.default_rng(5)
    diag = rng.uniform(0, 40, size=dim)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    rho0 = np.outer(psi0, psi0.conj())
    ops = [
        np.sqrt(0.8) * np.array([[1, 0], [0, 0]], complex),
        np.sqrt(0.3) * np.diag([1.0, -1.0]).astype(complex),
    ]

    plan = build_plan(
        knots, {"amp": amp, "det": det}, evals, max_step=1e-3
    )
    a = mesolve_rk4(
        rho0, plan, diag, PAIRS, d, n, ops, dtype=np.complex128
    )
    b = mesolve_rk4(
        rho0, plan, diag, PAIRS, d, n, ops, dtype=np.complex128,
        ip=True,
    )
    assert np.abs(a - b).max() < 1e-6

    plan_c = build_plan(
        knots, {"amp": amp, "det": det}, evals, max_step=4e-3,
        coarsen=True,
    )
    c = mesolve_rk4(
        rho0, plan_c, diag, PAIRS, d, n, ops, dtype=np.complex128,
        ip=True,
    )
    assert len(plan_c.dts) <= len(plan.dts) // 3
    assert np.abs(a - c).max() < 1e-5
    for rho_t in c:
        assert abs(np.trace(rho_t).real - 1) < 1e-9
        np.testing.assert_allclose(
            rho_t, rho_t.conj().T, atol=1e-12
        )


def test_emulator_mesolve_coarse_engages():
    """Pure-dephasing (no stochastic noise) runs the master equation
    on the coarse IP grid; results match the uncoarsened run."""
    import os

    reg = tpu.Register({"q0": (0.0, 0.0), "q1": (0.0, 9.0)})

    def mk():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(600, 2 * np.pi, -1.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(
        mk(), noise_model=nm, evaluation_times="Minimal"
    )
    rho = np.asarray(sim.run().get_final_state().full())
    assert sim._sticky_steps.get("mesolve_coarse", 0) > 1e-3

    os.environ["PULSER_TPU_COARSE_STEP"] = "0"
    try:
        sim2 = TpuEmulator.from_sequence(
            mk(), noise_model=nm, evaluation_times="Minimal"
        )
        rho_ref = np.asarray(sim2.run().get_final_state().full())
    finally:
        del os.environ["PULSER_TPU_COARSE_STEP"]
    assert "mesolve_coarse" not in sim2._sticky_steps
    np.testing.assert_allclose(rho, rho_ref, atol=5e-6)
    assert abs(np.trace(rho).real - 1) < 1e-6


def test_mesolve_ip_chunked_carry():
    """A long dephasing evolution spans several bounded device calls;
    the IP-frame carry between chunks must hand over correctly."""
    import os

    reg = tpu.Register({"q0": (0.0, 0.0), "q1": (0.0, 9.0)})

    def mk():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(800, 2 * np.pi, -1.0, 0.0), "ryd"
        )
        seq.delay(8000, "ryd")  # long free dephasing stretch
        seq.add(
            tpu.Pulse.ConstantPulse(800, 2 * np.pi, 1.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(dephasing_rate=0.1)
    # several eval times -> several segments -> several device calls
    ev = np.linspace(0.0, 9.6, 13)
    sim = TpuEmulator.from_sequence(
        mk(), noise_model=nm, evaluation_times=ev
    )
    res = sim.run()
    assert sim._sticky_steps.get("mesolve_coarse", 0) > 1e-3
    rhos = [np.asarray(s.full()) for s in res.states]

    os.environ["PULSER_TPU_COARSE_STEP"] = "0"
    try:
        sim2 = TpuEmulator.from_sequence(
            mk(), noise_model=nm, evaluation_times=ev
        )
        rhos_ref = [np.asarray(s.full()) for s in sim2.run().states]
    finally:
        del os.environ["PULSER_TPU_COARSE_STEP"]

    for a, b in zip(rhos, rhos_ref):
        np.testing.assert_allclose(a, b, atol=2e-5)
        assert abs(np.trace(a).real - 1) < 1e-6
