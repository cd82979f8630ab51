"""End-to-end emulator validation against a scipy dense reference.

QuTiP is not installed in this image, so the gold standard is a
high-accuracy ``scipy.integrate.solve_ivp`` run on the dense
``Hamiltonian.get_matrix(t)`` (which is itself validated against manual
construction and, in ``test_hamiltonian_parity``, against the
reference's published matrix-element formulas).
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy.integrate import solve_ivp

import pulser_tpu as tpu
from pulser_tpu.emulator import Qobj, SimConfig, TpuEmulator


def _bell_sequence():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 6)})
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(500, np.pi), 0.0, 0.0
        ),
        "ryd",
    )
    seq.add(tpu.Pulse.ConstantPulse(200, 2.0, -3.0, 0.7), "ryd")
    return seq


def _fidelity(a: np.ndarray, b: np.ndarray) -> float:
    return float(
        abs(np.vdot(a, b)) ** 2
        / (np.linalg.norm(a) ** 2 * np.linalg.norm(b) ** 2)
    )


def test_hamiltonian_matrix_manual():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(seq)
    h250 = sim.get_hamiltonian(250).full()
    assert np.allclose(h250, h250.conj().T)

    import pulser_tpu.sampler as smp

    s = smp.sample(seq).extend_duration(seq.get_duration() + 1)
    cs = s.channel_samples["ryd"]
    amp = cs.amp.as_array()[250]
    u = tpu.DigitalAnalogDevice.interaction_coeff / 6**6
    # basis [r, g]: |rr>=0, |rg>=1, |gr>=2, |gg>=3
    expect = np.zeros((4, 4), complex)
    expect[0, 0] = u
    sgr = np.zeros((2, 2))
    sgr[1, 0] = 1  # |g><r|
    m = 0.5 * amp * (sgr + sgr.T)
    expect += np.kron(m, np.eye(2)) + np.kron(np.eye(2), m)
    np.testing.assert_allclose(h250, expect, atol=1e-10)


def test_sesolve_vs_scipy():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(seq)
    ham = sim._current_hamiltonian

    def rhs(t, y):
        return -1j * (ham.get_matrix(t) @ y)

    psi0 = sim.initial_state.full()[:, 0]
    tgrid = sim.evaluation_times
    ref = solve_ivp(
        rhs,
        (0, tgrid[-1]),
        psi0,
        t_eval=[tgrid[len(tgrid) // 2], tgrid[-1]],
        rtol=1e-10,
        atol=1e-12,
    )
    res = sim.run()
    final = res.get_final_state(ignore_global_phase=False).full()[:, 0]
    assert abs(np.linalg.norm(final) - 1) < 1e-6
    assert abs(_fidelity(ref.y[:, -1], final) - 1) < 1e-8
    mid = res.get_state(
        tgrid[len(tgrid) // 2], ignore_global_phase=False
    ).full()[:, 0]
    assert abs(_fidelity(ref.y[:, 0], mid) - 1) < 1e-8
    # Blockade physics: double excitation suppressed
    assert abs(final[0]) ** 2 < 5e-3


def test_blockade_sampling():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(seq)
    res = sim.run()
    np.random.seed(42)
    counts = res.sample_final_state(2000)
    assert counts["11"] <= 10  # blockaded
    assert set(counts) <= {"00", "01", "10", "11"}


def test_mesolve_dephasing_vs_scipy():
    reg1 = tpu.Register({"q0": (0, 0)})
    seq1 = tpu.Sequence(reg1, tpu.MockDevice)
    seq1.declare_channel("ryd", "rydberg_global")
    seq1.add(
        tpu.Pulse.ConstantPulse(400, 2 * np.pi, 0.0, 0.0), "ryd"
    )
    nm = tpu.NoiseModel(dephasing_rate=0.5)
    sim1 = TpuEmulator.from_sequence(seq1, noise_model=nm)
    res1 = sim1.run()
    rho_f = res1.get_final_state().full()
    assert abs(np.trace(rho_f).real - 1) < 1e-8

    ham1 = sim1._current_hamiltonian
    lop = np.sqrt(2 * 0.5) * np.array([[1, 0], [0, 0]], complex)

    def lrhs(t, y):
        rho = y.reshape(2, 2)
        h = ham1.get_matrix(t)
        d = (
            -1j * (h @ rho - rho @ h)
            + lop @ rho @ lop.conj().T
            - 0.5
            * (
                lop.conj().T @ lop @ rho
                + rho @ lop.conj().T @ lop
            )
        )
        return d.reshape(-1)

    rho0 = np.zeros((2, 2), complex)
    rho0[1, 1] = 1  # |g><g| (g = index 1)
    ref = solve_ivp(
        lrhs,
        (0, sim1.evaluation_times[-1]),
        rho0.reshape(-1),
        t_eval=[sim1.evaluation_times[-1]],
        rtol=1e-10,
        atol=1e-12,
    )
    rho_ref = ref.y[:, -1].reshape(2, 2)
    np.testing.assert_allclose(rho_f, rho_ref, atol=1e-7)


def test_xy_mode_vs_scipy():
    regx = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seqx = tpu.Sequence(regx, tpu.MockDevice)
    seqx.declare_channel("mw", "mw_global")
    seqx.add(tpu.Pulse.ConstantPulse(300, 2.0, 0.0, 0.0), "mw")
    simx = TpuEmulator.from_sequence(seqx)
    hx = simx.get_hamiltonian(150).full()
    u_xy = tpu.MockDevice.interaction_coeff_xy / 8**3
    assert abs(hx[1, 2] - u_xy) < 1e-9

    hamx = simx._current_hamiltonian

    def xrhs(t, y):
        return -1j * (hamx.get_matrix(t) @ y)

    psix0 = simx.initial_state.full()[:, 0]
    tg = simx.evaluation_times
    refx = solve_ivp(
        xrhs,
        (0, tg[-1]),
        psix0,
        t_eval=[tg[-1]],
        rtol=1e-10,
        atol=1e-12,
    )
    resx = simx.run()
    fx = resx.get_final_state(ignore_global_phase=False).full()[:, 0]
    assert abs(_fidelity(refx.y[:, -1], fx) - 1) < 1e-8


def test_digital_local_raman():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(200, np.pi * 5, 0.0, 0.0), "ram")
    sim = TpuEmulator.from_sequence(seq)
    assert sim.basis_name == "digital"
    res = sim.run()
    final = res.get_final_state(ignore_global_phase=False).full()[:, 0]
    # digital basis [g, h]: q0 driven (Omega*T = pi -> |h>), q1 idle
    # |g g> = index 0; after pi pulse on q0 -> |h g> = index 2
    assert abs(abs(final[2]) ** 2 - 1.0) < 1e-4


def test_noisy_run_returns_noisy_results():
    np.random.seed(123)
    seq = _bell_sequence()
    cfg_nm = tpu.NoiseModel(
        p_false_pos=0.01,
        p_false_neg=0.05,
        state_prep_error=0.05,
        temperature=50.0,
        runs=5,
        samples_per_run=3,
    )
    sim = TpuEmulator.from_sequence(
        seq, noise_model=cfg_nm, evaluation_times="Minimal"
    )
    res = sim.run()
    from pulser_tpu.emulator import NoisyResults

    assert isinstance(res, NoisyResults)
    assert res.n_measures == 15
    final_counts = res.results[-1]
    assert abs(sum(final_counts.values()) - 1) < 1e-9


def test_simconfig_roundtrip():
    with pytest.warns(DeprecationWarning):
        cfg = SimConfig(
            noise=("SPAM", "dephasing"), eta=0.1, dephasing_rate=0.2
        )
    nm = cfg.to_noise_model()
    assert "SPAM" in nm.noise_types and "dephasing" in nm.noise_types
    assert nm.state_prep_error == 0.1
    cfg2 = SimConfig.from_noise_model(nm)
    assert cfg2.eta == 0.1


def test_evaluation_times_options():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(
        seq, evaluation_times=[0.0, 0.3, 0.7]
    )
    # 0 and final time are always included
    assert sim.evaluation_times[0] == 0.0
    assert abs(sim.evaluation_times[-1] - 0.7) < 1e-9
    res = sim.run()
    assert len(res.states) == len(sim.evaluation_times)
    norms = [np.linalg.norm(s.full()) for s in res.states]
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)

    sim2 = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
    res2 = sim2.run()
    assert len(res2.states) == len(sim2.evaluation_times)


def test_expect_and_occupation():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(seq)
    res = sim.run()
    n_op = sim.build_operator([("sigma_rr", "global")])
    vals = res.expect([n_op])[0]
    assert len(vals) == len(sim.evaluation_times)
    assert np.all(np.asarray(vals) >= -1e-9)
    assert np.all(np.asarray(vals) <= 2 + 1e-9)


def test_initial_state_custom():
    seq = _bell_sequence()
    sim = TpuEmulator.from_sequence(seq)
    psi = np.zeros(4)
    psi[0] = 1.0  # |rr>
    sim.set_initial_state(psi)
    assert isinstance(sim.initial_state, Qobj)
    res = sim.run()
    # The |rr> state carries the full interaction energy; the RK4 norm
    # drift stays well within the 1e-6 *fidelity* budget
    assert (
        abs(np.linalg.norm(res.get_final_state().full()) - 1) < 1e-4
    )


def test_mcsolve_converges_to_mesolve(mod_device):
    """Quantum-jump MC average must match the master equation."""
    from pulser_tpu.emulator.simulation import Solver

    reg = tpu.Register.square(2, spacing=8.0, prefix="q")

    def make_seq():
        seq = tpu.Sequence(reg, mod_device)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(600, 2 * np.pi, 0.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(dephasing_rate=0.3)
    np.random.seed(0)
    sim_me = TpuEmulator.from_sequence(
        make_seq(), noise_model=nm, solver=Solver.MESOLVER
    )
    rho_me = sim_me.run().get_final_state().full()

    np.random.seed(1)
    sim_mc = TpuEmulator.from_sequence(
        make_seq(),
        noise_model=nm,
        solver=Solver.MCSOLVER,
        n_trajectories=500,
    )
    rho_mc = sim_mc.run().get_final_state().full()

    assert abs(np.trace(rho_mc).real - 1.0) < 1e-8
    # MC sampling error ~ 1/sqrt(500)
    assert np.max(np.abs(rho_mc - rho_me)) < 0.03


def test_interaction_picture_matches_direct_integration(mod_device):
    """The IP solver must agree with the direct RK4 to fp precision."""
    from pulser_tpu.ops.solver import build_plan, sesolve_rk4

    reg = tpu.Register.square(3, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            4 * np.pi,
            tpu.RampWaveform(800, -12 * np.pi, 4 * np.pi),
            0.0,
        ),
        "ryd",
    )
    sim = TpuEmulator.from_sequence(seq)
    ham = sim._current_hamiltonian
    knots = ham.sampling_times
    d, n = ham.dim, ham.n_qudits
    dim = d**n
    plan = build_plan(
        knots,
        {"amp": ham.amp_coeffs, "det": ham.det_coeffs},
        np.array([knots[-1]]),
        max_step=1e-3,
    )
    psi0 = sim.initial_state.full()[:, 0].astype(np.complex128)
    psi_direct = sesolve_rk4(
        psi0, plan, ham.int_diag, ham.pairs, d, n
    )[-1]
    idx = np.arange(dim)
    ip_occ = np.zeros((len(ham.pairs), n, dim), np.float32)
    for b, (_, _, k) in enumerate(ham.pairs):
        for q in range(n):
            ip_occ[b, q] = ((idx // d ** (n - q - 1)) % d) == k
    psi_ip = sesolve_rk4(
        psi0, plan, ham.int_diag, ham.pairs, d, n, ip_occ=ip_occ
    )[-1]
    fid = (
        abs(
            np.vdot(
                psi_direct / np.linalg.norm(psi_direct),
                psi_ip / np.linalg.norm(psi_ip),
            )
        )
        ** 2
    )
    assert 1 - fid < 1e-10
    # And the IP norm must be essentially exact
    assert abs(np.linalg.norm(psi_ip) - 1) < 1e-7


def _scipy_reference_final(sim, rtol=1e-11):
    """f64 scipy reference on the emulator's own Hamiltonian terms."""
    from scipy.integrate import solve_ivp

    ham = sim._current_hamiltonian
    knots = ham.sampling_times
    amp_c, det_c = ham.amp_coeffs, ham.det_coeffs
    diag, pairs = ham.int_diag, ham.pairs
    d, n = ham.dim, ham.n_qudits

    def coeffs_at(t):
        i = np.clip(
            np.searchsorted(knots, t, "right") - 1, 0, len(knots) - 2
        )
        f = np.clip((t - knots[i]) / (knots[i + 1] - knots[i]), 0, 1)
        return (
            amp_c[..., i] * (1 - f) + amp_c[..., i + 1] * f,
            det_c[..., i] * (1 - f) + det_c[..., i + 1] * f,
        )

    def hpsi(t, psi):
        a, de = coeffs_at(t)
        out = diag * psi
        psit = psi.reshape([d] * n)
        for b, (i, j, k) in enumerate(pairs):
            for q in range(n):
                m = np.zeros((d, d), complex)
                m[i, j] = a[b, q]
                m[j, i] = np.conj(a[b, q])
                m[k, k] = -de[b, q]
                out += np.moveaxis(
                    np.tensordot(m, psit, axes=([1], [q])), 0, q
                ).reshape(-1)
        return -1j * out

    psi0 = sim.initial_state.full()[:, 0].astype(complex)
    t_end = sim._eval_times_array[-1]
    sol = solve_ivp(
        hpsi,
        (knots[0], t_end),
        psi0,
        t_eval=[t_end],
        rtol=rtol,
        atol=1e-13,
        method="DOP853",
    )
    return sol.y[:, -1]


def test_all_basis_qutrit_vs_scipy():
    """'all'-basis (qutrit) evolution must match the dense reference."""
    reg = tpu.Register.square(2, spacing=8.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_global")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, 1.0, 0.2), "ryd")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, -1.0, 0.0), "ram")
    sim = TpuEmulator.from_sequence(seq)
    assert sim.basis_name == "all"
    assert sim.dim == 3
    psi = sim.run().get_final_state(
        ignore_global_phase=False
    ).full()[:, 0]
    psi_ref = _scipy_reference_final(sim)
    fid = (
        abs(np.vdot(psi_ref, psi / np.linalg.norm(psi))) ** 2
    )
    assert 1 - fid < 1e-8


def test_leakage_basis_runs_mesolve(mod_device):
    """with_leakage adds an error level and runs the Lindblad path."""
    nm = tpu.NoiseModel(
        with_leakage=True,
        eff_noise_rates=(0.05,),
        eff_noise_opers=(
            np.array([[0, 1j, 0], [0, 0, 0], [0, 0, 0]], complex),
        ),
    )
    reg = tpu.Register.square(2, spacing=8.0, prefix="q")
    seq = tpu.Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq, noise_model=nm)
    assert sim.basis_name == "ground-rydberg_with_error"
    assert sim.dim == 3
    rho = sim.run().get_final_state().full()
    assert abs(np.trace(rho).real - 1) < 1e-9
    assert np.max(np.abs(rho - rho.conj().T)) < 1e-12


def test_native_plan_builder_matches_python(mod_device):
    """The C++ plan compiler must agree exactly with the fallback."""
    from pulser_tpu import native
    from pulser_tpu.ops.solver import build_plan

    reg = tpu.Register.square(2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantPulse(777, np.pi, 1.0, 0.0), "ryd"
    )
    sim = TpuEmulator.from_sequence(seq)
    ham = sim._current_hamiltonian
    coeffs = {"amp": ham.amp_coeffs, "det": ham.det_coeffs}
    eval_times = np.linspace(0, ham.sampling_times[-1], 37)
    if native._load() is None:
        pytest.skip("no native toolchain available")
    p_nat = build_plan(
        ham.sampling_times, coeffs, eval_times, max_step=0.4e-3
    )
    saved = native._load_failed, native._lib
    try:
        native._load_failed, native._lib = True, None
        p_py = build_plan(
            ham.sampling_times, coeffs, eval_times, max_step=0.4e-3
        )
    finally:
        native._load_failed, native._lib = saved
    np.testing.assert_array_equal(p_nat.grid, p_py.grid)
    np.testing.assert_array_equal(p_nat.store_idx, p_py.store_idx)
    np.testing.assert_array_equal(p_nat.eval_map, p_py.eval_map)
    np.testing.assert_array_equal(p_nat.dts, p_py.dts)


def test_batched_trajectories_match_serial(mod_device):
    """The vmapped trajectory batch must equal the serial loop."""
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")

    def mk():
        seq = tpu.Sequence(reg, mod_device)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(400, 2 * np.pi, 1.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(
        amp_sigma=0.05, laser_waist=100.0, runs=10, samples_per_run=1
    )
    obs = np.diag([1, 0] * 8).astype(complex)
    np.random.seed(7)
    sim_b = TpuEmulator.from_sequence(mk(), noise_model=nm)
    assert sim_b._can_batch_trajectories()
    eb = np.asarray(sim_b.run().expect([obs])[0], float)
    np.random.seed(7)
    sim_s = TpuEmulator.from_sequence(mk(), noise_model=nm)
    sim_s._can_batch_trajectories = lambda: False
    es = np.asarray(sim_s.run().expect([obs])[0], float)
    np.testing.assert_allclose(eb, es, atol=1e-9)


def test_eom_sequence_emulation(mod_device):
    """An EOM-mode sequence emulates and conserves the norm."""
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=7.0, prefix="q"), mod_device
    )
    ch = next(
        name
        for name, ch in mod_device.channels.items()
        if ch.eom_config is not None and ch.addressing == "Global"
    )
    seq.declare_channel("ryd", ch)
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
    seq.add_eom_pulse("ryd", duration=200, phase=0.0)
    seq.delay(100, "ryd")
    seq.add_eom_pulse("ryd", duration=100, phase=0.5)
    seq.disable_eom_mode("ryd")
    sim = TpuEmulator.from_sequence(seq)
    psi = sim.run().get_final_state(
        ignore_global_phase=False
    ).full()[:, 0]
    psi_ref = _scipy_reference_final(sim)
    fid = abs(np.vdot(psi_ref, psi / np.linalg.norm(psi))) ** 2
    assert 1 - fid < 1e-7


def test_slm_mask_xy_interaction_ramp(mod_device):
    """XY SLM masking exercises the int_w interpolation path."""
    reg = tpu.Register(
        {"q0": (0.0, 0.0), "q1": (8.0, 0.0), "q2": (0.0, 8.0)}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("mw", "mw_global")
    seq.config_slm_mask(["q0"])
    seq.add(tpu.Pulse.ConstantPulse(300, 2.0, 0.0, 0.0), "mw")
    seq.add(tpu.Pulse.ConstantPulse(300, 1.0, 1.0, 0.0), "mw")
    sim = TpuEmulator.from_sequence(seq)
    assert sim._current_hamiltonian.int_w is not None
    psi = sim.run().get_final_state().full()[:, 0]
    assert abs(np.linalg.norm(psi) - 1) < 1e-4


def test_slm_mask_ising_uses_dmm(mod_device):
    """Ising SLM masking goes through the auto-added DMM detuning."""
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.config_slm_mask(["q0"])
    seq.add(tpu.Pulse.ConstantPulse(300, 2 * np.pi, 0.0, 0.0), "ryd")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, 1.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    assert sim._current_hamiltonian.int_w is None
    rho_or_psi = sim.run().get_final_state().full()
    assert abs(np.linalg.norm(rho_or_psi) - 1) < 1e-4


def test_xy_with_magnetic_field(mod_device):
    """XY-mode emulation under a tilted magnetic field runs exactly."""
    reg = tpu.Register(
        {"a": (0.0, 0.0), "b": (8.0, 0.0), "c": (0.0, 8.0)}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.set_magnetic_field(10.0, 5.0, 20.0)
    seq.declare_channel("mw", "mw_global")
    seq.add(tpu.Pulse.ConstantPulse(400, 2.0, 1.0, 0.0), "mw")
    sim = TpuEmulator.from_sequence(seq)
    assert sim.basis_name == "XY"
    psi = sim.run().get_final_state().full()[:, 0]
    assert abs(np.linalg.norm(psi) - 1) < 1e-5


def test_pallas_kernel_matches_xla_path():
    """The fused Pallas sesolve (interpret) equals the XLA IP path."""
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
        max_step=1e-3,
    )
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


def test_mcsolve_exponential_decay_and_determinism():
    """Quantum jumps reproduce T1 decay; fixed seeds are reproducible.

    A single undriven atom prepared in |r> under pure relaxation decays
    as exp(-Gamma t); the MC jump statistics must reproduce it, and the
    same numpy seed must give bit-identical trajectories.
    """
    from pulser_tpu.emulator.simulation import Solver

    gamma = 1.2  # 1/us
    reg = tpu.Register({"q0": (0.0, 0.0)})

    def run(seed, ntraj=400):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        # A fast pi pulse (20 ns), then free decay for 2 us
        seq.add(
            tpu.Pulse.ConstantPulse(20, np.pi / 0.020, 0.0, 0.0), "ryd"
        )
        seq.delay(2000, "ryd")
        np.random.seed(seed)
        sim = TpuEmulator.from_sequence(
            seq,
            noise_model=tpu.NoiseModel(relaxation_rate=gamma),
            solver=Solver.MCSOLVER,
            n_trajectories=ntraj,
        )
        return sim.run().get_final_state().full()

    rho = run(7)
    # Population left in |r> after ~2us of free decay (index 0 = r)
    expected = np.exp(-gamma * 2.0)
    assert abs(np.trace(rho).real - 1.0) < 1e-8
    # 400 trajectories: sampling error ~ sqrt(p(1-p)/400) ~ 0.02
    assert rho[0, 0].real == pytest.approx(expected, abs=0.06)

    # Determinism: the same seed gives the same density matrix
    np.testing.assert_array_equal(run(11, ntraj=50), run(11, ntraj=50))


def test_stochastic_noise_with_dephasing_uses_lindblad_path():
    """Regression: dephasing + shot-to-shot noise must NOT take the
    pure-state batched path (which would silently drop the dissipator).
    """
    seq = _bell_sequence()
    nm = tpu.NoiseModel(
        amp_sigma=0.02, dephasing_rate=10.0, runs=3, samples_per_run=4
    )
    np.random.seed(3)
    sim = TpuEmulator.from_sequence(
        seq, noise_model=nm, evaluation_times="Minimal"
    )
    assert not sim._can_batch_trajectories()

    # Strong dephasing must visibly change the outcome distribution
    nm_off = tpu.NoiseModel(
        amp_sigma=0.02, runs=3, samples_per_run=4
    )
    np.random.seed(3)
    sim_off = TpuEmulator.from_sequence(
        seq, noise_model=nm_off, evaluation_times="Minimal"
    )
    res_on = sim.run().results[-1]
    res_off = sim_off.run().results[-1]
    dist = sum(
        abs(res_on.get(k, 0) - res_off.get(k, 0))
        for k in set(res_on) | set(res_off)
    )
    assert dist > 0.2


def test_batched_lindblad_paths_match_serial():
    """Batched dissipative trajectories == the serial per-trajectory
    solves (both the MCWF and the master-equation variants)."""
    from pulser_tpu.emulator.simulation import Solver, TpuEmulator

    reg = tpu.Register({"q0": (0, 0), "q1": (0, 9)})

    def build():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(400, 2 * np.pi, -1.0, 0.0), "ryd"
        )
        return seq

    nm = tpu.NoiseModel(
        amp_sigma=0.05, dephasing_rate=0.2, runs=3, samples_per_run=2
    )

    for solver in (Solver.DEFAULT, Solver.MESOLVER):
        np.random.seed(11)
        sim = TpuEmulator.from_sequence(
            build(), noise_model=nm, solver=solver
        )
        assert sim._can_batch_lindblad()
        batched = [
            (res.states, reps)
            for res, reps in sim._noisy_runs(progress_bar=False)
        ]

        np.random.seed(11)
        sim2 = TpuEmulator.from_sequence(
            build(), noise_model=nm, solver=solver
        )
        sim2._can_batch_lindblad = lambda: False  # force serial
        serial = [
            (res.states, reps)
            for res, reps in sim2._noisy_runs(progress_bar=False)
        ]

        assert len(batched) == len(serial) > 0
        for (st_b, reps_b), (st_s, reps_s) in zip(batched, serial):
            assert reps_b == reps_s
            for qb, qs in zip(st_b, st_s):
                a, b = qb.full(), qs.full()
                if a.shape != b.shape:
                    # ket vs density-matrix representation
                    a = a @ a.conj().T if a.shape[1] == 1 else a
                    b = b @ b.conj().T if b.shape[1] == 1 else b
                np.testing.assert_allclose(
                    a, b, atol=5e-6, err_msg=str(solver)
                )


def test_sticky_step_pins_grid_shape_across_runs():
    """Trajectory refreshes must not grow the integration step back,
    so repeated run() calls reuse one compiled solver shape."""
    from pulser_tpu.emulator.simulation import TpuEmulator

    reg = tpu.Register({"q0": (0, 0), "q1": (0, 9)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(400, 2 * np.pi, -1.0, 0.0), "ryd")
    nm = tpu.NoiseModel(
        amp_sigma=0.05, dephasing_rate=0.2, runs=2, samples_per_run=1
    )
    np.random.seed(3)
    sim = TpuEmulator.from_sequence(seq, noise_model=nm)
    sim.run()
    steps_first = dict(sim._sticky_steps)
    for _ in range(3):
        sim.run()
    for key, step in sim._sticky_steps.items():
        assert step <= steps_first[key]
    # The helper itself: never grows, halves when the cap tightens
    assert sim._sticky_quantized_step("t", 1e-3, 1e-3) == 1e-3
    assert sim._sticky_quantized_step("t", 1e-3, 2e-3) == 1e-3
    assert sim._sticky_quantized_step("t", 1e-3, 0.4e-3) == 0.25e-3
    assert sim._sticky_quantized_step("t", 1e-3, 2e-3) == 0.25e-3


def test_profiling_phases_recorded():
    """Phase timings accumulate around emulator solves and annotate
    traces; the report exposes totals and call counts."""
    from pulser_tpu import profiling

    profiling.reset_phases()
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "ryd")
    from pulser_tpu.emulator.simulation import TpuEmulator

    TpuEmulator.from_sequence(seq).run()
    report = profiling.phase_report()
    assert report["emulator.build_plan"]["calls"] >= 1
    assert report["emulator.sesolve"]["total_s"] > 0
    profiling.reset_phases()
    assert profiling.phase_report() == {}


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache configures jax's persistent cache;
    the env hook honors PULSER_TPU_COMPILATION_CACHE."""
    import jax

    from pulser_tpu import caching

    before = jax.config.jax_compilation_cache_dir
    try:
        path = tpu.enable_compilation_cache(str(tmp_path / "c1"))
        assert jax.config.jax_compilation_cache_dir == path
        import os

        assert os.path.isdir(path)
        monkeypatch.setenv(
            "PULSER_TPU_COMPILATION_CACHE", str(tmp_path / "c2")
        )
        caching._maybe_enable_from_env()
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / "c2"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_mcwf_pallas_kernel_matches_xla(monkeypatch):
    """The fused Pallas MCWF kernel (interpreter mode) reproduces the
    XLA scan solver on a dissipative noisy batch, jumps included."""
    from pulser_tpu.emulator.simulation import TpuEmulator
    from pulser_tpu.ops import solver as S

    np.random.seed(4)
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 9)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantPulse(300, 2 * np.pi, -1.0, 0.3), "ryd"
    )
    nm = tpu.NoiseModel(
        amp_sigma=0.05, dephasing_rate=2.0, runs=6, samples_per_run=1
    )
    sim = TpuEmulator.from_sequence(seq, noise_model=nm)
    hams = list(sim._hamiltonians)
    first = hams[0].hamiltonian
    plans = S.build_plan_batched(
        first.sampling_times,
        {
            "amp": np.stack(
                [h.hamiltonian.amp_coeffs for h in hams]
            ),
            "det": np.stack(
                [h.hamiltonian.det_coeffs for h in hams]
            ),
        },
        sim._eval_times_array,
        max_step=0.0005,
        host_stage=False,
    )
    diags = np.stack([h.hamiltonian.int_diag for h in hams])
    psi0 = sim.initial_state.full()[:, 0].astype(np.complex64)
    seeds = list(range(7, 13))
    args = (
        psi0,
        plans,
        diags,
        first.pairs,
        2,
        2,
        first._local_collapse_mats,
        seeds,
    )

    monkeypatch.setenv("PULSER_TPU_DISABLE_PALLAS", "1")
    xla = S.mcsolve_rk4_batched(*args, dtype=np.complex64)
    monkeypatch.delenv("PULSER_TPU_DISABLE_PALLAS")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    pal = S.mcsolve_rk4_batched(*args, dtype=np.complex64)
    np.testing.assert_allclose(pal, xla, atol=2e-4)


def test_sesolve_batched_pallas_matches_xla(monkeypatch):
    """The fused batched-sesolve kernel == the vmapped XLA batch.

    Runs the Pallas program in interpret mode on CPU (the opt-in TPU
    path, PULSER_TPU_SESOLVE_PALLAS_BATCHED, shares this code).
    """
    import pulser_tpu.ops.solver as S

    n = 10
    n_traj = 3
    rng = np.random.default_rng(12)
    knots = np.linspace(0.0, 0.1, 6)
    eval_times = np.array([0.0, 0.1])
    amp_b = rng.uniform(1, 5, size=(n_traj, 1, n, 6)) * np.exp(
        1j * rng.uniform(0, 2 * np.pi, size=(n_traj, 1, n, 1))
    )
    det_b = rng.normal(0, 2, size=(n_traj, 1, n, 6))
    plans = S.build_plan_batched(
        knots,
        {"amp": amp_b, "det": det_b},
        eval_times,
        max_step=2e-3,
    )
    diags = rng.uniform(0, 20, size=(n_traj, 2**n))
    psi0 = np.zeros(2**n, complex)
    psi0[-1] = 1.0
    pairs = ((1, 0, 0),)

    xla = S.sesolve_rk4_batched(
        psi0, plans, diags, pairs, 2, n, True, dtype=np.complex64
    )
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    pal = S.sesolve_rk4_batched(
        psi0, plans, diags, pairs, 2, n, True, dtype=np.complex64
    )
    assert pal.shape == xla.shape == (n_traj, 2, 2**n)
    np.testing.assert_allclose(pal, xla, atol=2e-5)
    np.testing.assert_allclose(
        np.linalg.norm(pal[:, -1], axis=-1), 1.0, atol=1e-5
    )


def test_device_input_cache_and_initial_state_invalidation():
    """Repeated coherent runs reuse device-resident psi0/diag (the
    warm-solve transfer fix for 24+ atoms); changing the initial
    state invalidates the cached psi0 and changes the result."""
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, 2 * np.pi, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    a = np.asarray(sim.run().get_final_state().full())
    b = np.asarray(sim.run().get_final_state().full())
    np.testing.assert_allclose(a, b, atol=1e-12)
    plan = sim._plan_cache[1]
    roles = {
        k[0] for k in plan.runtime_cache if isinstance(k, tuple)
    }
    assert "dev_psi0" in roles and "dev_diag" in roles

    # New initial state: |rr> instead of |gg> -> different result
    psi_rr = np.zeros(4, complex)
    psi_rr[0] = 1.0
    sim.set_initial_state(psi_rr)
    c = np.asarray(sim.run().get_final_state().full())
    assert np.max(np.abs(c - a)) > 0.1
    # And deterministic under the new cache entry
    d = np.asarray(sim.run().get_final_state().full())
    np.testing.assert_allclose(c, d, atol=1e-12)
    # Exactly one psi0 entry is retained (stale tokens evicted)
    psi_keys = [
        k
        for k in plan.runtime_cache
        if isinstance(k, tuple) and k[0] == "dev_psi0"
    ]
    assert len(psi_keys) == 1
