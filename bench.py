"""Headline benchmarks (BASELINE.md rows 1 and 2).

1. 16-atom AFM adiabatic sweep ``sesolve`` wall-clock (median of 3).
2. 10-atom noisy Lindblad Monte-Carlo run: trajectories/sec over 100
   noise trajectories (SPAM + doppler + amplitude + dephasing).

Both are compared against a CPU reference integrator (scipy DOP853
over the same structured operators — a stand-in for the reference's
QuTiP/CPU solve, which is not installed in this image) at QuTiP's
default tolerances (rtol=1e-6, atol=1e-8).

Prints exactly one JSON line on stdout carrying the flagship metric,
with the second metric under ``extra_metrics``:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N,
     "extra_metrics": [{"metric": ..., ...}]}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np


def log(*args):  # noqa: D103
    print(*args, file=sys.stderr, flush=True)


def build_afm_sequence():
    """4x4 AFM adiabatic sweep (BASELINE.json config #2)."""
    import pulser_tpu as tpu

    spacing = 6.0
    reg = tpu.Register.square(4, spacing=spacing, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    omega_max = 2.0 * 2 * np.pi
    delta_0 = -6 * 2 * np.pi
    delta_f = 2 * 2 * np.pi
    t_rise, t_sweep, t_fall = 252, 2700, 252
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(t_rise, 0.0, omega_max), delta_0, 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            omega_max,
            tpu.RampWaveform(t_sweep, delta_0, delta_f),
            0.0,
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(t_fall, omega_max, 0.0), delta_f, 0.0
        ),
        "ryd",
    )
    return seq


def build_noisy_10atom():
    """10-atom noisy Lindblad config (BASELINE.json config #5).

    SPAM + doppler + amplitude (waist & shot-to-shot) + dephasing,
    100 Monte-Carlo noise realizations.
    """
    import pulser_tpu as tpu

    reg = tpu.Register.rectangle(2, 5, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = 2 * np.pi * 1.5
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(400, 0.0, om), -2 * np.pi * 4, 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            om, tpu.RampWaveform(1200, -2 * np.pi * 4, 2 * np.pi * 2), 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(400, om, 0.0), 2 * np.pi * 2, 0.0
        ),
        "ryd",
    )
    noise = tpu.NoiseModel(
        state_prep_error=0.005,
        p_false_pos=0.01,
        p_false_neg=0.02,
        temperature=50.0,
        amp_sigma=0.02,
        laser_waist=175.0,
        dephasing_rate=0.05,
        runs=100,
        samples_per_run=10,
    )
    return seq, noise


def _structured_hpsi(ham):
    """Pure-numpy structured H(t) application closures for ``ham``."""
    d = ham.dim
    n = ham.n_qudits
    diag = ham.int_diag
    pairs = ham.pairs
    knots = ham.sampling_times
    amp_c = ham.amp_coeffs
    det_c = ham.det_coeffs

    def coeffs_at(t):
        idx = np.clip(
            np.searchsorted(knots, t, side="right") - 1,
            0,
            len(knots) - 2,
        )
        t0, t1 = knots[idx], knots[idx + 1]
        frac = np.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return (
            amp_c[..., idx] * (1 - frac) + amp_c[..., idx + 1] * frac,
            det_c[..., idx] * (1 - frac) + det_c[..., idx + 1] * frac,
        )

    def h_apply(t, mat):
        """H(t) @ mat for mat of shape (dim, ...) along the row axis."""
        amp, det = coeffs_at(t)
        out = diag.reshape((-1,) + (1,) * (mat.ndim - 1)) * mat
        resh = [d] * n + list(mat.shape[1:])
        matt = mat.reshape(resh)
        for bi, (i, j, k) in enumerate(pairs):
            for q in range(n):
                m = np.zeros((d, d), complex)
                m[i, j] = amp[bi, q]
                m[j, i] = np.conj(amp[bi, q])
                m[k, k] = -det[bi, q]
                out += np.moveaxis(
                    np.tensordot(m, matt, axes=([1], [q])), 0, q
                ).reshape(mat.shape)
        return out

    return h_apply


def cpu_sesolve_seconds(ham, eval_times, psi0) -> float:
    """CPU reference sesolve: scipy DOP853 over the structured matvec."""
    from scipy.integrate import solve_ivp

    h_apply = _structured_hpsi(ham)

    def rhs(t, psi):
        return -1j * h_apply(t, psi)

    t0 = time.perf_counter()
    solve_ivp(
        rhs,
        (0.0, eval_times[-1]),
        psi0,
        t_eval=eval_times,
        rtol=1e-6,
        atol=1e-8,
        method="DOP853",
    )
    return time.perf_counter() - t0


def cpu_mesolve_traj_seconds(sim) -> float:
    """CPU reference: one noisy Lindblad trajectory with scipy DOP853.

    Mirrors QuTiP's approach for the master equation
    drho = -i[H, rho] + sum_k L rho L+ - (1/2){L+L, rho}: the
    Hamiltonian is a sparse (CSR) operator sum H0 + sum_k c_k(t) H_k
    with linearly interpolated coefficients, and the (diagonal)
    dephasing dissipator is a precomputed elementwise mask.
    """
    import scipy.sparse as sp
    from scipy.integrate import solve_ivp

    ham_wr = next(iter(sim._hamiltonians))
    ham = ham_wr.hamiltonian
    d = ham.dim
    n = ham.n_qudits
    dim = d**n
    knots = ham.sampling_times
    amp_c = ham.amp_coeffs
    det_c = ham.det_coeffs

    # Static part: the interaction diagonal
    h_static = sp.diags(ham.int_diag.astype(complex), format="csr")

    def embed(local: np.ndarray, q: int) -> sp.csr_matrix:
        mats = [sp.identity(d, format="csr")] * n
        mats[q] = sp.csr_matrix(local)
        out = mats[0]
        for m in mats[1:]:
            out = sp.kron(out, m, format="csr")
        return out

    # Drive terms: per (pair, qubit), |i><j|, |j><i| and -|k><k|
    # operators with time-dependent coefficients
    terms = []
    for bi, (i, j, k) in enumerate(ham.pairs):
        for q in range(n):
            sig_ij = np.zeros((d, d), complex)
            sig_ij[i, j] = 1.0
            proj_kk = np.zeros((d, d), complex)
            proj_kk[k, k] = 1.0
            terms.append((embed(sig_ij, q), amp_c[bi, q]))
            terms.append(
                (embed(sig_ij.conj().T, q), np.conj(amp_c[bi, q]))
            )
            terms.append((embed(proj_kk, q), -det_c[bi, q]))

    # Dissipator mask from the (diagonal) collapse operators
    mask = np.zeros((dim, dim), complex)
    for c_op in ham._collapse_ops:
        c = np.asarray(c_op.full())
        ldiag = np.diag(c)
        if not np.allclose(c, np.diag(ldiag)):
            raise NotImplementedError("non-diagonal collapse op")
        l2 = np.abs(ldiag) ** 2
        mask += np.outer(ldiag, np.conj(ldiag)) - 0.5 * (
            l2[:, None] + l2[None, :]
        )

    def coeff_at(c, t):
        idx = np.clip(
            np.searchsorted(knots, t, side="right") - 1,
            0,
            len(knots) - 2,
        )
        t0, t1 = knots[idx], knots[idx + 1]
        frac = np.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return c[idx] * (1 - frac) + c[idx + 1] * frac

    psi0 = sim.initial_state.full()[:, 0]
    rho0 = np.outer(psi0, np.conj(psi0))
    tf = float(sim.evaluation_times[-1]) * sim._tot_duration * 1e-3

    def rhs(t, y):
        rho = y.reshape(dim, dim)
        h_t = h_static.copy()
        for op, c in terms:
            val = coeff_at(c, t)
            if val != 0:
                h_t = h_t + val * op
        h_rho = h_t @ rho
        # rho @ H = (H @ rho^dagger)^dagger for Hermitian H
        drho = -1j * (h_rho - (h_t @ rho.conj().T).conj().T)
        drho += mask * rho
        return drho.reshape(-1)

    t0 = time.perf_counter()
    solve_ivp(
        rhs,
        (0.0, tf),
        rho0.reshape(-1),
        t_eval=[tf],
        rtol=1e-6,
        atol=1e-8,
        method="DOP853",
    )
    return time.perf_counter() - t0


def _load_cache(path, key):
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        if key in data:
            return data, data[key]
    return {}, None


def bench_afm16(TpuEmulator, cache_path):
    seq = build_afm_sequence()
    eval_times = np.linspace(0, seq.get_duration() * 1e-3, 101)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=eval_times)
    log(
        f"AFM sweep: {len(seq.register.qubit_ids)} atoms, "
        f"{seq.get_duration()} ns, dim {sim.dim**16}"
    )

    t0 = time.perf_counter()
    res = sim.run()
    warm = time.perf_counter() - t0
    log(f"warmup (incl. compile): {warm:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = sim.run()
        times.append(time.perf_counter() - t0)
    tpu_time = statistics.median(times)
    log(f"solve times: {[f'{t:.3f}' for t in times]} (median reported)")

    final = res.get_final_state(ignore_global_phase=False).full()[:, 0]
    norm = float(np.linalg.norm(final))
    log(f"final-state norm: {norm:.8f}")
    assert abs(norm - 1) < 1e-3, "solver produced an unnormalized state"

    cache, cpu_time = _load_cache(cache_path, "afm16_v1")
    if cpu_time is not None:
        log(f"using cached CPU reference: {cpu_time:.2f}s")
    else:
        log("running CPU reference (scipy DOP853)...")
        ham = sim._current_hamiltonian
        psi0 = sim.initial_state.full()[:, 0]
        cpu_time = cpu_sesolve_seconds(ham, eval_times, psi0)
        log(f"CPU reference: {cpu_time:.2f}s")
        cache["afm16_v1"] = cpu_time
        with open(cache_path, "w") as f:
            json.dump(cache, f)

    return {
        "metric": "16-atom AFM sweep sesolve wall-clock",
        "value": round(tpu_time, 4),
        "unit": "s",
        "vs_baseline": round(cpu_time / tpu_time, 2),
    }


def bench_noisy10(TpuEmulator, cache_path):
    seq, noise = build_noisy_10atom()
    np.random.seed(1234)
    sim = TpuEmulator.from_sequence(
        seq, noise_model=noise, evaluation_times="Minimal"
    )
    n_traj = noise.runs
    log(f"noisy Lindblad: 10 atoms, {n_traj} trajectories")

    t0 = time.perf_counter()
    sim.run()
    warm = time.perf_counter() - t0
    log(f"noisy warmup (incl. compile): {warm:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = sim.run()
        times.append(time.perf_counter() - t0)
    tpu_time = statistics.median(times)
    traj_per_sec = n_traj / tpu_time
    log(
        f"noisy solve times: {[f'{t:.3f}' for t in times]}"
        f" (median) -> {traj_per_sec:.2f} traj/s"
    )
    assert abs(sum(res.results[-1].values()) - 1) < 1e-9

    cache, cpu_traj = _load_cache(cache_path, "noisy10_v1")
    if cpu_traj is not None:
        log(f"using cached CPU reference: {cpu_traj:.2f}s/traj")
    else:
        log("running CPU reference (1 Lindblad trajectory, DOP853)...")
        cpu_traj = cpu_mesolve_traj_seconds(sim)
        log(f"CPU reference: {cpu_traj:.2f}s per trajectory")
        cache["noisy10_v1"] = cpu_traj
        with open(cache_path, "w") as f:
            json.dump(cache, f)

    cpu_traj_per_sec = 1.0 / cpu_traj
    return {
        "metric": "10-atom noisy mesolve trajectories/sec",
        "value": round(traj_per_sec, 2),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_sec / cpu_traj_per_sec, 2),
    }


def main() -> None:
    # The axon plugin overrides JAX_PLATFORMS; run on whatever the
    # driver provides (TPU when available).
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Persistent XLA compilation cache: cold compiles of the big scans
    # are minutes; cached compiles load in seconds on subsequent runs.
    from pulser_tpu.caching import enable_compilation_cache

    enable_compilation_cache("/root/.cache/jax_pulser_tpu")
    from pulser_tpu.emulator import TpuEmulator

    log(f"devices: {jax.devices()}")
    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cpu_baseline.json",
    )

    afm = bench_afm16(TpuEmulator, cache_path)
    noisy = bench_noisy10(TpuEmulator, cache_path)

    out = dict(afm)
    out["extra_metrics"] = [noisy]
    print(json.dumps(out))


if __name__ == "__main__":
    main()


# Backwards-compatible alias used by older scripts/tests.
cpu_reference_seconds = cpu_sesolve_seconds
