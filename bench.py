"""Headline benchmark: 16-atom AFM adiabatic sweep sesolve wall-clock.

Runs the BASELINE.json flagship config (4x4 Rydberg array, adiabatic
amplitude ramp + detuning sweep) through the TPU-native emulator and
compares against a CPU reference integrator (scipy DOP853 over the same
structured matvec — a stand-in for the reference's QuTiP/zvode CPU
solve, which is not installed in this image).

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
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


def cpu_reference_seconds(ham, eval_times, psi0) -> float:
    """CPU reference: scipy DOP853 over the structured matvec.

    Stands in for QuTiP's sesolve (scipy ODE + sparse matvec on CPU)
    with comparable default tolerances (rtol=1e-6, atol=1e-8).
    """
    from scipy.integrate import solve_ivp

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

    def hpsi_np(t, psi):
        amp, det = coeffs_at(t)
        out = diag * psi
        resh_shape = [d] * n
        psit = psi.reshape(resh_shape)
        for bi, (i, j, k) in enumerate(pairs):
            for q in range(n):
                m = np.zeros((d, d), complex)
                m[i, j] = amp[bi, q]
                m[j, i] = np.conj(amp[bi, q])
                m[k, k] = -det[bi, q]
                out += np.moveaxis(
                    np.tensordot(m, psit, axes=([1], [q])), 0, q
                ).reshape(-1)
        return -1j * out

    t0 = time.perf_counter()
    solve_ivp(
        hpsi_np,
        (0.0, eval_times[-1]),
        psi0,
        t_eval=eval_times,
        rtol=1e-6,
        atol=1e-8,
        method="DOP853",
    )
    return time.perf_counter() - t0


def main() -> None:
    # The axon plugin overrides JAX_PLATFORMS; run on whatever the
    # driver provides (TPU when available).
    import jax

    # Persistent XLA compilation cache: the 16-atom scan takes ~3.5 min
    # to compile; cached compiles load in seconds on subsequent runs.
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_pulser_tpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pulser_tpu.emulator import TpuEmulator

    log(f"devices: {jax.devices()}")

    seq = build_afm_sequence()
    eval_times = np.linspace(0, seq.get_duration() * 1e-3, 101)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=eval_times)
    log(
        f"AFM sweep: {len(seq.register.qubit_ids)} atoms, "
        f"{seq.get_duration()} ns, dim {sim.dim**16}"
    )

    # Warmup (compile)
    t0 = time.perf_counter()
    res = sim.run()
    warm = time.perf_counter() - t0
    log(f"warmup (incl. compile): {warm:.2f}s")

    # Steady-state timing
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = sim.run()
        times.append(time.perf_counter() - t0)
    tpu_time = min(times)
    log(f"solve times: {[f'{t:.3f}' for t in times]}")

    final = res.get_final_state(ignore_global_phase=False).full()[:, 0]
    norm = float(np.linalg.norm(final))
    log(f"final-state norm: {norm:.8f}")
    assert abs(norm - 1) < 1e-3, "solver produced an unnormalized state"

    # CPU reference (cached: it takes minutes and doesn't change)
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cpu_baseline.json",
    )
    cpu_time = None
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("config") == "afm16_v1":
            cpu_time = data["seconds"]
            log(f"using cached CPU reference: {cpu_time:.2f}s")
    if cpu_time is None:
        log("running CPU reference (scipy DOP853)...")
        ham = sim._current_hamiltonian
        psi0 = sim.initial_state.full()[:, 0]
        cpu_time = cpu_reference_seconds(ham, eval_times, psi0)
        log(f"CPU reference: {cpu_time:.2f}s")
        with open(cache, "w") as f:
            json.dump(
                {"config": "afm16_v1", "seconds": cpu_time}, f
            )

    print(
        json.dumps(
            {
                "metric": "16-atom AFM sweep sesolve wall-clock",
                "value": round(tpu_time, 4),
                "unit": "s",
                "vs_baseline": round(cpu_time / tpu_time, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
