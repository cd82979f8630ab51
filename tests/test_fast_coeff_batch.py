"""Vectorized noisy coefficient batches == the generic per-trajectory
Hamiltonian path (exact trajectory-for-trajectory parity).

The fast path (TpuEmulator._fast_coeff_batch) broadcasts noise
scalars over the noiseless coefficient arrays instead of building a
virtual-channel SequenceSamples + Hamiltonian per trajectory; the
RNG draws live in the trajectories, so both paths must agree to
floating-point exactness on every solver input.
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator


def _afm_seq(local=False, leakage_ch=False):
    reg = tpu.Register.rectangle(2, 2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = 2 * np.pi * 1.4
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(300, 0.0, om), -2 * np.pi * 2, 0.3
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            om, tpu.RampWaveform(700, -2 * np.pi * 2, 2 * np.pi), 0.0
        ),
        "ryd",
    )
    if local:
        seq.declare_channel(
            "ram", "raman_local", initial_target="q0"
        )
        seq.add(
            tpu.Pulse.ConstantPulse(200, np.pi, -0.5, 0.1),
            "ram",
            protocol="no-delay",
        )
        seq.target("q3", "ram")
        seq.add(
            tpu.Pulse.ConstantPulse(160, np.pi / 2, 0.5, 0.0),
            "ram",
        )
    return seq


NOISES = {
    "amp+waist": dict(amp_sigma=0.05, laser_waist=120.0),
    "doppler": dict(temperature=80.0),
    "spam": dict(
        state_prep_error=0.4,
        p_false_pos=0.05,
        p_false_neg=0.02,
    ),
    "all+dephasing": dict(
        amp_sigma=0.03,
        laser_waist=150.0,
        temperature=60.0,
        state_prep_error=0.2,
        dephasing_rate=0.03,
    ),
}


def _batches(seq, noise, n_traj=6):
    """(fast, generic) coefficient batches on identical RNG draws."""
    out = []
    for disable in (False, True):
        np.random.seed(777)
        sim = TpuEmulator.from_sequence(
            seq,
            noise_model=noise,
            evaluation_times="Minimal",
            n_trajectories=n_traj,
        )
        trajs = list(
            sim._hamiltonian_data.noise_trajectories
        )
        if disable:
            batch = None
        else:
            batch = sim._fast_coeff_batch(trajs)
        if batch is None:
            hams = list(sim._hamiltonians)
            from pulser_tpu.emulator.simulation import _CoeffBatch

            batch = _CoeffBatch(
                amp=np.stack(
                    [h.hamiltonian.amp_coeffs for h in hams]
                ),
                det=np.stack(
                    [h.hamiltonian.det_coeffs for h in hams]
                ),
                diags=np.stack(
                    [h.hamiltonian.int_diag for h in hams]
                ),
                reps=[h.reps for h in hams],
                template=hams[0].hamiltonian,
                shims=[h.hamiltonian for h in hams],
                last_ham=lambda: hams[-1].hamiltonian,
            )
        out.append(batch)
    return out


@pytest.mark.parametrize("name", sorted(NOISES))
@pytest.mark.parametrize("local", [False, True])
def test_fast_batch_matches_generic(name, local):
    noise = tpu.NoiseModel(
        runs=6, samples_per_run=1, **NOISES[name]
    )
    seq = _afm_seq(local=local)
    fast, generic = _batches(seq, noise)
    assert fast is not None, "fast path must be eligible here"
    assert fast.template.pairs == generic.template.pairs
    np.testing.assert_allclose(
        fast.amp, generic.amp, atol=1e-12, rtol=1e-12
    )
    np.testing.assert_allclose(
        fast.det, generic.det, atol=1e-12, rtol=1e-12
    )
    np.testing.assert_allclose(
        fast.diags, generic.diags, atol=1e-9, rtol=1e-12
    )
    assert fast.reps == generic.reps
    for s_fast, s_gen in zip(fast.shims, generic.shims):
        assert s_fast.max_flip_gap == pytest.approx(
            float(getattr(s_gen, "max_flip_gap", 0.0))
        )


def test_fast_batch_ineligible_configs():
    """Time-dependent detuning noise falls back to the generic path."""
    seq = _afm_seq()
    noise = tpu.NoiseModel(
        runs=3,
        samples_per_run=1,
        detuning_sigma=0.2,
    )
    np.random.seed(5)
    sim = TpuEmulator.from_sequence(
        seq, noise_model=noise, evaluation_times="Minimal"
    )
    trajs = list(sim._hamiltonian_data.noise_trajectories)
    assert sim._fast_coeff_batch(trajs) is None


def test_fast_batch_env_opt_out(monkeypatch):
    seq = _afm_seq()
    noise = tpu.NoiseModel(runs=3, samples_per_run=1, amp_sigma=0.02)
    np.random.seed(5)
    sim = TpuEmulator.from_sequence(
        seq, noise_model=noise, evaluation_times="Minimal"
    )
    trajs = list(sim._hamiltonian_data.noise_trajectories)
    monkeypatch.setenv("PULSER_TPU_FAST_COEFF_BATCH", "0")
    assert sim._fast_coeff_batch(trajs) is None


def test_noisy_run_results_identical_both_paths(monkeypatch):
    """End to end: run() populations are identical fast vs generic."""
    seq = _afm_seq()
    noise = tpu.NoiseModel(
        runs=8,
        samples_per_run=2,
        amp_sigma=0.03,
        laser_waist=140.0,
        temperature=50.0,
        dephasing_rate=0.04,
    )

    def counts(disable):
        if disable:
            monkeypatch.setenv(
                "PULSER_TPU_FAST_COEFF_BATCH", "0"
            )
        else:
            monkeypatch.delenv(
                "PULSER_TPU_FAST_COEFF_BATCH", raising=False
            )
        np.random.seed(99)
        sim = TpuEmulator.from_sequence(
            seq, noise_model=noise, evaluation_times="Minimal"
        )
        res = sim.run()
        np.random.seed(3)
        # SampledResult.get_samples warns (reference parity) that it
        # resamples; here resampling is exactly what we compare.
        with pytest.warns(UserWarning, match="resamples a sampling"):
            return dict(res.sample_final_state(2000))

    assert counts(False) == counts(True)
