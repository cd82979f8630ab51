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


def test_factored_policy_matches_dense_sharp_knots():
    """The factor-domain step policy reproduces the dense
    _sharp_knots marks and stiffness EXACTLY — including a drive
    whose real component flips sign at full amplitude (|d2| of the
    SIGNED component; an abs'd profile would hide that kink)."""
    from pulser_tpu.emulator.simulation import (
        _CoeffBatch,
        TpuEmulator,
    )

    rng = np.random.default_rng(3)
    B, nb, n, K = 5, 1, 3, 31
    knots = np.linspace(0.0, 1.0, K)
    base = np.ones((nb, n, K))
    # A pi phase jump mid-sequence: +A ... +A, -A ... -A (sharp kink
    # in the signed real part, invisible in |real part|)
    base[..., K // 2:] = -1.0
    amp_profile = (2.0 + 0.0j) * base
    amp_coeffs = rng.uniform(0.8, 1.2, (B, nb, n))
    det_profiles = np.stack(
        [np.linspace(-2, 2, K) * np.ones((nb, n, K))]
    )
    det_coeffs = rng.uniform(0.9, 1.1, (B, 1, nb, n))

    amp_dense = amp_coeffs[..., None] * amp_profile[None]
    det_dense = np.einsum(
        "brjq,rjqk->bjqk", det_coeffs, det_profiles
    )
    diags = rng.uniform(0, 4, (B, 2**n))
    batch = _CoeffBatch(
        diags=diags,
        reps=[1] * B,
        template=None,
        last_ham=None,
        amp=amp_dense,
        det=det_dense,
        det_factors=(det_profiles, det_coeffs),
        amp_factors=(amp_profile[None], amp_coeffs[:, None]),
    )
    amp_stiff, det_stiff, times = TpuEmulator._factored_policy(
        batch, knots
    )
    # Dense references
    np.testing.assert_allclose(
        amp_stiff,
        np.sum(2 * np.max(np.abs(amp_dense), axis=(2, 3)), axis=1),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        det_stiff,
        np.sum(np.max(np.abs(det_dense), axis=(2, 3)), axis=1),
        rtol=1e-12,
    )
    dense_times = TpuEmulator._sharp_knots(batch, knots)
    assert times is not None and dense_times is not None
    np.testing.assert_array_equal(times, dense_times)
    # The sign-flip knot is marked (it is a 4A second difference)
    flip_time = knots[K // 2]
    assert np.any(np.isclose(times, flip_time, atol=1e-12)) or \
        np.any(np.isclose(times, knots[K // 2 - 1], atol=1e-12))
