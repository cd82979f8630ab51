"""SimulationResults behavior tests (CoherentResults/NoisyResults).

Coverage modeled on the reference's
``tests/pulser_simulation/test_simresults.py`` (final-state options,
float-time lookup, expectation values, sampling incl. measurement
errors; reference ``pulser-simulation/pulser_simulation/
simresults.py:38-568``).
"""

from __future__ import annotations


import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.emulator import SimConfig, TpuEmulator
from pulser_tpu.emulator.simresults import (
    CoherentResults,
    NoisyResults,
)


@pytest.fixture(scope="module")
def bell_results():
    seq = tpu.Sequence(
        tpu.Register({"q0": (-2.5, 0), "q1": (2.5, 0)}),
        tpu.AnalogDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(1000, np.pi * np.sqrt(2)), 0.0, 0.0
        ),
        "ryd",
    )
    return TpuEmulator.from_sequence(seq).run()


def test_coherent_results_basics(bell_results):
    res = bell_results
    assert isinstance(res, CoherentResults)
    assert len(res.states) > 1
    final = res.get_final_state()
    assert final.shape == (4, 1)
    assert np.isclose(np.linalg.norm(final.full()), 1.0)


def test_final_state_options(bell_results):
    res = bell_results
    # ignore_global_phase rotates the largest component to real
    f1 = res.get_final_state(ignore_global_phase=True).full()[:, 0]
    biggest = f1[np.argmax(np.abs(f1))]
    assert abs(np.imag(biggest)) < 1e-9
    # normalize=False keeps the raw integrator output
    raw = res.get_final_state(
        ignore_global_phase=False, normalize=False
    ).full()
    assert abs(np.linalg.norm(raw) - 1.0) < 1e-4


def test_get_state_float_time(bell_results):
    res = bell_results
    st = res.get_state(0.5)
    assert st.shape == (4, 1)
    # Out-of-tolerance time is rejected
    with pytest.raises(IndexError):
        res.get_state(0.50002, t_tol=1e-6)


def test_expect_matches_manual(bell_results):
    res = bell_results
    # Total rydberg occupation N = n0 + n1 in the [rr, rg, gr, gg]
    # ordering
    n_tot = np.diag([2.0, 1.0, 1.0, 0.0]).astype(complex)
    (vals,) = res.expect([n_tot])
    vals = np.asarray(vals, dtype=float)
    assert np.isclose(vals[0], 0.0, atol=1e-9)  # starts in gg
    final = res.get_final_state().full()[:, 0]
    manual = float(
        np.real(final.conj() @ n_tot @ final)
    )
    assert np.isclose(vals[-1], manual, atol=1e-6)
    with pytest.raises(TypeError, match="must be a list"):
        res.expect("n_tot")
    with pytest.raises(ValueError, match="Incompatible shape"):
        res.expect([np.eye(3)])


def test_sample_final_state_blockade():
    """Area pi/sqrt(2): the blockaded pair does a pi rotation onto
    the symmetric W state (|rg>+|gr>)/sqrt(2)."""
    seq = tpu.Sequence(
        tpu.Register({"q0": (-2.5, 0), "q1": (2.5, 0)}),
        tpu.AnalogDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(1000, np.pi / np.sqrt(2)), 0.0, 0.0
        ),
        "ryd",
    )
    res = TpuEmulator.from_sequence(seq).run()
    np.random.seed(1)
    counts = res.sample_final_state(2000)
    assert sum(counts.values()) == 2000
    # Blockade: '11' strongly suppressed, '01'/'10' dominant
    assert counts.get("11", 0) < 100
    assert counts.get("01", 0) + counts.get("10", 0) > 1200


def test_sample_final_state_with_measurement_errors():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    # Identity evolution: stays in 'g'
    seq.add(tpu.Pulse.ConstantPulse(100, 0.0, 0.0, 0.0), "ryd")
    with pytest.warns(DeprecationWarning):
        cfg = SimConfig(noise=("SPAM",), eta=0.0, epsilon=0.4)
    sim = TpuEmulator.from_sequence(seq)
    sim.set_config(cfg)
    res = sim.run()
    np.random.seed(5)
    counts = res.sample_final_state(5000)
    # Every shot starts as '0'; false positives flip 40%
    assert abs(counts.get("1", 0) / 5000 - 0.4) < 0.05


def test_noisy_results_structure():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 9)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, 2.0, 0.0, 0.0), "ryd")
    nm = tpu.NoiseModel(
        state_prep_error=0.2, runs=5, samples_per_run=3
    )
    np.random.seed(7)
    res = TpuEmulator.from_sequence(seq, noise_model=nm).run()
    assert isinstance(res, NoisyResults)
    final = res.results[-1]
    assert np.isclose(sum(final.values()), 1.0)
    with pytest.warns(UserWarning, match="resamples"):
        counts = res.sample_final_state(100)
    assert sum(counts.values()) == 100
    # States are diagonal pseudo-density matrices
    st = res.get_state(res._sim_times[-1])
    assert st.shape == (4, 4)
    off_diag = st.full() - np.diag(np.diag(st.full()))
    assert np.allclose(off_diag, 0)


def test_noisy_results_expect():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi * 10 / 3, 0.0, 0.0), "ryd")
    nm = tpu.NoiseModel(
        state_prep_error=0.1, runs=10, samples_per_run=2
    )
    np.random.seed(3)
    res = TpuEmulator.from_sequence(seq, noise_model=nm).run()
    n_op = np.diag([1.0, 0.0]).astype(complex)
    (vals,) = res.expect([n_op])
    vals = np.asarray(vals, dtype=float)
    assert np.all(vals >= -1e-9)
    assert np.all(vals <= 1 + 1e-9)


def test_plot_smoke(bell_results, patch_plt_show):
    n_tot = np.diag([2.0, 1.0, 1.0, 0.0]).astype(complex)
    bell_results.plot(n_tot)


def test_xy_results_basis():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (8, 0)}), tpu.MockDevice
    )
    seq.declare_channel("mw", "mw_global")
    seq.add(tpu.Pulse.ConstantPulse(200, np.pi * 5, 0.0, 0.0), "mw")
    res = TpuEmulator.from_sequence(seq).run()
    counts = res.sample_final_state(500)
    # XY measurement basis: bitstrings count 'u' occupations
    assert sum(counts.values()) == 500
    assert all(set(k) <= {"0", "1"} and len(k) == 2 for k in counts)
