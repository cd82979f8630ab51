"""Sampler behavioral tests (nested dicts, phases, extension, SLM).

Coverage modeled on the reference's ``tests/test_sequence_sampler.py``
(``to_nested_dict`` structure, centered phase, phase modulation,
duration extension, SLM redistribution; reference
``pulser-core/pulser/sampler/samples.py:133-621``).
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.sampler import sample


def _global_seq(phase=0.5):
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 8)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantPulse(100, 2.0, -1.0, phase), "ryd"
    )
    return seq


def test_samples_arrays_and_slots():
    s = sample(_global_seq())
    cs = s.channel_samples["ryd"]
    assert cs.duration == 100
    np.testing.assert_allclose(
        np.asarray(cs.amp, dtype=float), np.full(100, 2.0)
    )
    np.testing.assert_allclose(
        np.asarray(cs.det, dtype=float), np.full(100, -1.0)
    )
    np.testing.assert_allclose(
        np.asarray(cs.phase, dtype=float), np.full(100, 0.5)
    )
    assert len(cs.slots) == 1
    assert (cs.slots[0].ti, cs.slots[0].tf) == (0, 100)
    assert cs.slots[0].targets == {"q0", "q1"}
    assert not cs.is_empty()


def test_nested_dict_global_structure():
    nd = sample(_global_seq()).to_nested_dict()
    assert set(nd["Global"]) == {"ground-rydberg"}
    data = nd["Global"]["ground-rydberg"]
    assert set(data) == {"amp", "det", "phase"}
    np.testing.assert_allclose(
        np.asarray(data["amp"], dtype=float), np.full(100, 2.0)
    )


def test_nested_dict_all_local_delocalizes():
    nd = sample(_global_seq()).to_nested_dict(all_local=True)
    assert not nd["Global"]
    per_qubit = nd["Local"]["ground-rydberg"]
    assert set(per_qubit) == {"q0", "q1"}
    for q in ("q0", "q1"):
        np.testing.assert_allclose(
            np.asarray(per_qubit[q]["amp"], dtype=float),
            np.full(100, 2.0),
        )


def test_centered_phase_wraps_into_minus_pi_pi():
    seq = _global_seq(phase=5.0)  # > pi, wraps negative
    cs = sample(seq).channel_samples["ryd"]
    centered = np.asarray(cs.centered_phase, dtype=float)
    assert np.all(centered > -np.pi)
    assert np.all(centered <= np.pi)
    np.testing.assert_allclose(
        centered, np.full(100, 5.0 - 2 * np.pi)
    )


def test_phase_modulation_reconstructs_phase():
    """phase_modulation = phi_c - cumsum(det)*1e-3."""
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            1.0, tpu.RampWaveform(200, -2.0, 2.0), 0.3
        ),
        "ryd",
    )
    cs = sample(seq).channel_samples["ryd"]
    det = np.asarray(cs.det, dtype=float)
    expected = np.asarray(
        cs.centered_phase, dtype=float
    ) - np.cumsum(det * 1e-3)
    np.testing.assert_allclose(
        np.asarray(cs.phase_modulation, dtype=float),
        expected,
        atol=1e-9,
    )


def test_extend_duration_pads_amp_with_zeros():
    s = sample(_global_seq())
    ext = s.extend_duration(150)
    cs = ext.channel_samples["ryd"]
    assert cs.duration == 150
    amp = np.asarray(cs.amp, dtype=float)
    np.testing.assert_allclose(amp[100:], np.zeros(50))
    # Phase pads with the last value (phase has no "off" state)
    ph = np.asarray(cs.phase, dtype=float)
    np.testing.assert_allclose(ph[100:], np.full(50, 0.5))
    with pytest.raises(
        ValueError, match="extend samples to a lower duration"
    ):
        s.extend_duration(50)


def test_modulated_output_longer_and_area_conserving():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0)}), tpu.AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(1000, np.pi), 0.0, 0.0
        ),
        "ryd",
    )
    plain = sample(seq)
    mod = sample(seq, modulation=True)
    ch = seq.declared_channels["ryd"]
    amp_plain = np.asarray(
        plain.channel_samples["ryd"].amp, dtype=float
    )
    amp_mod = np.asarray(
        mod.channel_samples["ryd"].amp, dtype=float
    )
    assert len(amp_mod) > len(amp_plain)
    assert np.isclose(
        amp_mod.sum(), amp_plain.sum(), rtol=1e-3
    )
    assert amp_mod.max() <= amp_plain.max() + 1e-9


def test_slm_mask_applies_dmm_detuning():
    """In Ising mode the SLM mask acts through the auto-generated DMM
    pulse: the global drive stays intact, while masked qubits get a
    -10*max_amp local detuning during the first global pulse
    (reference sequence.py:2102, sampled to Local det entries)."""
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.config_slm_mask(["q1"])
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, 0.0, 0.0), "ryd")
    seq.add(tpu.Pulse.ConstantPulse(100, 3.0, 0.0, 0.0), "ryd")
    nd = sample(seq).to_nested_dict()
    # The global drive is untouched
    g_amp = np.asarray(
        nd["Global"]["ground-rydberg"]["amp"], dtype=float
    )
    np.testing.assert_allclose(g_amp[:100], np.full(100, 2.0))
    np.testing.assert_allclose(g_amp[100:200], np.full(100, 3.0))
    local = nd["Local"]["ground-rydberg"]
    det_masked = np.asarray(local["q1"]["det"], dtype=float)
    det_open = np.asarray(local["q0"]["det"], dtype=float)
    # -10 * max_amp = -20 rad/µs during the first (masked) pulse only
    np.testing.assert_allclose(det_masked[:100], np.full(100, -20.0))
    np.testing.assert_allclose(det_masked[100:200], np.zeros(100))
    np.testing.assert_allclose(det_open[:200], np.zeros(200))


def test_used_bases_and_eigenbasis():
    s = sample(_global_seq())
    assert s.used_bases == {"ground-rydberg"}
    assert s.eigenbasis == ["r", "g"]


def test_sampling_empty_channel():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    seq.declare_channel("ram", "raman_global")
    s = sample(seq)
    assert s.channel_samples["ram"].is_empty()
    # An empty channel still materializes (all-zero) in the nested
    # dict, matching the reference's layout
    nd = s.to_nested_dict()
    assert np.all(
        np.asarray(nd["Global"]["digital"]["amp"], dtype=float) == 0
    )
