"""Golden cross-checks against the reference implementation.

The reference pulser-core package (pure Python) is importable from
/root/reference; these tests assert bit-exact parity of the sampled
amp/det/phase arrays for identical sequences. They are skipped when the
reference isn't available (e.g. outside the build image).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

REF_PATH = "/root/reference/pulser-core"
sys.path.append(REF_PATH)

ref = pytest.importorskip("pulser")
import pulser.sampler as ref_sampler  # noqa: E402

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.sampler import sample as tpu_sample  # noqa: E402


def _assert_samples_equal(samp_r, samp_t):
    assert samp_r.channels == samp_t.channels
    for ch in samp_r.channels:
        cr = samp_r.channel_samples[ch]
        ct = samp_t.channel_samples[ch]
        assert cr.duration == ct.duration
        for q in ("amp", "det", "phase"):
            a = getattr(cr, q).as_array(detach=True)
            b = getattr(ct, q).as_array(detach=True)
            np.testing.assert_allclose(a, b, atol=1e-12, err_msg=f"{ch}/{q}")
        assert [(s.ti, s.tf, s.targets) for s in cr.slots] == [
            (s.ti, s.tf, s.targets) for s in ct.slots
        ]


def _assert_nested_equal(a: dict, b: dict, path: str = "") -> None:
    assert a.keys() == b.keys(), (path, a.keys(), b.keys())
    for k in a:
        if isinstance(a[k], dict):
            _assert_nested_equal(a[k], b[k], path + f"/{k}")
        else:
            np.testing.assert_allclose(
                a[k], b[k], atol=1e-12, err_msg=path + f"/{k}"
            )


def _build_multichannel(mod):
    reg = mod.Register({"q0": (0, 0), "q1": (0, 8), "q2": (8, 0)})
    seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(
        mod.Pulse.ConstantDetuning(
            mod.BlackmanWaveform(1000, np.pi), -2.0, 0.3
        ),
        "ryd",
    )
    seq.add(mod.Pulse.ConstantPulse(252, 1.5, 0.0, 1.1), "ram")
    seq.target("q2", "ram")
    seq.phase_shift(0.7, "q2", basis="digital")
    seq.add(mod.Pulse.ConstantPulse(100, 1.0, -1.0, 0.2), "ram")
    seq.add(
        mod.Pulse.ConstantPulse(200, 2.0, 1.0, 2.2),
        "ryd",
        protocol="min-delay",
    )
    seq.delay(52, "ryd")
    seq.add(
        mod.Pulse.ConstantDetuning(
            mod.RampWaveform(500, 0.0, 2.0), 1.0, 0.0
        ),
        "ryd",
    )
    return seq


def test_multichannel_schedule_parity():
    sr = _build_multichannel(ref)
    st = _build_multichannel(tpu)
    assert sr.get_duration() == st.get_duration()
    _assert_samples_equal(ref_sampler.sample(sr), tpu_sample(st))
    _assert_nested_equal(
        ref_sampler.sample(sr).to_nested_dict(),
        tpu_sample(st).to_nested_dict(),
    )


def _build_eom(mod):
    reg = mod.Register({"q0": (0, 0), "q1": (0, 10)})
    seq = mod.Sequence(reg, mod.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(mod.Pulse.ConstantPulse(120, 2.0, 0.0, 0.0), "ryd")
    seq.enable_eom_mode(
        "ryd", amp_on=2 * np.pi, detuning_on=0.0, optimal_detuning_off=-10.0
    )
    seq.add_eom_pulse("ryd", duration=100, phase=0.0)
    seq.delay(300, "ryd")
    seq.add_eom_pulse(
        "ryd", duration=60, phase=np.pi / 2, correct_phase_drift=True
    )
    seq.disable_eom_mode("ryd")
    seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.4), "ryd")
    return seq


def test_eom_modulation_parity():
    er = _build_eom(ref)
    et = _build_eom(tpu)
    assert er.get_duration() == et.get_duration()
    mr = ref_sampler.sample(
        er,
        modulation=True,
        extended_duration=er.get_duration(include_fall_time=True),
    )
    mt = tpu_sample(
        et,
        modulation=True,
        extended_duration=et.get_duration(include_fall_time=True),
    )
    for ch in mr.channels:
        cr = mr.channel_samples[ch]
        ct = mt.channel_samples[ch]
        assert cr.duration == ct.duration
        for q in ("amp", "det", "phase"):
            a = getattr(cr, q).as_array(detach=True)
            b = getattr(ct, q).as_array(detach=True)
            np.testing.assert_allclose(a, b, atol=1e-10)


def _build_slm(mod):
    seq = mod.Sequence(
        mod.Register.square(2, spacing=6, prefix="q"),
        mod.DigitalAnalogDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.config_slm_mask(["q0", "q3"])
    seq.add(mod.Pulse.ConstantPulse(200, 2.0, -1.0, 0.0), "ryd")
    seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    return seq


def test_slm_mask_parity():
    _assert_nested_equal(
        ref_sampler.sample(_build_slm(ref)).to_nested_dict(),
        tpu_sample(_build_slm(tpu)).to_nested_dict(),
    )


def test_xy_mode_parity():
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"), mod.MockDevice
        )
        seq.declare_channel("mw", "mw_global")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, -0.5, 0.3), "mw")
        seq.measure("XY")
        return seq

    sr, st = build(ref), build(tpu)
    samp_r, samp_t = ref_sampler.sample(sr), tpu_sample(st)
    assert samp_r.eigenbasis == samp_t.eigenbasis == ["u", "d"]
    np.testing.assert_allclose(
        samp_r._magnetic_field, samp_t._magnetic_field
    )
    _assert_nested_equal(
        samp_r.to_nested_dict(), samp_t.to_nested_dict()
    )


def test_waveform_parity():
    for name, args in [
        ("BlackmanWaveform", (1000, np.pi)),
        ("KaiserWaveform", (777, 2.5)),
        ("RampWaveform", (100, -1.0, 3.0)),
        ("ConstantWaveform", (123, 4.5)),
        ("InterpolatedWaveform", (500, [0, 5, 0])),
    ]:
        wr = getattr(ref, name)(*args)
        wt = getattr(tpu, name)(*args)
        np.testing.assert_allclose(
            wr.samples.as_array(detach=True),
            wt.samples.as_array(detach=True),
            atol=1e-12,
            err_msg=name,
        )


def test_modulation_buffers_parity():
    ch_r = ref.AnalogDevice.channels["rydberg_global"]
    ch_t = tpu.AnalogDevice.channels["rydberg_global"]
    wf_r = ref.BlackmanWaveform(1000, np.pi)
    wf_t = tpu.BlackmanWaveform(1000, np.pi)
    assert wf_r.modulation_buffers(ch_r) == wf_t.modulation_buffers(ch_t)
    np.testing.assert_allclose(
        wf_r.modulated_samples(ch_r).as_array(detach=True),
        wf_t.modulated_samples(ch_t).as_array(detach=True),
        atol=1e-12,
    )


def test_switch_device_strict_keeps_samples():
    """Strict device switch must leave the samples bit-exact."""
    import warnings

    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, 0.0, 0.0), "ryd")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        new_seq = seq.with_new_device(
            tpu.devices.DigitalAnalogDevice, strict=True
        )
    g1 = tpu_sample(seq).to_nested_dict()["Global"]["ground-rydberg"]
    g2 = tpu_sample(new_seq).to_nested_dict()["Global"]["ground-rydberg"]
    for k in ("amp", "det", "phase"):
        np.testing.assert_array_equal(
            np.asarray(g1[k], dtype=float),
            np.asarray(g2[k], dtype=float),
        )


def test_switch_device_no_match_raises():
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
    with pytest.warns(
        UserWarning, match="different Rydberg level"
    ), pytest.raises(TypeError, match="No match for channel"):
        seq.with_new_device(tpu.devices.AnalogDevice)
