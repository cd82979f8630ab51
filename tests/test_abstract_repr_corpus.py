"""Abstract-representation round trips over every operation kind.

A corpus of sequences exercising each serialized op (target, align,
delay, phase_shift, pulse, pulse_arbitrary_phase, EOM ops, DMM ops,
SLM mask, truncate) plus parametrized defaults, registers, layouts,
noise models and waveform expressions — each must survive
``to_abstract_repr`` → ``from_abstract_repr`` with its schedule intact,
and the payloads must validate against the reference JSON schemas.
"""

from __future__ import annotations

import json
import sys
import warnings

import numpy as np
import pytest

sys.path.append("/root/reference/pulser-core")
ref = pytest.importorskip("pulser")

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.register import (  # noqa: E402
    MappableRegister,
    TriangularLatticeLayout,
)
from pulser_tpu.sampler import sample  # noqa: E402


def _roundtrip(seq: tpu.Sequence) -> tpu.Sequence:
    payload = seq.to_abstract_repr()
    # The payload must also satisfy the reference's own validator
    from pulser.json.abstract_repr.validation import (
        validate_abstract_repr,
    )

    validate_abstract_repr(payload, "sequence")
    return tpu.Sequence.from_abstract_repr(payload)


def _assert_equiv(seq_a: tpu.Sequence, seq_b: tpu.Sequence) -> None:
    assert seq_a.get_duration() == seq_b.get_duration()
    samp_a = sample(seq_a)
    samp_b = sample(seq_b)
    assert samp_a.channels == samp_b.channels
    for ch in samp_a.channels:
        ca = samp_a.channel_samples[ch]
        cb = samp_b.channel_samples[ch]
        for q in ("amp", "det", "phase"):
            np.testing.assert_allclose(
                getattr(ca, q).as_array(detach=True),
                getattr(cb, q).as_array(detach=True),
                atol=1e-12,
                err_msg=f"{ch}/{q}",
            )


def test_every_regular_op_kind():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8), "q2": (8, 0)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    # pulse
    seq.add(
        tpu.Pulse(
            tpu.BlackmanWaveform(500, np.pi),
            tpu.RampWaveform(500, -2.0, 2.0),
            0.5,
            post_phase_shift=0.1,
        ),
        "ryd",
    )
    # delay / target / phase_shift / align
    seq.delay(100, "ram")
    seq.target({"q1"}, "ram")
    seq.phase_shift(0.3, "q1", basis="digital")
    seq.add(tpu.Pulse.ConstantPulse(120, 1.0, 0.0, 0.0), "ram")
    seq.align("ryd", "ram")
    # composite + custom + kaiser + interpolated waveforms in one pulse
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.CompositeWaveform(
                tpu.KaiserWaveform(200, 1.0),
                tpu.CustomWaveform(np.linspace(0, 1.0, 100)),
                tpu.InterpolatedWaveform(200, [0.0, 2.0, 0.0]),
            ),
            -1.0,
            0.0,
        ),
        "ryd",
    )
    seq.measure("ground-rydberg")
    _assert_equiv(seq, _roundtrip(seq))


def test_arbitrary_phase_op():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ArbitraryPhase(
            tpu.ConstantWaveform(300, 2.0),
            tpu.InterpolatedWaveform(300, [0.0, 1.0, 0.5]),
        ),
        "ryd",
    )
    _assert_equiv(seq, _roundtrip(seq))


def test_eom_ops_roundtrip():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 10)}), tpu.AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(120, 2.0, 0.0, 0.0), "ryd")
    seq.enable_eom_mode(
        "ryd", amp_on=2.0, detuning_on=0.0, optimal_detuning_off=-5.0
    )
    seq.add_eom_pulse("ryd", duration=100, phase=0.0)
    seq.delay(148, "ryd")
    seq.modify_eom_setpoint("ryd", amp_on=3.0, detuning_on=1.0)
    seq.add_eom_pulse(
        "ryd", duration=64, phase=0.5, correct_phase_drift=True
    )
    seq.disable_eom_mode("ryd")
    _assert_equiv(seq, _roundtrip(seq))


def test_slm_and_dmm_ops_roundtrip():
    reg = tpu.Register.square(2, spacing=6, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    dmap = reg.define_detuning_map({"q0": 1.0, "q2": 0.5})
    seq.config_detuning_map(dmap, "dmm_0")
    seq.config_slm_mask(["q1"], "dmm_0")
    seq.add_dmm_detuning(tpu.RampWaveform(100, -4.0, 0.0), "dmm_0")
    seq.add(tpu.Pulse.ConstantPulse(200, 1.5, 0.0, 0.0), "ryd")
    _assert_equiv(seq, _roundtrip(seq))


def test_truncate_op_roundtrip():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(400, 1.0, 0.0, 0.0), "ryd")
    seq.truncate(300)
    roundtripped = _roundtrip(seq)
    assert roundtripped.get_duration() == seq.get_duration() == 300
    _assert_equiv(seq, roundtripped)


def test_xy_sequence_roundtrip():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.set_magnetic_field(1.0, -1.0, 20.0)
    seq.declare_channel("mw", "mw_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, -0.5, 0.3), "mw")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq.measure("XY")
    back = _roundtrip(seq)
    np.testing.assert_allclose(back.magnetic_field, seq.magnetic_field)
    _assert_equiv(seq, back)


def test_parametrized_sequence_with_defaults():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    dur = seq.declare_variable("dur", dtype=int)
    seq.add(tpu.Pulse.ConstantPulse(dur, amp, -amp / 2, amp + 1), "ryd")
    payload = seq.to_abstract_repr(amp=2.0, dur=200)
    back = tpu.Sequence.from_abstract_repr(payload)
    assert back.is_parametrized()
    built_a = seq.build(amp=2.0, dur=200)
    built_b = back.build(amp=2.0, dur=200)
    _assert_equiv(built_a, built_b)


def test_parametrized_expressions_roundtrip():
    """Every serializable expression kind survives the round trip."""
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    x = seq.declare_variable("x", dtype=float)
    v = seq.declare_variable("v", size=3, dtype=float)
    expressions = [
        x + 1.0,
        1.0 - x,
        x * 2.0,
        x / 2.0,
        x**2,
        x % 3.0,
        -x,
        abs(x),
        np.ceil(x),
        np.floor(x),
        np.sqrt(abs(x) + 1),
        np.exp(x / 10),
        np.log2(abs(x) + 1),
        np.log(abs(x) + 1),
        np.sin(x),
        np.cos(x),
        np.tan(x / 9),
        np.tanh(x) + 1.01,
        v[0],
        v[1] + v[2],
    ]
    total = expressions[0]
    for e in expressions[1:]:
        total = total + abs(e) + 0.001
    seq.add(
        tpu.Pulse.ConstantPulse(200, total, 0.0, 0.0),
        "ryd",
    )
    back = tpu.Sequence.from_abstract_repr(seq.to_abstract_repr())
    values = dict(x=1.3, v=[0.4, 0.5, 0.6])
    _assert_equiv(seq.build(**values), back.build(**values))


def test_mappable_register_roundtrip():
    layout = TriangularLatticeLayout(20, 6.0)
    mreg = layout.make_mappable_register(3)
    assert isinstance(mreg, MappableRegister)
    seq = tpu.Sequence(mreg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    payload = seq.to_abstract_repr(qubits={"q0": 2, "q1": 7})
    back = tpu.Sequence.from_abstract_repr(payload)
    assert back.is_register_mappable()
    built_a = seq.build(qubits={"q0": 2, "q1": 7})
    built_b = back.build(qubits={"q0": 2, "q1": 7})
    assert built_a.register == built_b.register
    _assert_equiv(built_a, built_b)


def test_device_layouts_and_noise_roundtrip():
    for device in (
        tpu.AnalogDevice,
        tpu.DigitalAnalogDevice,
        tpu.devices.WeightedAnalogDevice,
    ):
        payload = device.to_abstract_repr()
        back = type(device).from_abstract_repr(payload)
        assert back == device

    noise = tpu.NoiseModel(
        p_false_pos=0.02,
        p_false_neg=0.01,
        state_prep_error=0.005,
        temperature=30.0,
        laser_waist=150.0,
        amp_sigma=0.01,
        runs=10,
        samples_per_run=5,
        dephasing_rate=0.1,
        relaxation_rate=0.05,
    )
    back_noise = tpu.NoiseModel.from_abstract_repr(
        noise.to_abstract_repr()
    )
    assert back_noise == noise


def test_cross_framework_sequence_payloads():
    """Reference-serialized sequences load here, and vice versa."""

    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(
            mod.Pulse.ConstantDetuning(
                mod.BlackmanWaveform(1000, np.pi), 1.0, 0.2
            ),
            "ryd",
        )
        seq.target("q1", "ram")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        seq.measure("ground-rydberg")
        return seq

    payload_ref = build(ref).to_abstract_repr()
    seq_here = tpu.Sequence.from_abstract_repr(payload_ref)
    mine = build(tpu)
    _assert_equiv(mine, seq_here)

    payload_mine = mine.to_abstract_repr()
    seq_there = ref.Sequence.from_abstract_repr(payload_mine)
    import pulser.sampler as ref_sampler

    samp_r = ref_sampler.sample(seq_there)
    samp_t = sample(mine)
    for ch in samp_t.channels:
        for q in ("amp", "det", "phase"):
            np.testing.assert_allclose(
                getattr(
                    samp_r.channel_samples[ch], q
                ).as_array(detach=True),
                getattr(
                    samp_t.channel_samples[ch], q
                ).as_array(detach=True),
                atol=1e-12,
            )


def test_payload_structure_matches_reference():
    """Field-for-field payload identity with the reference serializer."""

    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            mod.Pulse.ConstantPulse(100, 1.0, -0.5, 0.25, 0.1), "ryd"
        )
        seq.delay(52, "ryd")
        seq.measure("ground-rydberg")
        return seq

    here = json.loads(build(tpu).to_abstract_repr(seq_name="t"))
    there = json.loads(build(ref).to_abstract_repr(seq_name="t"))
    # Versions/metadata legitimately differ
    for payload in (here, there):
        payload.pop("version", None)
        payload.pop("metadata", None)
        payload.pop("pulser_version", None)
        payload["device"].pop("pulser_version", None)
    assert here == there
