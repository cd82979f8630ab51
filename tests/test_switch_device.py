"""Device-switching behavior tests (strict and lax matching).

Coverage modeled on the reference's
``tests/test_sequence.py::test_switch_device_*`` suites (channel
matching rules, strict parameter checks, EOM compatibility;
reference ``pulser-core/pulser/sequence/helpers/_switch_device.py``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.devices import (
    AnalogDevice,
    DigitalAnalogDevice,
    MockDevice,
)
from pulser_tpu.exceptions.sequence import SwitchDeviceError
from pulser_tpu.sampler import sample


@pytest.fixture
def reg():
    return tpu.Register.square(2, spacing=6.0, prefix="q")


def _seq_with_pulse(reg, device, ch="rydberg_global"):
    seq = tpu.Sequence(reg, device)
    seq.declare_channel("ch0", ch)
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, -1.0, 0.0), "ch0")
    return seq


def test_same_device_warns_and_returns_unchanged(reg):
    seq = _seq_with_pulse(reg, DigitalAnalogDevice)
    with pytest.warns(
        UserWarning, match="Switching a sequence to the same device"
    ):
        out = seq.with_new_device(DigitalAnalogDevice)
    assert out is seq


def test_switch_to_virtual_and_back(reg):
    seq = _seq_with_pulse(reg, DigitalAnalogDevice)
    virt = seq.with_new_device(DigitalAnalogDevice.to_virtual())
    assert virt.device.name == DigitalAnalogDevice.to_virtual().name
    # Samples are preserved by a lax switch
    a = sample(seq).channel_samples["ch0"]
    b = sample(virt).channel_samples["ch0"]
    np.testing.assert_array_equal(
        np.asarray(a.amp, dtype=float), np.asarray(b.amp, dtype=float)
    )


def test_no_matching_channel_type_raises(reg):
    seq = tpu.Sequence(reg, MockDevice)
    seq.declare_channel("mw", "mw_global")
    with pytest.raises(
        TypeError, match="No match for channel 'mw'"
    ):
        seq.with_new_device(DigitalAnalogDevice)


def test_second_local_channel_has_no_match(reg):
    virt = dataclasses.replace(
        DigitalAnalogDevice.to_virtual(), reusable_channels=True
    )
    seq = tpu.Sequence(reg, virt)
    seq.declare_channel("raman", "raman_local", ["q0"])
    seq.declare_channel("raman_1", "raman_local", ["q0"])
    with pytest.raises(
        TypeError,
        match="No match for channel 'raman_1' with the"
        " right type, basis and addressing.",
    ):
        seq.with_new_device(DigitalAnalogDevice)


def test_strict_requires_matching_clock_period(reg):
    base_ch = MockDevice.channels["rydberg_global"]
    dev_a = dataclasses.replace(
        MockDevice,
        channel_objects=(
            dataclasses.replace(base_ch, clock_period=1),
        ),
        channel_ids=None,
    )
    dev_b = dataclasses.replace(
        MockDevice,
        name="OtherClock",
        channel_objects=(
            dataclasses.replace(base_ch, clock_period=4),
        ),
        channel_ids=None,
    )
    seq = _seq_with_pulse(reg, dev_a)
    # A Global channel with valid durations switches even strictly
    # (matching the reference: the timing-parameter match only blocks
    # when it would change the produced samples)
    out = seq.with_new_device(dev_b, strict=True)
    assert out.device.name == "OtherClock"
    a = sample(seq).channel_samples["ch0"]
    b = sample(out).channel_samples["ch0"]
    np.testing.assert_array_equal(
        np.asarray(a.amp, dtype=float),
        np.asarray(b.amp, dtype=float),
    )


def test_strict_preserves_samples_bit_exact(reg):
    seq = _seq_with_pulse(reg, DigitalAnalogDevice)
    renamed = dataclasses.replace(
        DigitalAnalogDevice, name="RenamedDevice"
    )
    out = seq.with_new_device(renamed, strict=True)
    a = sample(seq).channel_samples["ch0"]
    b = sample(out).channel_samples["ch0"]
    for field in ("amp", "det", "phase"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field), dtype=float),
            np.asarray(getattr(b, field), dtype=float),
        )


def test_switch_up_to_mock_device(reg):
    """A sequence on a restricted device runs unchanged on a fully
    virtual device."""
    seq = _seq_with_pulse(reg, AnalogDevice)
    with pytest.warns(
        UserWarning, match="different Rydberg level"
    ):
        out = seq.with_new_device(MockDevice)
    assert out.device is MockDevice
    assert out.get_duration() == seq.get_duration()


def test_eom_sequence_switch_requires_compatible_eom(reg):
    seq = tpu.Sequence(
        tpu.Register({"q0": (-3, 0), "q1": (3, 0)}), AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.enable_eom_mode(
        "ryd", amp_on=2 * np.pi, detuning_on=0.0
    )
    seq.add_eom_pulse("ryd", duration=100, phase=0.0)
    seq.disable_eom_mode("ryd")
    # A device whose rydberg channel has no EOM can't take the seq
    no_eom = dataclasses.replace(
        AnalogDevice,
        name="NoEom",
        channel_objects=tuple(
            dataclasses.replace(ch, eom_config=None)
            for ch in AnalogDevice.channel_objects
        ),
        channel_ids=None,
    )
    with pytest.raises(
        (TypeError, ValueError, SwitchDeviceError)
    ):
        seq.with_new_device(no_eom, strict=True)
    # Same-spec device under a new name is accepted
    renamed = dataclasses.replace(AnalogDevice, name="Analog2")
    out = seq.with_new_device(renamed, strict=True)
    assert out.device.name == "Analog2"
    a = sample(seq).channel_samples["ryd"]
    b = sample(out).channel_samples["ryd"]
    np.testing.assert_array_equal(
        np.asarray(a.amp, dtype=float), np.asarray(b.amp, dtype=float)
    )


def test_parametrized_sequence_switch(reg):
    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(tpu.Pulse.ConstantPulse(200, amp, 0.0, 0.0), "ch0")
    renamed = dataclasses.replace(
        DigitalAnalogDevice, name="Renamed"
    )
    out = seq.with_new_device(renamed)
    assert out.is_parametrized()
    built = out.build(amp=1.5)
    assert built.device.name == "Renamed"
    amp_arr = np.asarray(
        sample(built).channel_samples["ch0"].amp, dtype=float
    )
    np.testing.assert_allclose(amp_arr[:200], np.full(200, 1.5))


def test_register_incompatible_with_new_device(reg):
    seq = _seq_with_pulse(reg, MockDevice)
    tight = dataclasses.replace(
        DigitalAnalogDevice, max_radial_distance=1
    )
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="incompatible with the new device",
    ):
        seq.with_new_device(tight)
