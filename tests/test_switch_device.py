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


# ------------------------------------------------------------------
# Extended matrix ported from the reference's test_switch_device_down
# (reference tests/test_sequence.py:686-1028): DMM matchings, strict
# per-parameter mismatch messages, interaction-coefficient checks.
# ------------------------------------------------------------------


def _phys_device():
    return dataclasses.replace(
        DigitalAnalogDevice,
        dmm_objects=(
            dataclasses.replace(
                DigitalAnalogDevice.dmm_objects[0],
                total_bottom_detuning=-2000,
            ),
        ),
    )


@pytest.fixture
def det_map(reg):
    # Full weight on every qubit: a -20 rad/us DMM pulse then lands
    # at -20 per trap, overflowing a bottom_detuning=-10 DMM.
    return reg.define_detuning_map(
        {q: 1.0 for q in reg.qubit_ids}
    )


@pytest.mark.parametrize("parametrized", [False, True])
class TestSwitchDeviceDmm:
    def _seq_two_dmms(self, reg, det_map, parametrized):
        device = dataclasses.replace(
            _phys_device().to_virtual(), reusable_channels=True
        )
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("global", "rydberg_global")
        if parametrized:
            t = seq.declare_variable("t", dtype=int)
            seq.delay(t, "global")
        seq.config_detuning_map(det_map, dmm_id="dmm_0")
        seq.config_detuning_map(det_map, dmm_id="dmm_0")
        assert list(seq.declared_channels.keys()) == [
            "global",
            "dmm_0",
            "dmm_0_1",
        ]
        return seq

    def test_second_dmm_needs_a_slot(self, reg, det_map, parametrized):
        seq = self._seq_two_dmms(reg, det_map, parametrized)
        with pytest.raises(
            TypeError,
            match="No match for channel 'dmm_0_1' with the"
            " right type, basis and addressing.",
        ):
            seq.with_new_device(_phys_device())

    def test_bottom_detuning_not_strict_param(
        self, reg, det_map, parametrized
    ):
        """Strict matching tolerates differing bottom detunings as
        long as the played samples stay legal."""
        seq = self._seq_two_dmms(reg, det_map, parametrized)
        phys = _phys_device()
        dmm_down = dataclasses.replace(
            phys.dmm_channels["dmm_0"], bottom_detuning=-10
        )
        out = seq.with_new_device(
            dataclasses.replace(
                phys, dmm_objects=(dmm_down, dmm_down)
            ),
            strict=True,
        )
        assert list(out.declared_channels.keys()) == [
            "global",
            "dmm_0",
            "dmm_1",
        ]

    def test_dmm_detuning_range_checked_strictly(
        self, reg, det_map, parametrized
    ):
        """Once the sequence plays a -20 rad/us DMM detuning, a device
        whose DMMs stop at -10 can't take it strictly — and the error
        enumerates the attempted matchings."""
        seq = self._seq_two_dmms(reg, det_map, parametrized)
        seq.add_dmm_detuning(
            tpu.ConstantWaveform(100, -20), "dmm_0_1"
        )
        phys = _phys_device()
        dmm_down = dataclasses.replace(
            phys.dmm_channels["dmm_0"], bottom_detuning=-10
        )
        # A virtual device with one reusable deep-enough DMM: fine.
        out = seq.with_new_device(
            dataclasses.replace(
                phys.to_virtual(),
                reusable_channels=True,
                dmm_objects=(
                    dataclasses.replace(
                        dmm_down, bottom_detuning=-20
                    ),
                ),
            ),
            strict=True,
        )
        assert list(out.declared_channels.keys()) == [
            "global",
            "dmm_0",
            "dmm_0_1",
        ]
        # One deep + one shallow DMM: the deep one must take dmm_0_1.
        out = seq.with_new_device(
            dataclasses.replace(
                phys,
                dmm_objects=(
                    phys.dmm_channels["dmm_0"],
                    dmm_down,
                ),
            ),
            strict=True,
        )
        assert list(out.declared_channels.keys()) == [
            "global",
            "dmm_1",
            "dmm_0",
        ]
        # Two shallow DMMs: no valid matching; the error lists them.
        with pytest.raises(
            (ValueError, SwitchDeviceError),
            match="No matching found between declared channels and"
            " channels in the new device",
        ):
            seq.with_new_device(
                dataclasses.replace(
                    phys, dmm_objects=(dmm_down, dmm_down)
                ),
                strict=True,
            )


@pytest.mark.parametrize("parametrized", [False, True])
@pytest.mark.parametrize(
    "channel_id, msg",
    [
        ("rydberg_global", "Rydberg level"),
        ("mw_global", "XY interaction coefficient"),
    ],
)
def test_interaction_coefficient_mismatch(
    reg, channel_id, msg, parametrized
):
    seq = tpu.Sequence(reg, MockDevice)
    seq.declare_channel("ch0", channel_id)
    if parametrized:
        t = seq.declare_variable("t", dtype=int)
        seq.delay(t, "ch0")
    mod_mock = dataclasses.replace(MockDevice, rydberg_level=50)
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="Strict device match failed because the devices"
        f" have different {msg}s.",
    ):
        seq.with_new_device(mod_mock, strict=True)
    with pytest.warns(
        UserWarning,
        match=f"Switching to a device with a different {msg},"
        " check that the expected interactions still hold.",
    ):
        seq.with_new_device(mod_mock, strict=False)


def _local_device(name="Dev", **raman_kwargs):
    from pulser_tpu.channels import Raman, Rydberg

    defaults = dict(
        max_abs_detuning=2 * np.pi * 20,
        max_amp=2 * np.pi * 10,
        max_targets=2,
        fixed_retarget_t=0,
        min_retarget_interval=220,
        clock_period=1,
        mod_bandwidth=None,
    )
    defaults.update(raman_kwargs)
    return dataclasses.replace(
        MockDevice,
        name=name,
        channel_objects=(
            Rydberg.Global(None, None),
            Raman.Local(**defaults),
        ),
        channel_ids=("rydberg_global", "rmn_local"),
    )


@pytest.mark.parametrize(
    "new_kwargs, culprit",
    [
        ({"clock_period": 4}, "'clock_period'"),
        ({"mod_bandwidth": 5.0}, "'mod_bandwidth'"),
        ({"fixed_retarget_t": 100}, "'fixed_retarget_t'"),
        ({"min_retarget_interval": 500}, "'min_retarget_interval'"),
    ],
)
def test_strict_timing_param_mismatch_parametrized(
    reg, new_kwargs, culprit
):
    """For a parametrized sequence every timing parameter must match
    up front: its effect only appears at build time (reference
    test_sequence.py:952-1027)."""
    seq = tpu.Sequence(reg, _local_device())
    seq.declare_channel("digital", "rmn_local", initial_target=["q0"])
    t = seq.declare_variable("t", dtype=int)
    seq.delay(t, "digital")
    assert seq.is_parametrized()
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="No match for channel 'digital' with the same "
        + culprit,
    ):
        seq.with_new_device(
            _local_device("Dev2", **new_kwargs), strict=True
        )


def test_empty_declaration_switch_ignores_timing(reg):
    """A non-parametrized sequence with only declarations switches
    even across timing differences — no samples can change."""
    seq = tpu.Sequence(reg, _local_device())
    seq.declare_channel("digital", "rmn_local", initial_target=["q0"])
    out = seq.with_new_device(
        _local_device("Dev2", clock_period=4), strict=True
    )
    assert out.device.name == "Dev2"


# ------------------------------------------------------------------
# EOM-mode switching matrix (reference test_sequence.py:1185-1430)
# ------------------------------------------------------------------


def _eom_seq(device, parametrized=False):
    seq = tpu.Sequence(
        tpu.Register({"q0": (-3.0, 0.0), "q1": (3.0, 0.0)}), device
    )
    seq.declare_channel("rydberg", "rydberg_global")
    if parametrized:
        t = seq.declare_variable("t", dtype=int)
        seq.delay(t, "rydberg")
    seq.enable_eom_mode(
        "rydberg", amp_on=2.0, detuning_on=0.0, optimal_detuning_off=0.0
    )
    seq.add_eom_pulse("rydberg", 100, 0.0)
    seq.add_eom_pulse("rydberg", 100, 1.0)
    assert seq.is_in_eom_mode("rydberg")
    return seq


def _analog_with_eom(eom_config, name="ModAnalog"):
    ch = dataclasses.replace(
        AnalogDevice.channels["rydberg_global"], eom_config=eom_config
    )
    return dataclasses.replace(
        AnalogDevice, name=name, channel_objects=(ch,), channel_ids=None
    )


def test_eom_switch_needs_eom_channel():
    seq = _eom_seq(AnalogDevice)
    with pytest.warns(
        UserWarning, match="different Rydberg level"
    ), pytest.raises(
        TypeError,
        match="No match for channel 'rydberg' with an EOM"
        " configuration.",
    ):
        seq.with_new_device(DigitalAnalogDevice)


def test_eom_switch_mod_bandwidth_changes_samples():
    """Non-parametrized: a different EOM mod bandwidth shifts the
    inter-pulse interval, so the strict switch is refused with the
    culprit parameter named."""
    seq = _eom_seq(AnalogDevice)
    base_eom = AnalogDevice.channels["rydberg_global"].eom_config
    wrong = _analog_with_eom(
        dataclasses.replace(base_eom, mod_bandwidth=20)
    )
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="Changing the device produced a sequence with "
        "different samples for channel 'rydberg'.*"
        "'eom_config.mod_bandwidth'",
    ):
        seq.with_new_device(wrong, strict=True)


def test_eom_switch_parametrized_requires_equal_config():
    """Parametrized: EOM effects only appear at build time, so the
    configs must match outright."""
    seq = _eom_seq(AnalogDevice, parametrized=True)
    base_eom = AnalogDevice.channels["rydberg_global"].eom_config
    wrong = _analog_with_eom(
        dataclasses.replace(base_eom, mod_bandwidth=20)
    )
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="with the same EOM configuration",
    ):
        seq.with_new_device(wrong, strict=True)


def test_eom_switch_picks_the_good_channel():
    """With one wrong-EOM and one right-EOM channel on the new device,
    the matching settles on the compatible one."""
    seq = _eom_seq(AnalogDevice)
    good_ch = AnalogDevice.channels["rydberg_global"]
    wrong_ch = dataclasses.replace(
        good_ch,
        eom_config=dataclasses.replace(
            good_ch.eom_config, mod_bandwidth=20
        ),
    )
    two_ch = dataclasses.replace(
        AnalogDevice,
        name="TwoEom",
        channel_objects=(wrong_ch, good_ch),
        channel_ids=("wrong_eom", "good_eom"),
    )
    out = seq.with_new_device(two_ch, strict=True)
    assert out.declared_channels == {"rydberg": good_ch}


def test_eom_switch_limiting_amp_moves_detuning_off():
    """max_limiting_amp changes the EOM lightshift physics: strict
    refuses (with the tested-matchings digest), lax switches and the
    re-derived detuning_off moves while the on-setpoint stays."""
    seq = _eom_seq(AnalogDevice)
    base_eom = AnalogDevice.channels["rydberg_global"].eom_config
    og_block = seq._schedule["rydberg"].eom_blocks[0]

    mod_dev = _analog_with_eom(
        dataclasses.replace(
            base_eom, max_limiting_amp=5 * 2 * np.pi
        )
    )
    with pytest.raises(
        (ValueError, SwitchDeviceError),
        match="No matching found between declared channels and"
        ".*'eom_config.max_limiting_amp'",
    ):
        seq.with_new_device(mod_dev, strict=True)

    mod_seq = seq.with_new_device(mod_dev, strict=False)
    mod_block = mod_seq._schedule["rydberg"].eom_blocks[0]
    assert float(og_block.detuning_on) == float(mod_block.detuning_on)
    assert float(og_block.rabi_freq) == float(mod_block.rabi_freq)
    assert float(og_block.detuning_off) != float(
        mod_block.detuning_off
    )

    # An *extended* limiting amp preserves the whole setpoint under a
    # strict switch.
    up_dev = _analog_with_eom(
        dataclasses.replace(
            base_eom, max_limiting_amp=40 * 2 * np.pi
        ),
        name="UpAnalog",
    )
    up_seq = seq.with_new_device(up_dev, strict=True)
    up_block = up_seq._schedule["rydberg"].eom_blocks[0]
    assert float(og_block.detuning_on) == float(up_block.detuning_on)
    assert float(og_block.rabi_freq) == float(up_block.rabi_freq)
    assert float(og_block.detuning_off) == float(up_block.detuning_off)


# ------------------------------------------------------------------
# Strict time-slot preservation (reference test_sequence.py:1430-1569)
# ------------------------------------------------------------------


def _one_channel_device(base, **ch_changes):
    return dataclasses.replace(
        base,
        channel_objects=(
            dataclasses.replace(
                base.channels["rydberg_global"], **ch_changes
            ),
        ),
        channel_ids=("rydberg_global",),
    )


def test_strict_switch_checks_time_slots(reg):
    """A 103 ns pulse rounds to 104 ns (clock 4) vs 105 ns (clock 5):
    the strict switch must notice the slot drift and name the
    parameter."""
    import re

    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(103, 1.0, -1.0, 0.0), "ryd")
    with pytest.raises(
        SwitchDeviceError,
        match=re.escape(
            "Changing the device produced a sequence with "
            "different samples for channel 'ryd'. This may be due"
        ),
    ):
        seq.with_new_device(
            _one_channel_device(DigitalAnalogDevice, clock_period=5),
            strict=True,
        )


def test_strict_switch_parametrized_checks_clock_upfront(reg):
    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    delay_var = seq.declare_variable("delay", dtype=int)
    seq.delay(delay_var, "ryd")
    with pytest.raises(
        SwitchDeviceError,
        match="No match for channel 'ryd' with the same"
        " 'clock_period'.",
    ):
        seq.with_new_device(
            _one_channel_device(DigitalAnalogDevice, clock_period=5),
            strict=True,
        )


def test_strict_switch_identical_device_keeps_slots(reg):
    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, -1.0, 0.0), "ryd")
    out = seq.with_new_device(
        _one_channel_device(DigitalAnalogDevice), strict=True
    )
    assert out._schedule["ryd"].slots == seq._schedule["ryd"].slots


def test_strict_switch_parametrized_phase_jump_time(reg):
    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    phase_var = seq.declare_variable("phase", dtype=float)
    pulse = tpu.Pulse.ConstantPulse(100, 1.0, -1.0, 0.0)
    seq.add(pulse, "ryd")
    with pytest.warns(
        UserWarning, match="apply a phase shift to all qubits"
    ):
        seq.phase_shift(phase_var, basis="ground-rydberg")
    seq.add(pulse, "ryd")
    with pytest.raises(
        SwitchDeviceError,
        match="No match for channel 'ryd' with the same"
        " 'phase_jump_time'.",
    ):
        seq.with_new_device(
            _one_channel_device(
                DigitalAnalogDevice, custom_phase_jump_time=200
            ),
            strict=True,
        )


def test_strict_switch_checks_dmm_slots_too(reg):
    seq = tpu.Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(103, 1.0, -1.0, 0.0), "ryd")
    det_map = reg.define_detuning_map(
        {q: (1.0 if i < 3 else 0) for i, q in enumerate(reg.qubit_ids)}
    )
    seq.config_detuning_map(det_map, "dmm_0")
    seq.add_dmm_detuning(tpu.ConstantWaveform(107, -5), "dmm_0")
    modified = dataclasses.replace(
        DigitalAnalogDevice,
        dmm_objects=(
            dataclasses.replace(
                DigitalAnalogDevice.dmm_channels["dmm_0"],
                clock_period=5,
            ),
        ),
    )
    with pytest.raises(
        SwitchDeviceError,
        match="Changing the device produced a sequence with ",
    ):
        seq.with_new_device(modified, strict=True)
