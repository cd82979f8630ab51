"""Timing-exact sequence-builder cases from the reference corpus.

Ports the nanosecond-exact scheduling expectations of
``/root/reference/tests/test_sequence.py``: modulation/fall-time
buffers and retarget timing on constrained hardware (``:2472``), EOM
entry buffers (``:3017``), the ``modify_eom_setpoint`` sample matrix
(``:3069``), at-rest delays (``:1652``), max-duration enforcement
(``:3142``), measurement blocking (``:1846``), emptiness tracking
(``:3232``), and multi-index targeting (``:2795``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from pulser_tpu import Pulse, Sequence
from pulser_tpu.channels import Raman, Rydberg
from pulser_tpu.devices import Device, DigitalAnalogDevice
from pulser_tpu.register.special_layouts import (
    TriangularLatticeLayout,
)
from pulser_tpu.sampler import sample
from pulser_tpu.waveforms import BlackmanWaveform


@pytest.fixture
def reg():
    layout = TriangularLatticeLayout(100, spacing=5)
    return layout.rectangular_register(4, 7, prefix="q")


def _constrained_device():
    """The reference's ConstrainedChadoq2 (test_sequence.py:2473)."""
    rydberg_global = Rydberg.Global(
        2 * np.pi * 20,
        2 * np.pi * 2.5,
        clock_period=4,
        mod_bandwidth=4,  # MHz
    )
    raman_local = Raman.Local(
        2 * np.pi * 20,
        2 * np.pi * 10,
        min_retarget_interval=220,
        fixed_retarget_t=200,  # ns
        max_targets=1,
        clock_period=4,
        mod_bandwidth=7,  # MHz
    )
    return Device(
        name="ConstrainedChadoq2",
        dimensions=2,
        rydberg_level=70,
        max_atom_num=100,
        max_radial_distance=50,
        min_atom_distance=4,
        channel_objects=(rydberg_global, raman_local),
    )


@pytest.mark.parametrize("align_at_rest", [True, False])
def test_hardware_constraints_timing(reg, align_at_rest):
    """Exact modulation buffers, fall times and retarget timings."""
    device = _constrained_device()
    rydberg_global = device.channels["rydberg_global"]
    raman_local = device.channels["raman_local"]

    seq = Sequence(reg, device)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "raman_local", initial_target="q1")

    const_pls = Pulse.ConstantPulse(100, 1, 0, np.pi)
    seq.add(const_pls, "ch0")
    black_wf = BlackmanWaveform(500, np.pi)
    black_pls = Pulse.ConstantDetuning(black_wf, 0, 0)
    seq.add(black_pls, "ch1")
    blackman_slot = seq._last("ch1")
    # The cross-channel wait accounts for ch0's modulation rise buffer
    assert (
        blackman_slot.ti
        == const_pls.duration + rydberg_global.rise_time * 2
    )

    seq.target("q0", "ch1")
    target_slot = seq._last("ch1")
    fall_time = black_pls.fall_time(raman_local)
    assert (
        fall_time
        == raman_local.rise_time
        + black_wf.modulation_buffers(raman_local)[1]
    )
    fall_time += (
        raman_local.clock_period
        - fall_time % raman_local.clock_period
    )
    assert target_slot.ti == blackman_slot.tf + fall_time
    assert (
        target_slot.tf
        == target_slot.ti + raman_local.fixed_retarget_t
    )

    # Retargeting within min_retarget_interval pads up to it
    assert (
        raman_local.min_retarget_interval
        > raman_local.fixed_retarget_t
    )
    seq.target("q2", "ch1")
    assert (
        seq.get_duration("ch1")
        == target_slot.tf + raman_local.min_retarget_interval
    )

    # Phase jump buffer: pi -> 0 phase change waits phase_jump_time
    seq.add(black_pls, "ch0")  # Phase = 0
    tf_ = seq.get_duration("ch0")
    mid_delay = 40
    seq.delay(mid_delay, "ch0")
    seq.add(const_pls, "ch0")  # Phase = pi
    interval = seq._schedule["ch0"].adjust_duration(
        rydberg_global.phase_jump_time
        + black_pls.fall_time(rydberg_global)
    )
    assert seq._schedule["ch0"][-1].ti - tf_ == interval
    added_delay_slot = seq._schedule["ch0"][-2]
    assert added_delay_slot.type == "delay"
    assert (
        added_delay_slot.tf - added_delay_slot.ti
        == interval - mid_delay
    )

    # 'no-delay' suppresses the phase jump buffer
    seq.add(black_pls, "ch0", protocol="no-delay")  # Phase = 0
    assert seq._schedule["ch0"][-1].ti == seq._schedule["ch0"][-2].tf

    # align(at_rest=True) also waits for ch0's fall time
    tf_ = seq.get_duration("ch0")
    seq.align("ch0", "ch1", at_rest=align_at_rest)
    fall_time = black_pls.fall_time(rydberg_global)
    assert fall_time > 0
    assert (
        seq.get_duration()
        == seq.get_duration("ch1")
        == seq.get_duration("ch0")
        == seq._schedule["ch0"].adjust_duration(
            tf_ + fall_time * align_at_rest
        )
    )


@pytest.mark.parametrize("initial_instruction", [None, "delay", "add"])
@pytest.mark.parametrize("non_zero_detuning_off", [True, False])
def test_eom_entry_buffer(
    reg, mod_device, initial_instruction, non_zero_detuning_off
):
    """EOM-mode entry buffer contents (reference :3017)."""
    seq = Sequence(reg, mod_device)
    seq.declare_channel("ch0", "rydberg_local", initial_target="q0")
    seq.declare_channel("other", "rydberg_global")
    phase = 0.0
    if initial_instruction == "delay":
        seq.delay(16, "ch0")
    elif initial_instruction == "add":
        phase = np.pi
        seq.add(Pulse.ConstantPulse(16, 1, 0, np.pi), "ch0")
    eom_block_starts = seq.get_duration(
        "ch0", include_fall_time=True
    )
    eom_block_starts = seq._schedule["ch0"].adjust_duration(
        eom_block_starts
    )

    eom_config = seq.declared_channels["ch0"].eom_config
    limit_rabi_freq = eom_config.max_limiting_amp**2 / (
        2 * eom_config.intermediate_detuning
    )
    amp_on = limit_rabi_freq * (
        1.1 if non_zero_detuning_off else 0.5
    )

    # EOM mode ignores other channels ("no-delay" semantics)
    seq.add(Pulse.ConstantPulse(100, 1, -1, 0), "other")
    seq.enable_eom_mode("ch0", amp_on, 0)
    assert len(seq._schedule["ch0"].eom_blocks) == 1
    eom_block = seq._schedule["ch0"].eom_blocks[0]
    if non_zero_detuning_off:
        assert eom_block.detuning_off != 0
    else:
        assert eom_block.detuning_off == 0
    if not initial_instruction:
        assert seq.get_duration(channel="ch0") == 0
    else:
        last_slot = seq._schedule["ch0"][-1]
        assert last_slot.ti == eom_block_starts
        duration = last_slot.tf - last_slot.ti
        # The buffer is a detuning_off pulse (or a plain delay)
        if non_zero_detuning_off:
            assert last_slot.type == Pulse.ConstantPulse(
                duration, 0.0, eom_block.detuning_off, phase
            )
        else:
            assert last_slot.type == "delay"


def _eom_detuning_on(max_abs_detuning: float, label: str) -> float:
    return {"NULL": 0, "MAX": -max_abs_detuning}[label]


@pytest.mark.parametrize("correct_phase_drift", [True, False])
@pytest.mark.parametrize("amp_diff", [0, -0.5, 0.5])
@pytest.mark.parametrize("det_diff", [0, -5, 10])
@pytest.mark.parametrize("detuning_on_str", ["NULL", "MAX"])
def test_modify_eom_setpoint_samples(
    reg,
    mod_device,
    amp_diff,
    det_diff,
    correct_phase_drift,
    detuning_on_str,
):
    """Exact sample series around an EOM setpoint change (ref :3069)."""
    seq = Sequence(reg, mod_device)
    seq.declare_channel("ryd", "rydberg_global")
    params = seq.declare_variable("params", dtype=float, size=2)
    dt = 100
    amp, det_on = params[0], params[1]
    with pytest.raises(
        RuntimeError, match="The 'ryd' channel is not in EOM mode"
    ):
        seq.modify_eom_setpoint("ryd", amp, det_on)
    seq.enable_eom_mode("ryd", amp, det_on)
    assert seq.is_in_eom_mode("ryd")
    seq.add_eom_pulse("ryd", dt, 0.0)
    seq.delay(dt, "ryd")

    new_amp, new_det_on = amp + amp_diff, det_on + det_diff
    seq.modify_eom_setpoint(
        "ryd",
        new_amp,
        new_det_on,
        correct_phase_drift=correct_phase_drift,
    )
    assert seq.is_in_eom_mode("ryd")
    seq.add_eom_pulse("ryd", dt, 0.0)
    seq.delay(dt, "ryd")

    ryd_ch_obj = seq.declared_channels["ryd"]
    eom_buffer_dt = ryd_ch_obj._eom_buffer_time
    detuning_on = _eom_detuning_on(
        ryd_ch_obj.max_abs_detuning, detuning_on_str
    )
    param_vals = [1.0, detuning_on]
    if (det_diff, detuning_on_str) == (-5, "MAX"):
        # detuning_on falls below -max_abs_detuning: build must fail
        assert detuning_on + det_diff < -ryd_ch_obj.max_abs_detuning
        with pytest.raises(
            ValueError,
            match="The pulse's detuning values go out of the range",
        ):
            seq.build(params=param_vals)
        return
    assert detuning_on + det_diff >= -ryd_ch_obj.max_abs_detuning
    built_seq = seq.build(params=param_vals)
    expected_duration = 4 * dt + eom_buffer_dt
    assert built_seq.get_duration() == expected_duration

    amp, det = param_vals
    ch_samples = sample(built_seq).channel_samples["ryd"]
    expected_amp = np.zeros(expected_duration)
    expected_amp[:dt] = amp
    expected_amp[-2 * dt : -dt] = amp + amp_diff
    np.testing.assert_array_equal(
        expected_amp, np.asarray(ch_samples.amp)
    )

    det_off = ryd_ch_obj.eom_config.calculate_detuning_off(
        amp, det, 0.0
    )
    new_det_off = ryd_ch_obj.eom_config.calculate_detuning_off(
        amp + amp_diff, det + det_diff, 0.0
    )
    expected_det = np.zeros(expected_duration)
    expected_det[:dt] = det
    expected_det[dt : 2 * dt] = det_off
    expected_det[2 * dt : 2 * dt + eom_buffer_dt] = new_det_off
    expected_det[-2 * dt : -dt] = det + det_diff
    expected_det[-dt:] = new_det_off
    np.testing.assert_array_equal(
        expected_det, np.asarray(ch_samples.det)
    )

    final_phase = built_seq.current_phase_ref("q0", "ground-rydberg")
    if not correct_phase_drift:
        assert final_phase == 0.0
    else:
        assert final_phase != 0.0
    phase_arr = np.asarray(ch_samples.phase)
    np.testing.assert_array_equal(phase_arr[: 2 * dt], 0.0)
    np.testing.assert_array_equal(phase_arr[-2 * dt :], final_phase)


def test_max_duration_enforced(reg, mod_device):
    """max_sequence_duration rejects instructions past the cap."""
    device = dataclasses.replace(
        mod_device, max_sequence_duration=100
    )
    seq = Sequence(reg, device)
    seq.declare_channel("ryd", "rydberg_global")
    seq.delay(100, "ryd")
    catch = pytest.raises(
        RuntimeError, match="exceeded the maximum duration"
    )
    with catch:
        seq.delay(16, "ryd")
    with catch:
        seq.add(Pulse.ConstantPulse(16, 1, 0, 0), "ryd")


def test_add_to_dmm_fails(reg):
    """Regular pulses can't go onto a DMM channel (ref :3156)."""
    device = dataclasses.replace(
        DigitalAnalogDevice,
        dmm_objects=(
            dataclasses.replace(
                DigitalAnalogDevice.dmm_objects[0],
                total_bottom_detuning=-1000,
            ),
        ),
    )
    det_map = reg.define_detuning_map(
        {"q" + str(i): (1.0 if i < 2 else 0) for i in range(10)}
    )
    seq = Sequence(reg, device)
    seq.config_detuning_map(det_map, "dmm_0")
    pulse = Pulse.ConstantPulse(100, 0, -1, 0)
    with pytest.raises(
        ValueError, match="can't be used on a DMM channel"
    ):
        seq.add(pulse, "dmm_0")
    seq.declare_channel("ryd_glob", "rydberg_global")
    with pytest.raises(
        ValueError, match="can't be used on a DMM channel"
    ):
        seq.add(pulse, "dmm_0")


@pytest.mark.parametrize(
    "call, args",
    [
        ("declare_channel", ("ch1", "rydberg_global")),
        ("add", (Pulse.ConstantPulse(100, 1, 0, 0), "ch0")),
        ("target", ("q1", "ch0")),
        ("delay", (100, "ch0")),
        ("align", ("ch0", "ch01")),
        ("measure", tuple()),
    ],
)
def test_block_if_measured(reg, call, args):
    """After measure(), every mutating call raises (ref :1846)."""
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_local", initial_target="q0")
    # Check that all checks are performed before the measurement
    with pytest.raises(
        ValueError, match="Use the name of a declared channel."
    ):
        seq.delay(100, "ch")
    seq.measure(basis="ground-rydberg")
    with pytest.raises(
        RuntimeError, match="sequence has been measured"
    ):
        getattr(seq, call)(*args)


def test_phase_shift_allowed_after_measure(reg):
    """Virtual-Z phase shifts stay legal post-measure (parity with the
    reference, where phase_shift carries no measured-sequence block)."""
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_local", initial_target="q0")
    seq.measure(basis="ground-rydberg")
    seq.phase_shift(np.pi, "q0", basis="ground-rydberg")
    assert seq.current_phase_ref("q0", "ground-rydberg") == np.pi


def test_sequence_is_empty_tracking(reg, mod_device):
    """Emptiness flips only on content (delay/pulse), ref :3232."""
    seq = Sequence(reg, mod_device)
    assert seq.is_empty()
    seq.declare_channel("ch0", "rydberg_global")
    assert seq.is_empty()
    seq.delay(16, "ch0")
    assert not seq.is_empty()

    seq2 = Sequence(reg, mod_device)
    seq2.declare_channel("ch1", "rydberg_local", initial_target="q0")
    assert seq2.is_empty()  # initial target is not content
    seq2.add(Pulse.ConstantPulse(16, 1, 0, 0), "ch1")
    assert not seq2.is_empty()


def test_multiple_index_targets(reg):
    """target_index with several indices + variables (ref :2795)."""
    test_device = Device(
        name="test_device",
        dimensions=2,
        rydberg_level=70,
        max_atom_num=100,
        max_radial_distance=50,
        min_atom_distance=4,
        channel_objects=(
            Raman.Local(2 * np.pi * 20, 2 * np.pi * 10, max_targets=2),
        ),
    )

    seq = Sequence(reg, test_device)
    var_array = seq.declare_variable("var_array", size=2, dtype=int)
    seq.declare_channel("ch0", "raman_local")

    seq.target_index([0, 1], channel="ch0")
    assert seq._last("ch0").targets == {"q0", "q1"}

    seq.target_index(var_array, channel="ch0")
    built_seq = seq.build(var_array=[1, 2])
    assert built_seq._last("ch0").targets == {"q1", "q2"}

    seq.target_index(var_array + 1, channel="ch0")
    built_seq = seq.build(var_array=[1, 2])
    assert built_seq._last("ch0").targets == {"q2", "q3"}
