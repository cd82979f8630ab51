"""Sequence-builder timing and rule tests, cross-checked vs reference.

Covers the scheduler's ns-exact semantics: conflict protocols, phase
jump buffers, fall times, retarget timing, align/delay/truncate, EOM
buffers and detuned delays, SLM auto-pulses and DMM detuning — each
scenario is built identically in this framework and in the reference
(pulser-core, importable from /root/reference) and the resulting
schedules must match slot for slot.
"""

from __future__ import annotations

import sys
import warnings

import numpy as np
import pytest

REF_PATH = "/root/reference/pulser-core"
sys.path.append(REF_PATH)

ref = pytest.importorskip("pulser")
import pulser.sampler as ref_sampler  # noqa: E402

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.sampler import sample as tpu_sample  # noqa: E402


def _slots(seq):
    """All slots of all channels as plain tuples."""
    out = {}
    for ch, sched in seq._schedule.items():
        out[ch] = [
            (
                str(s.type) if not isinstance(s.type, str) else s.type,
                s.ti,
                s.tf,
                tuple(sorted(map(str, s.targets))),
            )
            for s in sched
        ]
    return out


def _assert_same_schedule(seq_r, seq_t):
    assert seq_r.get_duration() == seq_t.get_duration()
    assert _slots(seq_r) == _slots(seq_t)
    samp_r = ref_sampler.sample(seq_r)
    samp_t = tpu_sample(seq_t)
    for ch in samp_r.channels:
        cr = samp_r.channel_samples[ch]
        ct = samp_t.channel_samples[ch]
        assert cr.duration == ct.duration, ch
        for q in ("amp", "det", "phase"):
            np.testing.assert_allclose(
                getattr(cr, q).as_array(detach=True),
                getattr(ct, q).as_array(detach=True),
                atol=1e-12,
                err_msg=f"{ch}/{q}",
            )


def both(build):
    """Runs a builder callback on both frameworks, returns the pair."""
    return build(ref), build(tpu)


# ---------------------------------------------------------------- timing


def test_phase_jump_buffer_between_pulses():
    """A phase change costs the channel's phase_jump_time."""

    def build(mod):
        # AnalogDevice's modulated channel has a real phase_jump_time
        seq = mod.Sequence(
            mod.Register({"q0": (0, 0), "q1": (0, 10)}),
            mod.AnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 1.0), "ryd")
        # Same phase again: no extra buffer beyond the fall time
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 1.0), "ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    ch = tpu.AnalogDevice.channels["rydberg_global"]
    assert ch.phase_jump_time > 0
    slots = list(seq_t._schedule["ryd"])
    pulse_tis = [s.ti for s in slots if not isinstance(s.type, str)]
    assert pulse_tis[0] == 0
    # Second pulse waits out the phase jump
    assert pulse_tis[1] - 100 >= ch.phase_jump_time
    # Third pulse (same phase) starts strictly earlier after its pulse
    assert pulse_tis[2] - (pulse_tis[1] + 100) < pulse_tis[1] - 100


def test_conflict_protocols_across_channels():
    """min-delay vs no-delay vs wait-for-all on overlapping targets."""
    for protocol in ("min-delay", "no-delay", "wait-for-all"):

        def build(mod, protocol=protocol):
            reg = mod.Register(
                {"q0": (0, 0), "q1": (0, 8), "q2": (8, 0)}
            )
            seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
            seq.declare_channel("ryd", "rydberg_global")
            seq.declare_channel("ram", "raman_local", initial_target="q0")
            seq.add(mod.Pulse.ConstantPulse(500, 1.0, 0.0, 0.0), "ram")
            seq.add(
                mod.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0),
                "ryd",
                protocol=protocol,
            )
            return seq

        seq_r, seq_t = both(build)
        _assert_same_schedule(seq_r, seq_t)
        pulse_slot = [
            s
            for s in seq_t._schedule["ryd"]
            if not isinstance(s.type, str)
        ][0]
        if protocol == "no-delay":
            assert pulse_slot.ti == 0
        else:
            # The global pulse must wait for the local one on q0
            assert pulse_slot.ti >= 500


def test_local_retarget_timing():
    """Retargeting costs fixed_retarget_t / min_retarget_interval."""

    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        seq.target("q1", "ram")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    ch = tpu.DigitalAnalogDevice.channels["raman_local"]
    target_slots = [
        s for s in seq_t._schedule["ram"] if s.type == "target"
    ]
    # The re-target (not the initial one) takes its minimum time
    retarget = target_slots[-1]
    assert retarget.tf - retarget.ti >= min(
        ch.fixed_retarget_t or 0, ch.min_retarget_interval or 0
    )


def test_delay_and_at_rest():
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.AnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
        seq.delay(100, "ryd", at_rest=True)
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)


def test_align_with_and_without_at_rest():
    for at_rest in (False, True):

        def build(mod, at_rest=at_rest):
            reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
            seq = mod.Sequence(reg, mod.MockDevice)
            seq.declare_channel("ryd", "rydberg_global")
            seq.declare_channel("ram", "raman_local", initial_target="q0")
            seq.add(mod.Pulse.ConstantPulse(500, 1.0, 0.0, 0.0), "ryd")
            seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
            seq.align("ryd", "ram", at_rest=at_rest)
            seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
            return seq

        seq_r, seq_t = both(build)
        _assert_same_schedule(seq_r, seq_t)


def test_align_validation():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError, match="at least two channels"):
        seq.align("ryd")
    with pytest.raises(ValueError, match="more than once"):
        seq.align("ryd", "ryd")
    with pytest.raises(ValueError, match="declared channels"):
        seq.align("ryd", "nope")


def test_truncate_mid_pulse_and_phase_refs():
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.MockDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            mod.Pulse.ConstantPulse(300, 1.0, 0.0, 0.0, 0.5), "ryd"
        )
        seq.add(mod.Pulse.ConstantPulse(300, 2.0, -1.0, 0.5), "ryd")
        seq.truncate(450)
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    # Cut pulses lose their post_phase_shift; refs match the reference
    for q in ("q0", "q1"):
        assert seq_t.current_phase_ref(
            q, basis="ground-rydberg"
        ) == pytest.approx(
            seq_r.current_phase_ref(q, basis="ground-rydberg")
        )


def test_truncate_through_delay():
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.MockDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(mod.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "ryd")
        seq.delay(400, "ryd")
        seq.add(mod.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "ryd")
        seq.truncate(500)
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    assert seq_t.get_duration() <= 500


# ------------------------------------------------------------------- EOM


def test_eom_block_timing_and_detuned_delays():
    def build(mod):
        seq = mod.Sequence(
            mod.Register({"q0": (0, 0), "q1": (0, 10)}), mod.AnalogDevice
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.enable_eom_mode("ryd", amp_on=3.0, detuning_on=0.0)
        seq.add_eom_pulse("ryd", duration=100, phase=0.0)
        seq.delay(200, "ryd")  # becomes a detuned delay
        seq.add_eom_pulse("ryd", duration=100, phase=0.0)
        seq.disable_eom_mode("ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    # During the EOM delay, the detuning sits at detuning_off
    eom_block = seq_t._schedule["ryd"].eom_blocks[0]
    samples = tpu_sample(seq_t).channel_samples["ryd"]
    pulses = [
        s
        for s in seq_t._schedule["ryd"]
        if not isinstance(s.type, str)
    ]
    gap_mid = (pulses[0].tf + pulses[1].ti) // 2
    det = samples.det.as_array(detach=True)
    assert det[gap_mid] == pytest.approx(
        float(eom_block.detuning_off), abs=1e-9
    )


def test_eom_phase_drift_correction_values():
    def build(mod):
        seq = mod.Sequence(
            mod.Register({"q0": (0, 0), "q1": (0, 10)}), mod.AnalogDevice
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.enable_eom_mode(
            "ryd",
            amp_on=2.0,
            detuning_on=0.0,
            optimal_detuning_off=-8.0,
            correct_phase_drift=True,
        )
        seq.add_eom_pulse(
            "ryd", duration=100, phase=0.0, correct_phase_drift=True
        )
        seq.delay(148, "ryd")
        seq.add_eom_pulse(
            "ryd", duration=100, phase=0.5, correct_phase_drift=True
        )
        seq.disable_eom_mode("ryd", correct_phase_drift=True)
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    for q in ("q0", "q1"):
        assert seq_t.current_phase_ref(
            q, basis="ground-rydberg"
        ) == pytest.approx(
            seq_r.current_phase_ref(q, basis="ground-rydberg")
        )


def test_modify_eom_setpoint():
    def build(mod):
        seq = mod.Sequence(
            mod.Register({"q0": (0, 0), "q1": (0, 10)}), mod.AnalogDevice
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
        seq.add_eom_pulse("ryd", duration=100, phase=0.0)
        seq.modify_eom_setpoint("ryd", amp_on=4.0, detuning_on=1.0)
        seq.add_eom_pulse("ryd", duration=100, phase=0.0)
        seq.disable_eom_mode("ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    blocks = seq_t._schedule["ryd"].eom_blocks
    assert len(blocks) == 2
    assert float(blocks[0].rabi_freq) == pytest.approx(2.0)
    assert float(blocks[1].rabi_freq) == pytest.approx(4.0)


def test_eom_mode_misuse_errors():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 10)}), tpu.AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(RuntimeError, match="must be in EOM mode"):
        seq.add_eom_pulse("ryd", duration=100, phase=0.0)
    with pytest.raises(RuntimeError, match="not in EOM mode"):
        seq.disable_eom_mode("ryd")
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
    with pytest.raises(RuntimeError, match="already in EOM mode"):
        seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
    # Regular pulses are blocked in EOM mode
    with pytest.raises(RuntimeError, match="EOM mode"):
        seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")


# --------------------------------------------------------------- SLM/DMM


def test_slm_auto_dmm_pulse_amplitude():
    """The masking DMM pulse aims for -10x max_amp, clamped."""

    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.config_slm_mask(["q0"])
        seq.add(mod.Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    dmm_slots = [
        s
        for s in seq_t._schedule["dmm_0"]
        if not isinstance(s.type, str)
    ]
    assert len(dmm_slots) == 1
    det0 = float(dmm_slots[0].type.detuning[0])
    bottom = tpu.DigitalAnalogDevice.dmm_channels["dmm_0"].bottom_detuning
    assert det0 == pytest.approx(max(-10 * 2.0, bottom))


def test_slm_mask_before_and_after_first_pulse():
    """Configuring the mask after pulses still masks the first one."""

    def build_before(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.config_slm_mask(["q1"])
        seq.add(mod.Pulse.ConstantPulse(150, 1.0, 0.0, 0.0), "ryd")
        return seq

    def build_after(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(mod.Pulse.ConstantPulse(150, 1.0, 0.0, 0.0), "ryd")
        seq.config_slm_mask(["q1"])
        return seq

    for build in (build_before, build_after):
        seq_r, seq_t = both(build)
        assert seq_r._slm_mask_time == seq_t._slm_mask_time
        _assert_same_schedule(seq_r, seq_t)


def test_dmm_detuning_with_weights():
    def build(mod):
        reg = mod.Register.square(2, spacing=6, prefix="q")
        seq = mod.Sequence(reg, mod.MockDevice)
        dmap = reg.define_detuning_map(
            {"q0": 1.0, "q1": 0.5, "q2": 0.0, "q3": 0.25}
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.config_detuning_map(dmap, "dmm_0")
        seq.add_dmm_detuning(
            mod.RampWaveform(200, -5.0, 0.0), "dmm_0"
        )
        seq.add(mod.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "ryd")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    nd_r = ref_sampler.sample(seq_r).to_nested_dict()
    nd_t = tpu_sample(seq_t).to_nested_dict()
    for q in ("q0", "q1", "q2", "q3"):
        np.testing.assert_allclose(
            nd_r["Local"]["ground-rydberg"][q]["det"],
            nd_t["Local"]["ground-rydberg"][q]["det"],
            atol=1e-12,
        )


def test_dmm_positive_detuning_rejected():
    reg = tpu.Register.square(2, spacing=6, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    dmap = reg.define_detuning_map({"q0": 1.0})
    seq.config_detuning_map(dmap, "dmm_0")
    with pytest.raises(ValueError, match="detuning"):
        seq.add_dmm_detuning(tpu.ConstantWaveform(100, +1.0), "dmm_0")


# ------------------------------------------------------------ phase refs


def test_phase_shift_propagates_to_pulse_phase():
    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.MockDevice)
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        seq.phase_shift(1.0, "q0", basis="digital")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.5), "ram")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    # The second pulse's phase carries the shifted reference
    last = [
        s for s in seq_t._schedule["ram"] if not isinstance(s.type, str)
    ][-1]
    assert float(last.type.phase) == pytest.approx((0.5 + 1.0) % (2 * np.pi))


def test_post_phase_shift_and_target_conflict():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 8)}), tpu.MockDevice
    )
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0, 0.3), "ram")
    assert seq.current_phase_ref("q0", "digital") == pytest.approx(0.3)
    assert seq.current_phase_ref("q1", "digital") == 0.0
    # Multi-target with diverging refs must be rejected
    with pytest.raises(ValueError, match="different phase references"):
        seq.target({"q0", "q1"}, "ram")


def test_phase_shift_index_and_target_index():
    def build(mod):
        reg = mod.Register({"a": (0, 0), "b": (0, 8)})
        seq = mod.Sequence(reg, mod.MockDevice)
        seq.declare_channel("ram", "raman_local", initial_target="a")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        seq.target_index(1, "ram")
        seq.phase_shift_index(0.9, 1, basis="digital")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        return seq

    seq_r, seq_t = both(build)
    _assert_same_schedule(seq_r, seq_t)
    assert seq_t.current_phase_ref("b", "digital") == pytest.approx(0.9)


def test_estimate_added_delay_matches_actual():
    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.DigitalAnalogDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(mod.Pulse.ConstantPulse(300, 1.0, 0.0, 0.0), "ram")
        return seq

    seq_r, seq_t = both(build)
    pulse_r = ref.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0)
    pulse_t = tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0)
    est_r = seq_r.estimate_added_delay(pulse_r, "ryd")
    est_t = seq_t.estimate_added_delay(pulse_t, "ryd")
    assert est_r == est_t
    before = seq_t.get_duration("ryd")
    seq_t.add(pulse_t, "ryd")
    pulse_slot = [
        s for s in seq_t._schedule["ryd"] if not isinstance(s.type, str)
    ][-1]
    assert pulse_slot.ti - before == est_t


# ------------------------------------------------------------- rules


def test_measurement_blocks_further_instructions():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    seq.measure("ground-rydberg")
    assert seq.is_measured()
    assert seq.get_measurement_basis() == "ground-rydberg"
    with pytest.raises(RuntimeError):
        seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")


def test_measure_invalid_basis():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("mw", "mw_global")
    with pytest.raises(ValueError, match="not supported"):
        seq.measure("ground-rydberg")  # XY mode only measures XY
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq.measure("XY")


def test_channel_declaration_rules():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"),
        tpu.DigitalAnalogDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError, match="already in use"):
        seq.declare_channel("ryd", "raman_local")
    with pytest.raises(ValueError, match="No channel"):
        seq.declare_channel("x", "bogus_channel")
    with pytest.raises(ValueError, match="not available"):
        #

        seq.declare_channel("ryd2", "rydberg_global")
    with pytest.raises(ValueError, match="reserved for DMM"):
        seq.declare_channel("dmm_foo", "raman_local")


def test_xy_and_ising_channels_exclude_each_other():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("mw", "mw_global")
    with pytest.raises(ValueError, match="cannot work simultaneously"):
        seq.declare_channel("ryd", "rydberg_global")

    seq2 = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq2.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError, match="cannot work simultaneously"):
        seq2.declare_channel("mw", "mw_global")


def test_magnetic_field_rules():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    with pytest.raises(AttributeError, match="only defined"):
        seq.magnetic_field
    seq.set_magnetic_field(1.0, 0.0, 0.0)
    np.testing.assert_array_equal(
        seq.magnetic_field, np.array([1.0, 0.0, 0.0])
    )
    seq.declare_channel("mw", "mw_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "mw")
    with pytest.raises(ValueError, match="empty sequence"):
        seq.set_magnetic_field(0.0, 1.0, 0.0)
    # Ising sequences refuse magnetic fields once channels exist
    seq2 = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq2.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError, match="XY Mode"):
        seq2.set_magnetic_field()


def test_global_channel_target_rejected():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6, prefix="q"), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError, match="Local"):
        seq.target("q0", "ryd")


def test_str_parity_smoke():
    def build(mod):
        reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = mod.Sequence(reg, mod.MockDevice)
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
        seq.target("q1", "ram")
        seq.delay(100, "ram")
        seq.measure("digital")
        return seq

    seq_r, seq_t = both(build)
    assert str(seq_r) == str(seq_t)
