"""Sequence edge-case corpus: truncate through EOM/target, delays at
rest inside EOM mode, DMM added-delay estimation, register switching
and parametrized index functions.

Mirrors the behaviors of ``/root/reference/tests/test_sequence.py``
(``test_truncate_eom`` :3351, ``test_truncate_target`` :3416,
``test_delay_at_rest`` :1652, ``test_estimate_added_delay_dmm``
:2113, ``test_switch_register`` :579,
``test_parametrized_index_functions`` :2727). Where the scenario is
device-portable it is built identically on the reference (importable
from /root/reference) and on this framework and the outcomes must
agree.
"""

from __future__ import annotations

import re
import sys

import pytest

REF_PATH = "/root/reference/pulser-core"
if REF_PATH not in sys.path:
    sys.path.append(REF_PATH)

ref = pytest.importorskip("pulser")

import pulser_tpu as tpu  # noqa: E402


def both(build):
    """Runs a builder callback on both frameworks, returns the pair."""
    return build(ref), build(tpu)


@pytest.fixture
def reg():
    return tpu.Register.square(2, spacing=6.0, prefix="q")


# --------------------------------------------------------- truncate/EOM


def _eom_truncate_seq(mod):
    """Delay, EOM block with two pulses, disable, trailing delay —
    then a parametrized truncate. Returns (seq, landmarks)."""
    seq = mod.Sequence(
        mod.Register.square(2, spacing=6.0, prefix="q"),
        mod.AnalogDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.delay(100, "ryd")  # leaves room for the EOM entry buffer
    seq.enable_eom_mode("ryd", 1, 0)
    eom_start = seq.get_duration()
    seq.add_eom_pulse("ryd", 200, phase=1, post_phase_shift=1)
    seq.delay(100, "ryd")
    seq.add_eom_pulse("ryd", 200, phase=2, post_phase_shift=1)
    eom_end = seq.get_duration()
    seq.disable_eom_mode("ryd")
    end_buffer_t = seq.get_duration()
    seq.delay(100, "ryd")
    t = seq.declare_variable("t", dtype=int)
    seq.truncate(t)
    return seq, (eom_start, eom_end, end_buffer_t)


def test_truncate_eom_landmarks_match_reference():
    (seq_r, lm_r), (seq_t, lm_t) = both(_eom_truncate_seq)
    assert lm_r == lm_t


def test_truncate_eom_blocks_then_measures():
    _, (seq, _) = both(_eom_truncate_seq)
    with pytest.raises(
        RuntimeError, match="can only be measured"
    ):
        seq.delay(100, "ryd")
    seq.measure()
    assert seq.is_measured()


@pytest.mark.parametrize("framework_idx", [0, 1])
def test_truncate_inside_eom_entry_buffer_removes_enable(
    framework_idx,
):
    built_pair = []
    for pair in both(_eom_truncate_seq):
        seq, (eom_start, _, _) = pair
        seq.measure()
        with pytest.warns(
            UserWarning,
            match=re.escape(
                "'enable_eom_mode()' instruction on channel 'ryd'"
            ),
        ):
            built_pair.append(seq.build(t=eom_start - 1))
    built = built_pair[framework_idx]
    assert not built.is_in_eom_mode("ryd")
    assert built.get_duration() == 100
    assert built.is_measured()


def test_truncate_mid_eom_pulse_and_delay():
    for pair in both(_eom_truncate_seq):
        seq, (eom_start, _, _) = pair
        seq.measure()
        # Mid first EOM pulse: cut to the clock grid, still in EOM
        built = seq.build(t=eom_start + 101)
        assert built.is_in_eom_mode("ryd")
        assert built.get_duration() == eom_start + 100
        # Mid the in-EOM delay
        built = seq.build(t=eom_start + 219)
        assert built.is_in_eom_mode("ryd")
        assert built.get_duration() == eom_start + 216


def test_truncate_inside_eom_exit_buffer_removes_disable():
    for pair in both(_eom_truncate_seq):
        seq, (_, eom_end, end_buffer_t) = pair
        seq.measure()
        with pytest.warns(
            UserWarning,
            match=re.escape(
                "'disable_eom_mode()' instruction on channel 'ryd'"
            ),
        ):
            built = seq.build(t=end_buffer_t - 1)
        assert built.is_in_eom_mode("ryd")
        assert built.get_duration() == eom_end


def test_truncate_at_eom_exit_buffer_end_preserves_disable():
    for pair in both(_eom_truncate_seq):
        seq, (_, _, end_buffer_t) = pair
        built = seq.build(t=end_buffer_t)
        assert not built.is_in_eom_mode("ryd")
        assert built.get_duration() == end_buffer_t


def _target_truncate_seq(mod):
    seq = mod.Sequence(
        mod.Register.square(2, spacing=6.0, prefix="q"),
        mod.DigitalAnalogDevice,
    )
    seq.declare_channel("raman", "raman_local", initial_target="q0")
    start_t = seq.get_duration()
    seq.target("q1", "raman")
    end_t = seq.get_duration()
    t = seq.declare_variable("t", dtype=int)
    seq.truncate(t)
    return seq, (start_t, end_t)


def test_truncate_target_removed():
    for pair in both(_target_truncate_seq):
        seq, (start_t, end_t) = pair
        assert end_t > start_t  # retargeting takes time on this device
        with pytest.raises(
            RuntimeError, match="can only be measured"
        ):
            seq.delay(100, "raman")
        seq.measure(basis="digital")
        with pytest.warns(
            UserWarning,
            match=re.escape(
                "'target()' instruction on channel 'raman'"
            ),
        ):
            built = seq.build(t=end_t - 1)
        assert built.get_duration() == start_t
        assert built.is_measured()


# ------------------------------------------------------ delay at rest


@pytest.mark.parametrize("delay_duration", [200, 0])
@pytest.mark.parametrize("at_rest", [True, False])
@pytest.mark.parametrize("in_eom", [True, False])
def test_delay_at_rest_matches_reference(
    in_eom, at_rest, delay_duration
):
    """``delay(..., at_rest=True)`` extends to the modulated tail;
    inside EOM mode both frameworks agree on the detuned-delay
    timing (reference ``test_sequence.py:1652``)."""

    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6.0, prefix="q"),
            mod.AnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        if in_eom:
            seq.enable_eom_mode("ryd", 1, 0)
            seq.add_eom_pulse("ryd", 100, 0.0)
        else:
            seq.add(
                mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd"
            )
        if delay_duration:
            seq.delay(delay_duration, "ryd", at_rest=at_rest)
        else:
            # A zero-length delay must be legal and add nothing
            # beyond the at-rest extension
            seq.delay(delay_duration, "ryd", at_rest=at_rest)
        return seq.get_duration()

    dur_r, dur_t = both(build)
    assert dur_r == dur_t


# ------------------------------------------- DMM added-delay estimate


def test_estimate_added_delay_dmm():
    """Delay estimation against a DMM channel validates the pulse
    like an add would (reference ``test_sequence.py:2113``)."""

    def build(mod):
        pulse_0 = mod.Pulse.ConstantPulse(100, 1, 0, 0)
        det_pulse = mod.Pulse.ConstantPulse(100, 0, -1, 0)
        seq = mod.Sequence(
            mod.Register.square(2, 5, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel("ising", "rydberg_global")
        seq.config_slm_mask(["q0", "q1"])
        with pytest.raises(
            ValueError,
            match="You should add a Pulse to a Global Channel",
        ):
            seq.estimate_added_delay(det_pulse, "dmm_0")
        seq.add(pulse_0, "ising")
        est = seq.estimate_added_delay(det_pulse, "dmm_0")
        with pytest.raises(
            ValueError,
            match="The detuning in a DMM must not be positive.",
        ):
            seq.estimate_added_delay(
                mod.Pulse.ConstantPulse(100, 0, 1, 0), "dmm_0"
            )
        with pytest.raises(
            ValueError,
            match="The pulse's amplitude goes over the maximum",
        ):
            seq.estimate_added_delay(pulse_0, "dmm_0")
        return est

    est_r, est_t = both(build)
    assert est_r == est_t == 0


# ------------------------------------------------- register switching


def test_with_new_register_requires_same_ids(reg):
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    # Same ids, different positions: fine
    moved = tpu.Register.rectangle(1, 4, spacing=9.0, prefix="q")
    new_seq = seq.with_new_register(moved)
    assert new_seq.get_duration() == seq.get_duration()
    assert new_seq.register == moved


def test_with_new_register_missing_targeted_id(reg):
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("raman", "raman_local", initial_target="q3")
    other = tpu.Register.rectangle(1, 3, spacing=9.0, prefix="q")
    with pytest.raises((ValueError, KeyError)):
        seq.with_new_register(other)


def test_with_new_register_warns_on_detuning_map(reg):
    seq = tpu.Sequence(reg, tpu.MockDevice)
    det_map = reg.define_detuning_map(
        {"q0": 1.0, "q1": 0.0, "q2": 0.0, "q3": 0.0}
    )
    seq.config_detuning_map(det_map, "dmm_0")
    moved = tpu.Register.rectangle(1, 4, spacing=9.0, prefix="q")
    with pytest.warns(UserWarning, match="detuning map"):
        seq.with_new_register(moved)


def test_switch_register_deprecated_alias(reg):
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    moved = tpu.Register.rectangle(1, 4, spacing=9.0, prefix="q")
    with pytest.warns(DeprecationWarning, match="switch_register"):
        new_seq = seq.switch_register(moved)
    assert new_seq.register == moved


def test_with_new_register_keeps_variables(reg):
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(
        tpu.Pulse.ConstantPulse(100, amp, 0.0, 0.0), "ryd"
    )
    moved = tpu.Register.rectangle(1, 4, spacing=9.0, prefix="q")
    new_seq = seq.with_new_register(moved)
    assert set(new_seq.declared_variables) == {"amp"}
    built = new_seq.build(amp=1.5)
    assert built.get_duration() == 100


# -------------------------------------- parametrized index functions


def test_parametrized_target_index(reg):
    """``target_index`` accepts a Variable and resolves at build
    (reference ``test_sequence.py:2727``)."""

    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6.0, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel(
            "raman", "raman_local", initial_target="q0"
        )
        idx = seq.declare_variable("idx", dtype=int)
        seq.target_index(idx, "raman")
        seq.add(
            mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "raman"
        )
        built = seq.build(idx=2)
        return built

    built_r, built_t = both(build)
    last_r = [s for s in built_r._schedule["raman"]][-1]
    last_t = [s for s in built_t._schedule["raman"]][-1]
    assert tuple(map(str, last_r.targets)) == tuple(
        map(str, last_t.targets)
    )
    assert str(next(iter(last_t.targets))) == "q2"


def test_parametrized_phase_shift_index(reg):
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6.0, prefix="q"),
            mod.DigitalAnalogDevice,
        )
        seq.declare_channel(
            "raman", "raman_local", initial_target="q0"
        )
        idx = seq.declare_variable("idx", dtype=int)
        seq.add(
            mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "raman"
        )
        seq.phase_shift_index(0.5, idx, basis="digital")
        built = seq.build(idx=1)
        return built.current_phase_ref("q1", basis="digital")

    ph_r, ph_t = both(build)
    assert ph_r == pytest.approx(ph_t)
    assert ph_t == pytest.approx(0.5)


def test_index_functions_reject_out_of_range(reg):
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("raman", "raman_local", initial_target="q0")
    idx = seq.declare_variable("idx", dtype=int)
    seq.target_index(idx, "raman")
    with pytest.raises(IndexError):
        seq.build(idx=7)


def test_non_parametrized_index_functions_work_directly(reg):
    """Index functions are usable outside any parametrized context
    (reference ``test_sequence.py:2774``)."""
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("raman", "raman_local", initial_target="q0")
    seq.target_index(3, "raman")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "raman")
    last = [s for s in seq._schedule["raman"]][-1]
    assert tuple(map(str, last.targets)) == ("q3",)
    seq.phase_shift_index(0.25, 3, basis="digital")
    assert seq.current_phase_ref(
        "q3", basis="digital"
    ) == pytest.approx(0.25)


def test_with_new_register_preserves_phase_refs(reg):
    """Global phase shifts replay onto the new register's qubits,
    including ones that didn't exist before (reference
    test_sequence.py:579-640)."""
    import pulser_tpu as tpu
    from pulser_tpu.devices import DigitalAnalogDevice

    seq = tpu.Sequence(
        tpu.Register({"q0": (0.0, 0.0), "q1": (8.0, 0.0)}),
        DigitalAnalogDevice,
    )
    seq.declare_channel("raman", "raman_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(1000, 1, -1, 2), "raman")
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.warns(
        UserWarning, match="apply a phase shift to all qubits"
    ):
        seq.phase_shift(3.0, basis="digital")
    new_reg = tpu.Register({"q0": (0.0, 0.0), "q1": (10.0, 10.0)})
    # The replay re-runs the global phase_shift, warning again.
    with pytest.warns(
        UserWarning, match="apply a phase shift to all qubits"
    ):
        new_seq = seq.with_new_register(new_reg)
    assert new_seq.declared_variables == seq.declared_variables
    assert not new_seq.is_parametrized()
    assert new_seq._calls[1:] == seq._calls[1:]
    assert float(
        new_seq.current_phase_ref("q0", basis="digital")
    ) == pytest.approx(3.0)
    assert float(
        new_seq.current_phase_ref("q1", basis="digital")
    ) == pytest.approx(3.0)
    # Pulse targets replayed onto the new register
    slot = new_seq._schedule["raman"][1]
    assert slot.targets == {"q0"}


def test_with_new_register_remaps_slm_weight_map(reg):
    """An SLM mask's auto detuning map follows the new coordinates:
    weights stay keyed by qubit id (reference test_sequence.py:664)."""
    import pulser_tpu as tpu
    from pulser_tpu.devices import MockDevice

    seq = tpu.Sequence(
        tpu.Register({"q0": (0.0, 0.0), "q1": (8.0, 0.0)}), MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.config_slm_mask(["q0"])
    import numpy as np

    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(200, np.pi / 2), 0.0, 0.0
        ),
        "ryd",
    )
    assert "dmm_0" in seq.declared_channels
    new_reg = tpu.Register({"q0": (2.0, 2.0), "q1": (12.0, 12.0)})
    # No detuning-map warning here: the DMM comes from the SLM mask,
    # whose targets are ids, not coordinates (ref :664 warns only for
    # explicitly configured maps).
    new_seq = seq.with_new_register(new_reg)
    new_wmap = new_seq._schedule[
        "dmm_0"
    ].detuning_map.get_qubit_weight_map(new_reg.qubits)
    assert new_wmap["q0"] == 1.0
    assert new_wmap["q1"] == 0.0
