"""Sequence construction API: declaration, targeting, phase, mappable.

Mirrors the behavior matrix of the reference's tests/test_sequence.py
sections not already covered by test_sequence_builder/edges/timing.
"""

from __future__ import annotations

import dataclasses
import warnings

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.register import (
    MappableRegister,
    Register,
    TriangularLatticeLayout,
)
from pulser_tpu.sampler import sample
from pulser_tpu.sequence._schedule import _TimeSlot


@pytest.fixture
def layout():
    return TriangularLatticeLayout(100, spacing=5)


@pytest.fixture
def reg(layout):
    return layout.rectangular_register(4, 7, prefix="q")


@pytest.fixture
def det_map(reg):
    return reg.define_detuning_map(
        {
            "q" + str(i): (1.0 if i in [0, 1, 3, 4] else 0)
            for i in range(10)
        }
    )


@pytest.fixture
def device():
    return dataclasses.replace(
        tpu.DigitalAnalogDevice,
        dmm_objects=(
            DMM(bottom_detuning=-70, total_bottom_detuning=-700),
            DMM(bottom_detuning=-100, total_bottom_detuning=-1000),
        ),
    )


class TestInit:
    def test_device_must_be_instance(self, reg):
        from pulser_tpu.devices._device_datacls import Device

        with pytest.raises(TypeError, match="BaseDevice"):
            tpu.Sequence(reg, Device)

    def test_fresh_sequence_state(self, reg, device):
        seq = tpu.Sequence(reg, device)
        assert Register(seq.qubit_info) == reg
        assert seq.declared_channels == {}
        assert set(seq.available_channels) == (
            set(device.channels) | set(device.dmm_channels)
        )
        assert seq.get_duration() == 0


class TestChannelDeclaration:
    def test_declaration_matrix(self, reg, device):
        seq = tpu.Sequence(reg, device)
        available = set(seq.available_channels)
        assert seq.get_addressed_bases() == ()
        assert seq.get_addressed_states() == []
        with pytest.raises(ValueError, match="dmm_"):
            seq.declare_channel("dmm_1_2", "raman")
        seq.declare_channel("ch0", "rydberg_global")
        assert seq.get_addressed_bases() == ("ground-rydberg",)
        assert seq.get_addressed_states() == ["r", "g"]
        seq.declare_channel("ch1", "raman_local")
        assert seq.get_addressed_bases() == (
            "ground-rydberg",
            "digital",
        )
        assert seq.get_addressed_states() == ["r", "g", "h"]
        with pytest.raises(ValueError, match="No channel"):
            seq.declare_channel("ch2", "raman")
        with pytest.raises(ValueError, match="not available"):
            seq.declare_channel("ch2", "rydberg_global")
        with pytest.raises(ValueError, match="already in use"):
            seq.declare_channel("ch0", "raman_local")
        # The initial target of a fresh Global channel is everything
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", -1, 0, set(seq.qubit_info.keys())
        )
        assert set(seq.available_channels) == available - {
            "rydberg_global",
            "raman_local",
        }

    def test_mock_device_reusable_channels(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        available = set(seq.available_channels)
        channel_map = {
            "ch0": "raman_local",
            "ch1": "rydberg_global",
            "ch2": "rydberg_global",
        }
        for name, channel_id in channel_map.items():
            seq.declare_channel(name, channel_id)
        # Only the microwave channel is consumed (basis conflict)
        assert set(seq.available_channels) == available - {"mw_global"}
        assert {
            seq._schedule[name].channel_id
            for name in seq.declared_channels
        } == set(channel_map.values())
        with pytest.raises(ValueError, match="Microwave"):
            seq.declare_channel("ch3", "mw_global")

    def test_xy_mode_exclusion(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ch0", "mw_global")
        assert set(seq.available_channels) == {"mw_global", "dmm_0"}
        with pytest.raises(ValueError, match="Microwave"):
            seq.declare_channel("ch3", "rydberg_global")
        assert seq.get_addressed_bases() == ("XY",)
        assert seq.get_addressed_states() == ["u", "d"]


class TestMagneticField:
    def test_outside_xy_mode(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        with pytest.raises(AttributeError, match="XY Mode"):
            seq.magnetic_field
        seq.declare_channel("ch0", "rydberg_global")
        with pytest.raises(ValueError, match="XY Mode"):
            seq.set_magnetic_field(1.0, 0.0, 0.0)

    def test_set_and_validate(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ch0", "mw_global")
        np.testing.assert_array_equal(
            seq.magnetic_field, (0.0, 0.0, 30.0)
        )
        seq.set_magnetic_field(bx=1.0, by=-1.0, bz=0.5)
        np.testing.assert_array_equal(
            seq.magnetic_field, (1.0, -1.0, 0.5)
        )
        with pytest.raises(ValueError, match="magnitude greater than 0"):
            seq.set_magnetic_field(bz=0.0)
        assert seq._empty_sequence
        seq.add(tpu.Pulse.ConstantPulse(100, 1, 1, 0), "ch0")
        assert not seq._empty_sequence
        with pytest.raises(ValueError, match="empty seq"):
            seq.set_magnetic_field(1.0, 0.0, 0.0)

    def test_dmm_blocks_xy(self, reg, det_map):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.config_detuning_map(det_map, "dmm_0")
        with pytest.raises(ValueError, match="XY Mode"):
            seq.set_magnetic_field(1.0, 0.0, 0.0)

    def test_slm_mask_allows_xy(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.config_slm_mask(["q0", "q1"], "dmm_0")
        seq.set_magnetic_field(1.0, 0.0, 0.0)
        # The DMM is used up by the SLM mask: only mw_global remains
        assert set(seq.available_channels) == {"mw_global"}
        assert list(seq.declared_channels) == []
        seq.declare_channel("ch0", "mw_global")
        assert list(seq.declared_channels) == ["ch0"]

    def test_field_first_then_declare(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.set_magnetic_field(1.0, 0.0, 0.0)
        assert set(seq.available_channels) == {"mw_global", "dmm_0"}
        seq.declare_channel("ch0", "mw_global")
        np.testing.assert_array_equal(
            seq.magnetic_field, (1.0, 0.0, 0.0)
        )
        var = seq.declare_variable("var")
        seq.add(tpu.Pulse.ConstantPulse(100, var, 1, 0), "ch0")
        assert seq.is_parametrized()
        # Parametrized additions also mark the sequence non-empty
        with pytest.raises(ValueError, match="empty seq"):
            seq.set_magnetic_field()


class TestTarget:
    def test_target_validation(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q1")
        seq.declare_channel("ch1", "rydberg_global")
        with pytest.raises(ValueError, match="declared channel"):
            seq.target("q0", "ch2")
        with pytest.raises(ValueError, match="qubit ids"):
            seq.target(0, "ch0")
        with pytest.raises(ValueError, match="qubit ids"):
            seq.target("0", "ch0")
        with pytest.raises(ValueError, match="'Local'"):
            seq.target("q3", "ch1")
        with pytest.raises(ValueError, match="at most 1 qubits"):
            seq.target(["q1", "q5"], "ch0")
        with pytest.raises(ValueError, match="at least one qubit"):
            seq.target([], "ch0")

    def test_retarget_timing(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q1")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", -1, 0, {"q1"}
        )
        retarget_t = seq.declared_channels["ch0"].min_retarget_interval
        seq.target("q4", "ch0")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", 0, retarget_t, {"q4"}
        )
        seq.target("q4", "ch0")  # same qubit: no new slot
        seq.target("q20", "ch0")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", retarget_t, 2 * retarget_t, {"q20"}
        )
        # After a long-enough delay, only the residual wait is added
        seq.delay(216, "ch0")
        ti = 2 * retarget_t + 216
        seq.target("q2", "ch0")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", ti, ti + 16, {"q2"}
        )
        # A delay longer than the retarget interval: instantaneous
        seq.delay(220, "ch0")
        ti = ti + 16 + 220
        seq.target("q1", "ch0")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", ti, ti, {"q1"}
        )
        seq.delay(100, "ch0")
        ti = ti + 100
        seq.target("q10", "ch0")
        assert seq._schedule["ch0"][-1] == _TimeSlot(
            "target", ti, ti + 120, {"q10"}
        )

    def test_unlimited_targets_and_phase_conflict(self, reg):
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel(
            "ch0", "raman_local", initial_target={"q1", "q10"}
        )
        assert seq.declared_channels["ch0"].max_targets is None
        seq.target(set(reg.qubit_ids) - {"q2"}, "ch0")
        seq.phase_shift(1, "q2")
        with pytest.raises(ValueError, match="different phase"):
            seq.target({"q3", "q1", "q2"}, "ch0")


class TestDelay:
    def test_delay_validation(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local")
        with pytest.raises(ValueError, match="declared channel"):
            seq.delay(1e3, "ch01")
        with pytest.raises(ValueError, match="no target"):
            seq.delay(100, "ch0")

    @pytest.mark.parametrize("at_rest", [True, False])
    def test_delay_slots(self, reg, device, at_rest):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local")
        seq.target("q19", "ch0")
        seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ch0")
        # Without a mod bandwidth, at_rest has no effect
        assert seq.declared_channels["ch0"].mod_bandwidth is None
        seq.delay(388, "ch0", at_rest)
        last_slot = _TimeSlot("delay", 100, 488, {"q19"})
        assert seq._last("ch0") == last_slot
        # A delay of 0 adds nothing
        seq.delay(0, "ch0", at_rest)
        assert seq._last("ch0") == last_slot

    def test_delay_extended_to_min_duration(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "rydberg_global")
        seq.declare_channel("ch1", "rydberg_local")
        seq.target("q0", "ch1")
        seq.add(tpu.Pulse.ConstantPulse(180, 1, 1, 0), "ch1")
        seq.add(tpu.Pulse.ConstantPulse(52, 1, 1, 0), "ch0")
        seq.target("q1", "ch1")
        seq.add(tpu.Pulse.ConstantPulse(180, 1, 1, 0), "ch1")
        min_duration = seq.declared_channels["ch1"].min_duration
        assert seq._schedule["ch1"][3] == _TimeSlot(
            "delay", 220, 220 + min_duration, {"q1"}
        )


class TestPhase:
    def test_phase_refs(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.phase_shift(-1, "q0", "q1")
        with pytest.raises(ValueError, match="qubit declared"):
            seq.current_phase_ref(0, "digital")
        with pytest.raises(ValueError, match="basis"):
            seq.current_phase_ref("q1", "ground-rydberg")
        with pytest.raises(ValueError, match="No declared channel"):
            seq.phase_shift(1, "q3", basis="hyperfine")
        assert seq.current_phase_ref("q0", "digital") == 2 * np.pi - 1

        # Phase shifts that are multiples of 2pi are no-ops
        seq.phase_shift(0, "q0")
        seq.phase_shift(-8 * np.pi, "q1")
        assert seq.current_phase_ref("q0", "digital") == 2 * np.pi - 1
        assert seq.current_phase_ref("q1", "digital") == 2 * np.pi - 1

        with pytest.raises(ValueError, match="qubit ids"):
            seq.phase_shift(np.pi, "q1", "q4", "q100")

    def test_global_phase_shift(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.declare_channel("ch1", "rydberg_global")
        with pytest.warns(UserWarning, match="all qubits"):
            seq.phase_shift(1, basis="ground-rydberg")
        for q in seq.qubit_info:
            assert seq.current_phase_ref(q, "ground-rydberg") == 1
        with pytest.warns(UserWarning, match="all qubits"):
            seq.phase_shift(1)  # defaults to the 'digital' basis
        assert seq.current_phase_ref("q1", "digital") == 1
        assert seq.current_phase_ref("q10", "digital") == 1

    def test_dmm_phase_isolation(self, reg, device, det_map):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch1", "rydberg_global")
        with pytest.warns(UserWarning, match="all qubits"):
            seq.phase_shift(1, basis="ground-rydberg")
        seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ch1")
        seq.config_detuning_map(det_map, "dmm_0")
        det_wf = tpu.RampWaveform(100, -10, -1)
        seq.add_dmm_detuning(det_wf, "dmm_0")
        # A one-qubit phase shift blocks global pulses on the basis...
        seq.phase_shift(1.0, "q0", basis="ground-rydberg")
        with pytest.raises(ValueError, match="different phase"):
            seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ch1")
        # ...but not DMM detuning additions
        seq.add_dmm_detuning(det_wf, "dmm_0")

        seq_samples = sample(seq)
        np.testing.assert_array_equal(
            seq_samples.channel_samples["ch1"].phase,
            seq.current_phase_ref("q1", basis="ground-rydberg"),
        )
        # The phase of DMM samples stays at zero
        np.testing.assert_array_equal(
            seq_samples.channel_samples["dmm_0"].phase, 0.0
        )


class TestAlign:
    def test_align_validation(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.declare_channel("ch1", "rydberg_global")
        with pytest.raises(ValueError, match="declared"):
            seq.align("ch0", "ch1", "ch2")
        with pytest.raises(ValueError, match="more than once"):
            seq.align("ch0", "ch1", "ch0")
        with pytest.raises(ValueError, match="at least two"):
            seq.align()
        with pytest.raises(ValueError, match="at least two"):
            seq.align("ch1")

    def test_align_equalizes_durations(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "rydberg_global")
        seq.declare_channel("ch1", "rydberg_local", initial_target="q0")
        seq.add(tpu.Pulse.ConstantPulse(500, 1, 0, 0), "ch0")
        seq.add(
            tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ch1",
            protocol="no-delay",
        )
        assert seq.get_duration("ch0") != seq.get_duration("ch1")
        seq.align("ch0", "ch1")
        assert seq.get_duration("ch0") == seq.get_duration("ch1")


class TestAddValidation:
    def test_add_matrix(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.declare_channel("ch2", "rydberg_global")
        with pytest.raises(TypeError):
            seq.add([1, 5, 3], "ch0")
        with pytest.raises(ValueError, match="amplitude"):
            seq.add(
                tpu.Pulse.ConstantPulse(
                    20, 2 * np.pi * 10, -2 * np.pi * 100, 0
                ),
                "ch2",
            )
        with pytest.raises(ValueError, match="detuning"):
            seq.add(
                tpu.Pulse.ConstantPulse(
                    500, 2 * np.pi, -2 * np.pi * 100, 0
                ),
                "ch0",
            )
        seq.phase_shift(np.pi, "q0", basis="ground-rydberg")
        with pytest.raises(ValueError, match="different phase"):
            seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ch2")
        with pytest.raises(ValueError, match="protocol"):
            seq.add(
                tpu.Pulse.ConstantPulse(100, 1, 0, 0),
                "ch0",
                protocol="now",
            )

    def test_duration_rounding_warning(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        pulse = tpu.Pulse.ConstantPulse(
            499, 2, -10, 0, post_phase_shift=np.pi
        )
        with pytest.warns(UserWarning, match="rounded up to 500 ns"):
            seq.add(pulse, "ch0")
        assert seq.get_duration("ch0") == 500

    def test_post_phase_shift_applies(self, reg, device):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.add(
            tpu.Pulse.ConstantPulse(
                500, 2, -10, 0, post_phase_shift=np.pi
            ),
            "ch0",
        )
        assert seq.current_phase_ref("q0", "digital") == np.pi


class TestStr:
    def test_basic_str_sorted_ids(self, device):
        seq = tpu.Sequence(
            Register({"q1": (0, 0), "q0": (5, 5)}), device
        )
        seq.declare_channel("ch2", "rydberg_global")
        assert str(seq) == (
            "Channel: ch2\n"
            "t: 0 | Initial targets: q0, q1 | Phase Reference: 0.0 \n\n"
        )

    def test_full_str(self, reg, device, det_map):
        seq = tpu.Sequence(reg, device)
        seq.declare_channel("ch0", "raman_local", initial_target="q0")
        seq.add(
            tpu.Pulse.ConstantPulse(
                500, 2, -10, 0, post_phase_shift=np.pi
            ),
            "ch0",
        )
        seq.delay(300, "ch0")
        seq.target("q7", "ch0")
        seq.config_detuning_map(det_map, "dmm_0")
        seq.add_dmm_detuning(tpu.ConstantWaveform(100, -10), "dmm_0")
        seq.add_dmm_detuning(tpu.RampWaveform(100, -10, 0), "dmm_0")
        seq.measure("digital")

        targets = ", ".join(sorted(reg.qubit_ids))
        expected_ch0 = (
            "Channel: ch0\n"
            "t: 0 | Initial targets: q0 | Phase Reference: 0.0 \n"
            "t: 0->500 | Pulse(Amp=2 rad/µs, Detuning=-10 rad/µs, "
            "Phase=0) | Targets: q0\n"
            "t: 500->800 | Delay \n"
            "t: 800->800 | Target: q7 | Phase Reference: 0.0"
        )
        expected_dmm = (
            f"\n\nChannel: dmm_0\nt: 0 | Initial targets: {targets} "
            "| Phase Reference: 0.0 "
            f"\nt: 0->100 | Detuning: -10 rad/µs | Targets: {targets}"
            "\nt: 100->200 | Detuning: Ramp(-10->0) rad/µs | "
            f"Targets: {targets}"
        )
        expected = (
            expected_ch0 + expected_dmm + "\n\nMeasured in basis: digital"
        )
        assert str(seq) == expected

    def test_mixed_id_types_not_printable(self, device):
        with pytest.warns(DeprecationWarning, match="QubitId"):
            seq = tpu.Sequence(
                Register({"q0": (0, 0), 1: (5, 5)}), device
            )
        seq.declare_channel("ch1", "rydberg_global")
        with pytest.raises(NotImplementedError, match="different types"):
            str(seq)


class TestMappableRegister:
    @pytest.mark.parametrize("with_dmm", [True, False])
    def test_workflow(self, layout, det_map, with_dmm):
        mapp_reg = layout.make_mappable_register(10)
        seq = tpu.Sequence(mapp_reg, tpu.DigitalAnalogDevice)
        assert seq.is_register_mappable()
        assert isinstance(seq.get_register(), MappableRegister)
        with pytest.raises(RuntimeError, match="register"):
            seq.get_register(include_mappable=False)
        reserved_qids = tuple(f"q{i}" for i in range(10))
        assert seq._qids == set(reserved_qids)
        with pytest.raises(RuntimeError, match="qubit info"):
            seq.qubit_info
        with pytest.raises(RuntimeError, match="register"):
            seq.register

        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.declare_channel("ryd_loc", "rydberg_local")
        # Local-only sequences print without warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            str(seq)
        seq.declare_channel("ryd_glob", "rydberg_global")
        n_global = 1
        if with_dmm:
            seq.config_detuning_map(det_map, "dmm_0")
            n_global += 1
        with pytest.warns(UserWarning, match="mappable register") as rec:
            str(seq)
        assert len(rec) == n_global

        seq.phase_shift_index(np.pi / 4, 0, basis="digital")
        seq.target_index(2, "ryd_loc")
        seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ryd_glob")
        if with_dmm:
            seq.add_dmm_detuning(
                tpu.RampWaveform(100, -10, 0), "dmm_0"
            )
        seq.add(tpu.Pulse.ConstantPulse(200, 1, 0, 0), "ram")
        seq.add(tpu.Pulse.ConstantPulse(100, 1, 0, 0), "ryd_loc")
        assert seq._last("ryd_glob").targets == set(reserved_qids)
        if with_dmm:
            assert seq._last("dmm_0").targets == set(reserved_qids)
        assert seq._last("ram").targets == {"q0"}
        assert seq._last("ryd_loc").targets == {"q2"}

        with pytest.raises(ValueError, match="'qubits' must be"):
            seq.build()
        with pytest.raises(ValueError, match="targeted but have not"):
            seq.build(qubits={"q1": 1, "q0": 10})
        with pytest.warns(UserWarning, match="No declared variables"):
            seq.build(qubits={"q2": 20, "q0": 10, "q1": 0}, a=5)
        with pytest.raises(ValueError, match="To declare 3 qubits"):
            seq.build(qubits={"q2": 20, "q0": 10, "q3": 0})

        built = seq.build(qubits={"q2": 20, "q0": 10, "q1": 0})
        assert built._last("ryd_glob").targets == {"q0", "q1", "q2"}
        # The original is unchanged; the build resolved the register
        assert seq.is_register_mappable()
        assert not built.is_register_mappable()
        init_call = seq._calls[0]
        assert init_call.name == "__init__"
        assert isinstance(
            init_call.kwargs["register"], MappableRegister
        )
        assert built.register == Register(
            {
                "q0": layout.traps_dict[10],
                "q1": layout.traps_dict[0],
                "q2": layout.traps_dict[20],
            }
        )
        with pytest.raises(ValueError, match="concrete register"):
            built.build(qubits={"q2": 20, "q0": 10, "q1": 0})
