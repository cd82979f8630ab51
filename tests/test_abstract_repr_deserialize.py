"""Hand-built abstract-repr payload deserialization matrices.

Mirrors the reference's TestDeserialization op/waveform/parametrized
matrices (/root/reference/tests/test_abstract_repr.py:1990-2500):
every payload below is constructed by hand (never produced by our own
serializer) so these tests pin the *wire format*, not the round trip.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.parametrized import ParamObj, Variable
from pulser_tpu.parametrized.variable import VariableItem
from pulser_tpu.pulse import Pulse
from pulser_tpu.waveforms import (
    BlackmanWaveform,
    CompositeWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
    RampWaveform,
    Waveform,
)

VAR1 = {"expression": "index", "lhs": {"variable": "var1"}, "rhs": 0}
VAR2 = {"expression": "index", "lhs": {"variable": "var2"}, "rhs": 0}


def _serialized_seq(operations=(), variables=None, **overrides):
    seq_dict = {
        "version": "1",
        "name": "pulser-exported",
        "device": json.loads(tpu.DigitalAnalogDevice.to_abstract_repr()),
        "register": [
            {"name": "q0", "x": 0.0, "y": 2.0},
            {"name": "q42", "x": -2.0, "y": 9.0},
            {"name": "q666", "x": 12.0, "y": 0.0},
        ],
        "channels": {
            "digital": "raman_local",
            "global": "rydberg_global",
        },
        "operations": list(operations),
        "variables": variables or {},
        "measurement": None,
    }
    seq_dict.update(overrides)
    return seq_dict


# Waveform kinds whose serialized form is re-expressed through another
# constructor (from_max_val resolves to a concrete duration).
_SPECIAL_WFS = {
    "blackman_max": (
        BlackmanWaveform.from_max_val,
        ("max_val", "area"),
    ),
    "kaiser_max": (
        KaiserWaveform.from_max_val,
        ("max_val", "area", "beta"),
    ),
}


def _check_roundtrip(serialized_seq):
    """Payload -> Sequence -> payload is the identity (mod stamps)."""
    from pulser_tpu.json.abstract_repr.serializer import (
        AbstractReprEncoder,
    )

    s = json.loads(json.dumps(serialized_seq))
    for op in s["operations"]:
        if op["op"] == "pulse":
            for wf in ("amplitude", "detuning"):
                if op[wf]["kind"] in _SPECIAL_WFS:
                    ctor, arg_names = _SPECIAL_WFS[op[wf]["kind"]]
                    if any(
                        isinstance(op[wf][a], dict) for a in arg_names
                    ):
                        continue  # parametrized: kept as-is
                    rebuilt = ctor(*(op[wf][a] for a in arg_names))
                    op[wf] = json.loads(
                        json.dumps(
                            rebuilt._to_abstract_repr(),
                            cls=AbstractReprEncoder,
                        )
                    )
    seq = tpu.Sequence.from_abstract_repr(json.dumps(s))
    defaults = {
        name: var["value"]
        for name, var in s["variables"].items()
        if "value" in var
    }
    out = json.loads(
        seq.to_abstract_repr(seq_name=s["name"], **defaults)
    )
    expected = dict(s)
    expected["pulser_version"] = out["pulser_version"]
    assert out == expected


class TestNonParametrizedOps:
    @pytest.mark.parametrize(
        "op",
        [
            {"op": "target", "target": 2, "channel": "digital"},
            {"op": "target", "target": [1, 2], "channel": "digital"},
            {"op": "delay", "time": 500, "channel": "global"},
            {
                "op": "delay",
                "time": 500,
                "channel": "global",
                "at_rest": True,
            },
            {"op": "align", "channels": ["digital", "global"]},
            {
                "op": "align",
                "channels": ["digital", "global"],
                "at_rest": False,
            },
            {
                "op": "phase_shift",
                "phi": 42,
                "targets": [0, 2],
                "basis": "digital",
            },
            {
                "op": "phase_shift",
                "phi": 2,
                "targets": [],
                "basis": "digital",
            },
            {
                "op": "pulse",
                "channel": "global",
                "phase": 1,
                "post_phase_shift": 2,
                "protocol": "min-delay",
                "amplitude": {
                    "kind": "constant",
                    "duration": 1000,
                    "value": 3.14,
                },
                "detuning": {
                    "kind": "ramp",
                    "duration": 1000,
                    "start": 1,
                    "stop": 5,
                },
            },
            {"op": "truncate", "duration": 1000},
        ],
        ids=lambda op: op["op"],
    )
    def test_op_becomes_expected_call(self, op):
        import contextlib
        import warnings as _warnings

        s = _serialized_seq(
            operations=[op],
            device=json.loads(tpu.MockDevice.to_abstract_repr()),
        )
        empty_phase_shift = (
            op["op"] == "phase_shift" and not op["targets"]
        )
        catcher = (
            pytest.warns(UserWarning, match="all qubits")
            if empty_phase_shift
            else contextlib.nullcontext()
        )
        with catcher:
            _check_roundtrip(s)
        with _warnings.catch_warnings():
            if empty_phase_shift:
                _warnings.simplefilter("ignore", UserWarning)
            seq = tpu.Sequence.from_abstract_repr(json.dumps(s))

        offset = 1 + len(s["channels"])  # init + channel declarations
        assert len(seq._calls) == offset + 1
        assert len(seq._to_build_calls) == 0

        c = seq._calls[offset]
        if op["op"] == "target":
            assert c.name == "target_index"
            assert c.kwargs["qubits"] == op["target"]
            assert c.kwargs["channel"] == op["channel"]
        elif op["op"] == "align":
            assert c.name == "align"
            assert c.args == tuple(op["channels"])
            assert c.kwargs.get("at_rest", True) == op.get(
                "at_rest", True
            )
        elif op["op"] == "delay":
            assert c.name == "delay"
            assert c.kwargs["duration"] == op["time"]
            assert c.kwargs["channel"] == op["channel"]
            assert c.kwargs.get("at_rest", False) == op.get(
                "at_rest", False
            )
        elif op["op"] == "phase_shift":
            assert c.name == "phase_shift_index"
            assert c.args == (op["phi"], *op["targets"])
            assert c.kwargs["basis"] == "digital"
        elif op["op"] == "pulse":
            assert c.name == "add"
            assert c.kwargs["channel"] == op["channel"]
            assert c.kwargs["protocol"] == op["protocol"]
            pulse = c.kwargs["pulse"]
            assert isinstance(pulse, Pulse)
            assert pulse.phase == op["phase"]
            assert pulse.post_phase_shift == op["post_phase_shift"]
            assert isinstance(pulse.amplitude, Waveform)
            assert isinstance(pulse.detuning, Waveform)
        else:
            assert op["op"] == "truncate"
            assert c.name == "truncate"
            assert c.kwargs["duration"] == op["duration"]


class TestNonParametrizedWaveforms:
    @pytest.mark.parametrize(
        "wf_obj",
        [
            {"kind": "constant", "duration": 1200, "value": 3.14},
            {
                "kind": "ramp",
                "duration": 1200,
                "start": 1.14,
                "stop": 3,
            },
            {"kind": "blackman", "duration": 1200, "area": 2 * 3.14},
            {"kind": "blackman_max", "max_val": 5, "area": 2 * 3.14},
            {
                "kind": "interpolated",
                "duration": 2000,
                "values": [1, 1.5, 1.7, 1.3],
                "times": [0, 0.4, 0.8, 0.9],
            },
            {
                "kind": "kaiser",
                "duration": 2000,
                "area": 12,
                "beta": 1.1,
            },
            {
                "kind": "kaiser_max",
                "max_val": 6,
                "area": 12,
                "beta": 1.1,
            },
            {
                "kind": "composite",
                "waveforms": [
                    {"kind": "constant", "duration": 104, "value": 1},
                    {"kind": "constant", "duration": 208, "value": 2},
                    {"kind": "constant", "duration": 312, "value": 3},
                ],
            },
            {
                "kind": "custom",
                "samples": [i / 10 for i in range(0, 20)],
            },
        ],
        ids=lambda wf: wf["kind"],
    )
    def test_waveform_reconstruction(self, wf_obj):
        s = _serialized_seq(
            operations=[
                {
                    "op": "pulse",
                    "channel": "global",
                    "phase": 1,
                    "post_phase_shift": 2,
                    "protocol": "min-delay",
                    "amplitude": wf_obj,
                    "detuning": wf_obj,
                }
            ]
        )
        _check_roundtrip(s)
        seq = tpu.Sequence.from_abstract_repr(json.dumps(s))

        offset = 1 + len(s["channels"])
        assert len(seq._calls) == offset + 1
        assert len(seq._to_build_calls) == 0

        wf = seq._calls[offset].kwargs["pulse"].amplitude
        kind = wf_obj["kind"]
        if kind == "constant":
            assert isinstance(wf, ConstantWaveform)
            assert wf.duration == wf_obj["duration"]
            assert wf._value == wf_obj["value"]
        elif kind == "ramp":
            assert isinstance(wf, RampWaveform)
            assert wf.duration == wf_obj["duration"]
            assert wf._start == wf_obj["start"]
            assert wf._stop == wf_obj["stop"]
        elif kind == "blackman":
            assert isinstance(wf, BlackmanWaveform)
            assert wf.duration == wf_obj["duration"]
            assert float(wf._area) == wf_obj["area"]
        elif kind == "blackman_max":
            assert isinstance(wf, BlackmanWaveform)
            assert float(wf._area) == wf_obj["area"]
            assert (
                wf.duration
                == BlackmanWaveform.from_max_val(
                    wf_obj["max_val"], wf_obj["area"]
                ).duration
            )
        elif kind == "interpolated":
            assert isinstance(wf, InterpolatedWaveform)
            assert np.array_equal(wf._values, wf_obj["values"])
            assert np.array_equal(wf._times, wf_obj["times"])
        elif kind == "kaiser":
            assert isinstance(wf, KaiserWaveform)
            assert wf.duration == wf_obj["duration"]
            assert float(wf._area) == wf_obj["area"]
            assert float(wf._beta) == wf_obj["beta"]
        elif kind == "kaiser_max":
            assert isinstance(wf, KaiserWaveform)
            assert float(wf._area) == wf_obj["area"]
            assert float(wf._beta) == wf_obj["beta"]
            assert (
                wf.duration
                == KaiserWaveform.from_max_val(
                    wf_obj["max_val"], wf_obj["area"], wf_obj["beta"]
                ).duration
            )
        elif kind == "composite":
            assert isinstance(wf, CompositeWaveform)
            assert all(
                isinstance(w, Waveform) for w in wf._waveforms
            )
        else:
            assert kind == "custom"
            assert isinstance(wf, CustomWaveform)
            assert np.array_equal(wf._samples, wf_obj["samples"])


def test_deserialize_measurement():
    s = _serialized_seq()
    _check_roundtrip(s)
    s["measurement"] = "ground-rydberg"
    seq = tpu.Sequence.from_abstract_repr(json.dumps(s))
    assert seq._measurement == "ground-rydberg"
    assert seq.is_measured()


class TestParametrizedOps:
    @pytest.mark.parametrize(
        "op",
        [
            {"op": "target", "target": VAR1, "channel": "digital"},
            {
                "op": "target",
                "target": {"variable": "var1"},
                "channel": "digital",
            },
            {"op": "delay", "time": VAR2, "channel": "global"},
            {
                "op": "delay",
                "time": VAR2,
                "channel": "global",
                "at_rest": True,
            },
            {
                "op": "phase_shift",
                "phi": VAR1,
                "targets": [2, VAR1],
                "basis": "ground-rydberg",
            },
            {
                "op": "pulse",
                "channel": "global",
                "phase": VAR1,
                "post_phase_shift": VAR2,
                "protocol": "min-delay",
                "amplitude": {
                    "kind": "constant",
                    "duration": VAR2,
                    "value": 3.14,
                },
                "detuning": {
                    "kind": "ramp",
                    "duration": VAR2,
                    "start": 1,
                    "stop": 5,
                },
            },
            {
                "op": "pulse_arbitrary_phase",
                "channel": "global",
                "post_phase_shift": VAR2,
                "protocol": "min-delay",
                "amplitude": {
                    "kind": "constant",
                    "duration": VAR2,
                    "value": 3.14,
                },
                "phase": {
                    "kind": "ramp",
                    "duration": VAR2,
                    "start": 1,
                    "stop": 0,
                },
            },
            {"op": "truncate", "duration": VAR2},
        ],
        ids=lambda op: op["op"],
    )
    def test_parametrized_op_becomes_deferred_call(self, op):
        s = _serialized_seq(
            operations=[op],
            variables={
                "var1": {"type": "int", "value": [0]},
                "var2": {"type": "int", "value": [44]},
            },
        )
        _check_roundtrip(s)
        seq = tpu.Sequence.from_abstract_repr(json.dumps(s))

        offset = 1 + len(s["channels"])
        assert len(seq._calls) == offset
        assert len(seq._to_build_calls) == 1

        c = seq._to_build_calls[0]
        if op["op"] == "target":
            assert c.name == "target_index"
            target_type = (
                VariableItem
                if "expression" in op["target"]
                else Variable
            )
            assert isinstance(c.kwargs["qubits"], target_type)
            assert c.kwargs["channel"] == op["channel"]
        elif op["op"] == "delay":
            assert c.name == "delay"
            assert c.kwargs["channel"] == op["channel"]
            assert isinstance(c.kwargs["duration"], VariableItem)
            assert c.kwargs.get("at_rest", False) == op.get(
                "at_rest", False
            )
        elif op["op"] == "phase_shift":
            assert c.name == "phase_shift_index"
            assert isinstance(c.args[0], VariableItem)
            assert c.args[1] == 2
            assert isinstance(c.args[2], VariableItem)
            assert c.kwargs["basis"] == "ground-rydberg"
        elif "pulse" in op["op"]:
            assert c.name == "add"
            pulse = c.kwargs["pulse"]
            assert isinstance(pulse, ParamObj)
            assert isinstance(
                pulse.kwargs["post_phase_shift"], VariableItem
            )
            assert isinstance(pulse.kwargs["amplitude"], ParamObj)
            assert issubclass(pulse.kwargs["amplitude"].cls, Waveform)
            time_mod = (
                "detuning" if op["op"] == "pulse" else "phase"
            )
            assert isinstance(pulse.kwargs[time_mod], ParamObj)
            assert issubclass(pulse.kwargs[time_mod].cls, Waveform)
        else:
            assert op["op"] == "truncate"
            assert c.name == "truncate"
            assert isinstance(c.kwargs["duration"], VariableItem)

    @pytest.mark.parametrize(
        "amp_obj, det_obj, pulse_cls",
        [
            (
                {"kind": "constant", "duration": VAR2, "value": 3.14},
                {
                    "kind": "ramp",
                    "duration": VAR2,
                    "start": 1,
                    "stop": 5,
                },
                "Pulse",
            ),
            (
                {"kind": "constant", "duration": 0, "value": 3.14},
                {
                    "kind": "ramp",
                    "duration": VAR2,
                    "start": 1,
                    "stop": 5,
                },
                "ConstantAmplitude",
            ),
            (
                {"kind": "constant", "duration": VAR2, "value": 3.14},
                {"kind": "constant", "duration": 0, "value": 1},
                "ConstantDetuning",
            ),
        ],
    )
    def test_zero_duration_constants_fold(
        self, amp_obj, det_obj, pulse_cls
    ):
        op = {
            "op": "pulse",
            "channel": "global",
            "phase": VAR1,
            "post_phase_shift": VAR2,
            "protocol": "min-delay",
            "amplitude": amp_obj,
            "detuning": det_obj,
        }
        s = _serialized_seq(
            operations=[op],
            variables={
                "var1": {"type": "int", "value": [0]},
                "var2": {"type": "int", "value": [42]},
            },
        )
        _check_roundtrip(s)
        seq = tpu.Sequence.from_abstract_repr(json.dumps(s))
        pulse = seq._to_build_calls[0].kwargs["pulse"]
        assert isinstance(pulse, ParamObj)
        assert pulse.cls.__name__ == pulse_cls
        assert isinstance(
            pulse.kwargs["post_phase_shift"], VariableItem
        )
        if pulse_cls == "ConstantAmplitude":
            # A 0-duration constant amplitude collapses to its value
            assert pulse.kwargs["amplitude"] == 3.14
            assert isinstance(pulse.kwargs["detuning"], ParamObj)
        elif pulse_cls == "ConstantDetuning":
            assert pulse.kwargs["detuning"] == 1
            assert isinstance(pulse.kwargs["amplitude"], ParamObj)
        else:
            assert isinstance(pulse.kwargs["amplitude"], ParamObj)
            assert isinstance(pulse.kwargs["detuning"], ParamObj)

    def test_built_parametrized_sequence_runs(self):
        op = {
            "op": "pulse",
            "channel": "global",
            "phase": VAR1,
            "post_phase_shift": 0,
            "protocol": "min-delay",
            "amplitude": {
                "kind": "blackman_max",
                "max_val": 2,
                "area": VAR2,
            },
            "detuning": {"kind": "constant", "duration": 0, "value": 0},
        }
        s = _serialized_seq(
            operations=[op],
            variables={
                "var1": {"type": "float", "value": [0.5]},
                "var2": {"type": "float", "value": [1.0]},
            },
        )
        seq = tpu.Sequence.from_abstract_repr(json.dumps(s))
        built = seq.build(var1=[0.5], var2=[np.pi / 2])
        assert not built.is_parametrized()
        slot = built._last("global")
        assert np.isclose(
            float(slot.type.amplitude.integral), np.pi / 2
        )


def test_top_level_abstract_repr_shim():
    """Import-parity for the pulser_tpu.abstract_repr alias module.

    Mirrors /root/reference/pulser-core/pulser/abstract_repr.py:16-21:
    the five deserialize_* aliases resolve to the real implementations
    and round-trip a register, layout, noise model and device.
    """
    from pulser_tpu import abstract_repr as ar
    from pulser_tpu.json.abstract_repr import deserializer as impl

    assert ar.deserialize_sequence is impl.deserialize_abstract_sequence
    assert ar.deserialize_layout is impl.deserialize_abstract_layout
    assert ar.deserialize_register is impl.deserialize_abstract_register
    assert ar.deserialize_noise_model is impl.deserialize_abstract_noise_model
    assert ar.deserialize_device is impl.deserialize_device
    assert set(ar.__all__) == {
        "deserialize_layout",
        "deserialize_noise_model",
        "deserialize_register",
        "deserialize_sequence",
        "deserialize_device",
    }

    dev = ar.deserialize_device(tpu.DigitalAnalogDevice.to_abstract_repr())
    assert dev == tpu.DigitalAnalogDevice
    reg = tpu.Register.square(2, spacing=5.0, prefix="q")
    reg2 = ar.deserialize_register(reg.to_abstract_repr())
    assert reg2 == reg
