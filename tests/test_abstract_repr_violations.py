"""Abstract-repr failure matrix, mirroring the reference's paranoia.

Ports the per-field failure cases and schema-violation matrix of
``/root/reference/tests/test_abstract_repr.py``: signature-binding
errors (``:1006``), qubit-id collisions, unknown recorded calls
(``:1072``), encoder outputs (``:1090``), the expression
deserialization matrix (``:2802``), parameter exceptions (``:2920``),
unknown waveform kinds (``:2944``) and bad top-level payloads
(``:2985``).
"""

from __future__ import annotations

import json
from unittest.mock import patch

import numpy as np
import pytest

import pulser_tpu
from pulser_tpu import Pulse, Register, Sequence
from pulser_tpu.devices import DigitalAnalogDevice
from pulser_tpu.exceptions.serialization import AbstractReprError
from pulser_tpu.json.abstract_repr.serializer import (
    AbstractReprEncoder,
    abstract_repr,
)
from pulser_tpu.parametrized.paramobj import ParamObj
from pulser_tpu.sequence._call import _Call
from pulser_tpu.waveforms import InterpolatedWaveform


def _get_serialized_seq(
    operations: list | None = None,
    variables: dict | None = None,
    **override_kwargs,
) -> dict:
    seq_dict = {
        "version": "1",
        "name": "John Doe",
        "device": json.loads(DigitalAnalogDevice.to_abstract_repr()),
        "register": [
            {"name": "q0", "x": 0.0, "y": 2.0},
            {"name": "q42", "x": -2.0, "y": 9.0},
            {"name": "q666", "x": 12.0, "y": 0.0},
        ],
        "channels": {
            "digital": "raman_local",
            "global": "rydberg_global",
        },
        "operations": operations or [],
        "variables": variables or {},
        "measurement": None,
        "pulser_version": pulser_tpu.__version__,
    }
    seq_dict.update(override_kwargs)
    return seq_dict


# --- serializer-side violations -----------------------------------


def test_signature_binding_errors():
    """abstract_repr's binding failure modes (reference :1008)."""
    with pytest.raises(
        ValueError, match="No signature found for 'FakeWaveform'"
    ):
        abstract_repr("FakeWaveform", 100, 1)
    with pytest.raises(ValueError, match="Not enough arguments"):
        abstract_repr("ConstantWaveform", 1000)
    with pytest.raises(
        ValueError, match="Too many positional arguments"
    ):
        abstract_repr("ConstantWaveform", 1000, 1, 4)
    with pytest.raises(
        ValueError, match="'foo' is not in the signature"
    ):
        abstract_repr("ConstantWaveform", 1000, 1, foo=0)
    # Positional spill into keyword slots is allowed...
    out = abstract_repr("KaiserWaveform", 1000, np.pi, 10.0)
    assert out["beta"] == 10.0
    # ...but not past slots already taken by kwargs
    with pytest.raises(
        ValueError, match="Too many positional arguments"
    ):
        abstract_repr("KaiserWaveform", 1000, np.pi, 10.0, beta=5.0)
    # Missing positional supplied as kwarg is accepted
    out = abstract_repr("ConstantWaveform", 1000, value=2.0)
    assert out == {
        "kind": "constant",
        "duration": 1000,
        "value": 2.0,
    }


def test_register_name_collision():
    with pytest.warns(
        UserWarning, match="converts all qubit ID's to strings"
    ), pytest.raises(
        AbstractReprError, match="Name collisions encountered"
    ), pytest.warns(
        DeprecationWarning,
        match="Usage of `int`s or any non-`str`types as `QubitId`s",
    ):
        Register({"0": (0, 0), 0: (20, 20)})._to_abstract_repr()


def test_interpolated_waveform_export_restrictions():
    with pytest.deprecated_call(
        match="Setting 'interpolator' to \"interp1d\"",
    ), pytest.raises(
        AbstractReprError,
        match="Export of an InterpolatedWaveform is only supported "
        "for the 'PchipInterpolator'",
    ):
        InterpolatedWaveform(
            1000, [0, 1, 0], interpolator="interp1d"
        )._to_abstract_repr()


def test_invalid_defaults_rejected():
    seq = Sequence(Register.square(2, prefix="q"), DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(Pulse.ConstantPulse(100, amp, 0, 0), "ch0")
    with pytest.raises(
        ValueError,
        match="The given 'defaults' produce an invalid sequence.",
    ):
        seq.to_abstract_repr(amp=-1.0)  # negative amplitude


@pytest.mark.parametrize(
    "call",
    [
        _Call("targets", ({"q0", "q1"}, "ch0"), {}),
        _Call(
            "phase_shifts",
            (1.0, "q2", "q3"),
            dict(basis="ground-rydberg"),
        ),
        _Call("wait", (100,), {}),
    ],
)
def test_unknown_calls(call):
    seq = Sequence(Register.square(2, prefix="q"), DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq._calls.append(call)
    with pytest.raises(
        AbstractReprError, match=f"Unknown call '{call.name}'."
    ):
        seq.to_abstract_repr()


@pytest.mark.parametrize(
    "obj,serialized_obj",
    [
        (
            Register({"q0": (0.0, 0.0)}),
            [dict(name="q0", x=0.0, y=0.0)],
        ),
        (np.arange(3), [0, 1, 2]),
        ({"a"}, ["a"]),
        (np.float64(1.5), 1.5),
        (np.int32(7), 7),
        (complex(1, 0), 1.0),
        (complex(1, 2), dict(real=1.0, imag=2.0)),
    ],
    ids=[
        "register",
        "np.array",
        "set",
        "np.float",
        "np.int",
        "real_complex",
        "complex",
    ],
)
def test_abstract_repr_encoder(obj, serialized_obj):
    assert json.dumps(obj, cls=AbstractReprEncoder) == json.dumps(
        serialized_obj
    )


# --- deserializer-side violations ---------------------------------

VAR1 = {"variable": "var1"}


@pytest.mark.parametrize(
    "json_param",
    [
        {"expression": "neg", "lhs": VAR1},
        {"expression": "abs", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "ceil", "lhs": VAR1},
        {"expression": "floor", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "sqrt", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "exp", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "log", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "log2", "lhs": VAR1},
        {"expression": "sin", "lhs": VAR1},
        {"expression": "cos", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}},
        {"expression": "tan", "lhs": VAR1},
        {"expression": "index", "lhs": VAR1, "rhs": 0},
        {"expression": "index", "lhs": {"variable": "var2"}, "rhs": [0, 2]},
        {"expression": "add", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}, "rhs": 2.0},
        {"expression": "sub", "lhs": VAR1, "rhs": 1.0},
        {"expression": "mul", "lhs": VAR1, "rhs": 3.0},
        {"expression": "div", "lhs": {"expression": "index", "lhs": VAR1, "rhs": 0}, "rhs": 2.0},
        {"expression": "pow", "lhs": VAR1, "rhs": 2.0},
        {"expression": "mod", "lhs": VAR1, "rhs": 2.0},
    ],
)
def test_deserialize_param_expressions(json_param):
    """Every wire expression rebuilds the right lazy DAG (ref :2802)."""
    s = _get_serialized_seq(
        operations=[
            {
                "op": "pulse",
                "channel": "global",
                "phase": 1,
                "post_phase_shift": 2,
                "protocol": "min-delay",
                "amplitude": {
                    "kind": "constant",
                    "duration": 1000,
                    "value": 2.0,
                },
                "detuning": {
                    "kind": "constant",
                    "duration": 1000,
                    "value": json_param,
                },
            }
        ],
        variables={
            "var1": {"type": "float", "value": [1.5]},
            "var2": {"type": "int", "value": [0, 1, 2, 3, 4]},
        },
    )
    seq = Sequence.from_abstract_repr(json.dumps(s))
    var1 = seq._variables["var1"]
    var2 = seq._variables["var2"]

    # init + declare channels; the pulse stays a to-build call
    assert len(seq._calls) == 1 + len(s["channels"])
    assert len(seq._to_build_calls) == 1
    pulse = seq._to_build_calls[0].kwargs["pulse"]
    assert isinstance(pulse, ParamObj)
    param = pulse.kwargs["detuning"].kwargs["value"]

    expr = json_param["expression"]
    rhs = json_param.get("rhs")
    expected = {
        "neg": lambda: -var1,
        "abs": lambda: abs(var1[0]),
        "ceil": lambda: np.ceil(var1),
        "floor": lambda: np.floor(var1[0]),
        "sqrt": lambda: np.sqrt(var1[0]),
        "exp": lambda: np.exp(var1[0]),
        "log": lambda: np.log(var1[0]),
        "log2": lambda: np.log2(var1),
        "sin": lambda: np.sin(var1),
        "cos": lambda: np.cos(var1[0]),
        "tan": lambda: np.tan(var1),
        "index": lambda: (
            var1[rhs]
            if json_param["lhs"] == VAR1
            else var2[rhs]
        ),
        "add": lambda: var1[0] + rhs,
        "sub": lambda: var1 - rhs,
        "mul": lambda: var1 * rhs,
        "div": lambda: var1[0] / rhs,
        "pow": lambda: var1**rhs,
        "mod": lambda: var1 % rhs,
    }[expr]()
    assert param == expected


@pytest.mark.parametrize(
    "param,msg,needs_validation_patch",
    [
        (
            VAR1,
            "Variable 'var1' used in operations but not found in "
            "declared variables.",
            True,
        ),
        (
            {"abs": 1},
            "is neither a literal nor a variable or an expression.",
            True,
        ),
        (
            {"expression": "floordiv", "lhs": 0, "rhs": 0},
            "Expression 'floordiv' invalid.",
            True,
        ),
    ],
    ids=["bad_var", "bad_param", "bad_exp"],
)
def test_param_exceptions(param, msg, needs_validation_patch):
    s = _get_serialized_seq(
        [{"op": "delay", "time": param, "channel": "global"}]
    )
    if needs_validation_patch:
        # The schema catches these first; bypass it to exercise the
        # deserializer's own guards
        with patch(
            "pulser_tpu.json.abstract_repr.deserializer"
            ".validate_abstract_repr"
        ):
            with pytest.raises(AbstractReprError, match=msg):
                Sequence.from_abstract_repr(json.dumps(s))
        with pytest.raises(Exception):
            Sequence.from_abstract_repr(json.dumps(s))
    else:
        with pytest.raises(AbstractReprError, match=msg):
            Sequence.from_abstract_repr(json.dumps(s))


def test_unknown_waveform_kind():
    s = _get_serialized_seq(
        [
            {
                "op": "pulse",
                "channel": "global",
                "phase": 1,
                "post_phase_shift": 2,
                "protocol": "min-delay",
                "amplitude": {"kind": "gaussian", "duration": 1000},
                "detuning": {
                    "kind": "constant",
                    "duration": 1000,
                    "value": 1.0,
                },
            }
        ]
    )
    with patch(
        "pulser_tpu.json.abstract_repr.deserializer"
        ".validate_abstract_repr"
    ):
        with pytest.raises(
            AbstractReprError,
            match="does not encode a known waveform.",
        ):
            Sequence.from_abstract_repr(json.dumps(s))
    with pytest.raises(Exception):
        Sequence.from_abstract_repr(json.dumps(s))


def test_bad_top_level_type():
    with pytest.raises(
        TypeError,
        match="The serialized sequence must be given as a string",
    ):
        Sequence.from_abstract_repr(
            json.loads(
                json.dumps(_get_serialized_seq())
            )  # a dict, not a str
        )


@pytest.mark.parametrize(
    "missing",
    ["register", "channels", "operations", "variables", "device"],
)
def test_missing_required_fields(missing):
    s = _get_serialized_seq()
    del s[missing]
    with pytest.raises(Exception):
        Sequence.from_abstract_repr(json.dumps(s))


@pytest.mark.parametrize(
    "op",
    [
        {"op": "delay", "time": -5, "channel": "global"},
        {"op": "delay", "time": 100, "channel": "nonexistent"},
        {"op": "target", "target": 99, "channel": "digital"},
        {
            "op": "pulse",
            "channel": "global",
            "phase": 0,
            "post_phase_shift": 0,
            "protocol": "banana",
            "amplitude": {
                "kind": "constant",
                "duration": 100,
                "value": 1.0,
            },
            "detuning": {
                "kind": "constant",
                "duration": 100,
                "value": 0.0,
            },
        },
    ],
    ids=["negative_delay", "unknown_channel", "bad_target", "bad_protocol"],
)
def test_invalid_operation_payloads(op):
    s = _get_serialized_seq([op])
    with pytest.raises(Exception):
        Sequence.from_abstract_repr(json.dumps(s))
