"""Abstract-repr feature/violation matrix, part two.

Mirrors reference behaviors from
``/root/reference/tests/test_abstract_repr.py``: multi-qubit target
payload structure (:1544), numpy scalars through the encoder (:1571),
validation skipping (:1592), tool metadata (:1602), version fields
(:405, :770), magnetic-field deserialization (:1952), variables
without defaults (:1964), device payload tampering (:445) and 3D
register round trips (:1804). Payload structure is cross-checked
against the reference implementation where it is importable.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from unittest.mock import patch

import numpy as np
import pytest

REF_PATH = "/root/reference/pulser-core"
if REF_PATH not in sys.path:
    sys.path.append(REF_PATH)

ref = pytest.importorskip("pulser")

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.json.abstract_repr.deserializer import (  # noqa: E402
    deserialize_abstract_sequence,
    deserialize_device,
)
from pulser_tpu.json.abstract_repr.serializer import (  # noqa: E402
    AbstractReprEncoder,
)
from pulser_tpu.sequence.metadata import (  # noqa: E402
    _reset_metadata,
    store_extra_metadata,
    store_package_version_metadata,
)


@pytest.fixture
def simple_seq():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6.0, prefix="q"),
        tpu.MockDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    return seq


# ----------------------------------------------------- multi-target


def test_multi_qubit_target_payload_structure():
    def build(mod):
        seq_ = mod.Sequence(
            mod.Register.square(2, prefix="q"), mod.MockDevice
        )
        var_targets = seq_.declare_variable(
            "var_targets", dtype=int, size=4
        )
        seq_.declare_channel(
            "rydberg_local",
            "rydberg_local",
            initial_target=("q0", "q1"),
        )
        seq_.target(["q3", "q2"], "rydberg_local")
        seq_.target_index(var_targets, "rydberg_local")
        seq_.target(["q0"], "rydberg_local")
        seq_.target_index(var_targets[2], "rydberg_local")
        return json.loads(seq_.to_abstract_repr())

    ours = build(tpu)
    theirs = build(ref)
    assert ours["operations"] == theirs["operations"]
    ops = ours["operations"]
    assert all(op["op"] == "target" for op in ops)
    assert ops[0]["target"] == [0, 1]
    assert ops[1]["target"] == [3, 2]
    assert ops[2]["target"] == {"variable": "var_targets"}
    assert ops[3]["target"] == 0
    assert ops[4]["target"] == {
        "expression": "index",
        "lhs": {"variable": "var_targets"},
        "rhs": 2,
    }


# ----------------------------------------------------- encoder types


@pytest.mark.parametrize(
    "value, expected",
    [
        (np.array([12345])[0], 12345),
        (np.array([np.pi])[0], np.pi),
        (np.array(["abc"])[0], "abc"),
        (np.float32(1.5), 1.5),
    ],
)
def test_numpy_scalars_through_encoder(value, expected):
    assert (
        json.loads(json.dumps(value, cls=AbstractReprEncoder))
        == expected
    )


# ------------------------------------------------- validation switch


@pytest.mark.parametrize("skip_validation", [False, True])
def test_skip_validation(simple_seq, skip_validation):
    with patch(
        "pulser_tpu.json.abstract_repr.validation"
        ".validate_abstract_repr"
    ) as mock:
        simple_seq.to_abstract_repr(
            skip_validation=skip_validation
        )
    if skip_validation:
        mock.assert_not_called()
    else:
        mock.assert_called_once()


# ------------------------------------------------------- metadata


def test_metadata_sections(simple_seq):
    try:
        assert "metadata" not in json.loads(
            simple_seq.to_abstract_repr()
        )
        store_package_version_metadata("my-package", "0.0.1")
        abstract = json.loads(simple_seq.to_abstract_repr())
        assert abstract["metadata"]["package_versions"][
            "my-package"
        ] == "0.0.1"
        assert abstract["metadata"]["extra"] == {}
        store_extra_metadata({"run_id": 7})
        abstract = json.loads(simple_seq.to_abstract_repr())
        assert abstract["metadata"]["extra"] == {"run_id": 7}
    finally:
        _reset_metadata()
    # Cleared again after reset
    assert "metadata" not in json.loads(
        simple_seq.to_abstract_repr()
    )


def test_metadata_survives_roundtrip_ignored(simple_seq):
    """Metadata rides along but does not affect deserialization."""
    try:
        store_extra_metadata({"note": "hello"})
        s = simple_seq.to_abstract_repr()
    finally:
        _reset_metadata()
    rebuilt = deserialize_abstract_sequence(s)
    assert rebuilt.get_duration() == simple_seq.get_duration()


# ------------------------------------------------------ version tags


def test_sequence_payload_carries_version(simple_seq):
    abstract = json.loads(simple_seq.to_abstract_repr())
    assert abstract["pulser_version"] == tpu.__version__


def test_device_payload_carries_version():
    abstract = json.loads(tpu.AnalogDevice.to_abstract_repr())
    assert abstract["pulser_version"] == tpu.__version__


# ---------------------------------------------------- magnetic field


def test_deserialize_seq_with_mag_field():
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6.0, prefix="q"),
            mod.MockDevice,
        )
        seq.declare_channel("mw", "mw_global")
        seq.set_magnetic_field(0.0, -1.0, 30.0)
        seq.add(
            mod.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "mw"
        )
        return seq.to_abstract_repr()

    s_r, s_t = build(ref), build(tpu)
    assert (
        json.loads(s_r)["magnetic_field"]
        == json.loads(s_t)["magnetic_field"]
        == [0.0, -1.0, 30.0]
    )
    rebuilt = deserialize_abstract_sequence(s_r)
    np.testing.assert_allclose(
        np.asarray(rebuilt.magnetic_field), [0.0, -1.0, 30.0]
    )


# ---------------------------------------- variables without defaults


@pytest.mark.parametrize("without_default", [True, False])
def test_deserialize_variables(without_default):
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6.0, prefix="q"),
        tpu.MockDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(
        tpu.Pulse.ConstantPulse(100, amp, 0.0, 0.0), "ryd"
    )
    kwargs = {} if without_default else {"amp": 1.0}
    s = seq.to_abstract_repr(**kwargs)
    payload = json.loads(s)
    assert payload["variables"]["amp"]["type"] == "float"
    rebuilt = deserialize_abstract_sequence(s)
    assert set(rebuilt.declared_variables) == {"amp"}
    assert rebuilt.is_parametrized()
    built = rebuilt.build(amp=2.0)
    assert built.get_duration() == 100


def test_serialize_without_default_then_build_required():
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6.0, prefix="q"),
        tpu.MockDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(tpu.Pulse.ConstantPulse(100, amp, 0.0, 0.0), "ryd")
    rebuilt = deserialize_abstract_sequence(seq.to_abstract_repr())
    with pytest.raises(TypeError):
        rebuilt.build()  # no default, no value


# ------------------------------------------------- device tampering


def _device_payload() -> dict:
    return json.loads(tpu.AnalogDevice.to_abstract_repr())


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d.pop("name"),
        lambda d: d.pop("channels"),
        lambda d: d.update(dimensions=7),
        lambda d: d.update(rydberg_level=-3),
        lambda d: d.update(min_atom_distance=-1.0),
        lambda d: d["channels"][0].pop("id"),
        lambda d: d["channels"][0].update(basis="bogus"),
    ],
)
def test_tampered_device_payload_rejected(mutate):
    payload = _device_payload()
    mutate(payload)
    with pytest.raises(Exception) as err:
        deserialize_device(json.dumps(payload))
    # Deserialization failures surface as structured errors, not
    # silent fallbacks
    assert err.type is not None


def test_device_payload_not_a_dict():
    from pulser_tpu.exceptions.serialization import (
        DeserializeDeviceError,
    )

    with pytest.raises(
        (TypeError, DeserializeDeviceError)
    ):
        deserialize_device(json.dumps(["not", "a", "device"]))


def test_device_roundtrip_equality_all_concrete():
    for dev in (
        tpu.AnalogDevice,
        tpu.DigitalAnalogDevice,
        tpu.MockDevice,
    ):
        rebuilt = deserialize_device(dev.to_abstract_repr())
        assert rebuilt.name == dev.name
        assert set(rebuilt.channels) == set(dev.channels)
        if dataclasses.is_dataclass(dev) and dataclasses.is_dataclass(
            rebuilt
        ):
            assert rebuilt == dev


# ------------------------------------------------------- 3D register


def test_register3d_roundtrip():
    coords = [
        [0.0, 0.0, 0.0],
        [0.0, 5.0, 0.0],
        [5.0, 0.0, 3.0],
        [5.0, 5.0, 3.0],
    ]
    reg = tpu.Register3D(
        {f"a{i}": c for i, c in enumerate(coords)}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    s = seq.to_abstract_repr()
    payload = json.loads(s)
    assert all(
        set(q) == {"name", "x", "y", "z"}
        for q in payload["register"]
    )
    rebuilt = deserialize_abstract_sequence(s)
    np.testing.assert_allclose(
        np.asarray(
            [rebuilt.register.qubits[q] for q in rebuilt.register.qubit_ids]
        ),
        np.asarray(coords),
    )


# -------------------------------------------------- eom phase drift


@pytest.mark.parametrize("correct_phase_drift", [True, False])
def test_eom_ops_carry_phase_drift_flag(correct_phase_drift):
    def build(mod):
        seq = mod.Sequence(
            mod.Register.square(2, spacing=6.0, prefix="q"),
            mod.AnalogDevice,
        )
        seq.declare_channel("ryd", "rydberg_global")
        seq.enable_eom_mode("ryd", 1.0, 0.0)
        seq.add_eom_pulse(
            "ryd",
            100,
            0.0,
            correct_phase_drift=correct_phase_drift,
        )
        seq.disable_eom_mode(
            "ryd", correct_phase_drift=correct_phase_drift
        )
        return json.loads(seq.to_abstract_repr())

    ours, theirs = build(tpu), build(ref)
    assert ours["operations"] == theirs["operations"]
    eom_ops = [
        op
        for op in ours["operations"]
        if op["op"].endswith("eom_mode") or op["op"] == "add_eom_pulse"
    ]
    assert len(eom_ops) == 3
    for op in eom_ops:
        if "correct_phase_drift" in op:
            assert op["correct_phase_drift"] is correct_phase_drift
