"""Abstract-representation (de)serialization tests.

Wire-format parity is checked both ways against the importable
reference pulser-core: reference JSON must load into this framework
with bit-exact samples, and this framework's JSON must be accepted by
the reference's strict jsonschema validation.
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.json.abstract_repr.deserializer import (
    deserialize_abstract_layout,
    deserialize_abstract_noise_model,
    deserialize_abstract_register,
    deserialize_device,
)
from pulser_tpu.sequence import Sequence


def _make_seq() -> Sequence:
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp_var = seq.declare_variable("amp", dtype=float)
    seq.add(tpu.Pulse.ConstantPulse(200, amp_var, 0.5, 0.1), "ryd")
    seq.delay(100, "ryd")
    seq.phase_shift(0.3, "q0", basis="ground-rydberg")
    seq.measure("ground-rydberg")
    return seq


def _global_samples(seq: Sequence) -> dict:
    from pulser_tpu.sampler import sampler

    return sampler.sample(seq).to_nested_dict()["Global"][
        "ground-rydberg"
    ]


def test_sequence_roundtrip_bit_exact():
    seq = _make_seq()
    s = seq.to_abstract_repr()
    seq2 = Sequence.from_abstract_repr(s)
    assert list(seq2.declared_variables) == ["amp"]
    g1 = _global_samples(seq.build(amp=3.0))
    g2 = _global_samples(seq2.build(amp=3.0))
    for k in ("amp", "det", "phase"):
        np.testing.assert_array_equal(
            np.asarray(g1[k], dtype=float),
            np.asarray(g2[k], dtype=float),
        )


def test_device_roundtrip():
    for dev in (
        tpu.devices.DigitalAnalogDevice,
        tpu.devices.AnalogDevice,
        tpu.MockDevice,
    ):
        re_dev = deserialize_device(dev.to_abstract_repr())
        assert re_dev == dev


def test_register_and_layout_roundtrip():
    reg = tpu.Register.square(3, spacing=5.0, prefix="a")
    s = json.dumps(
        {"register": reg._to_abstract_repr()},
        cls=__import__(
            "pulser_tpu.json.abstract_repr.serializer",
            fromlist=["AbstractReprEncoder"],
        ).AbstractReprEncoder,
    )
    re_reg = deserialize_abstract_register(s, expected_dim=2)
    np.testing.assert_allclose(
        np.stack(
            [np.asarray(v) for v in re_reg.qubits.values()]
        ),
        np.stack([np.asarray(v) for v in reg.qubits.values()]),
    )
    layout = tpu.register.RegisterLayout(
        [[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]]
    )
    re_layout = deserialize_abstract_layout(
        layout.to_abstract_repr()
    )
    assert re_layout == layout


def test_noise_model_roundtrip():
    nm = tpu.NoiseModel(
        p_false_pos=0.02,
        p_false_neg=0.01,
        dephasing_rate=0.05,
        temperature=30.0,
    )
    s = json.dumps(nm._to_abstract_repr())
    nm2 = deserialize_abstract_noise_model(s)
    assert nm2 == nm


@pytest.fixture
def ref_pulser():
    sys.path.insert(0, "/root/reference/pulser-core")
    import pulser as ref

    yield ref


def test_reference_json_loads_here_bit_exact(ref_pulser):
    ref = ref_pulser
    reg = ref.Register.square(2, spacing=6.0, prefix="q")
    ref_seq = ref.Sequence(reg, ref.MockDevice)
    ref_seq.declare_channel("ryd", "rydberg_global")
    v = ref_seq.declare_variable("amp", dtype=float)
    ref_seq.add(ref.Pulse.ConstantPulse(200, v, 0.5, 0.1), "ryd")
    ref_seq.delay(100, "ryd")
    ref_seq.measure("ground-rydberg")

    mine = Sequence.from_abstract_repr(ref_seq.to_abstract_repr())
    g_mine = _global_samples(mine.build(amp=3.0))

    from pulser.sampler import sampler as ref_sampler

    g_ref = ref_sampler.sample(ref_seq.build(amp=3.0)).to_nested_dict()[
        "Global"
    ]["ground-rydberg"]
    for k in ("amp", "det", "phase"):
        np.testing.assert_array_equal(
            np.asarray(g_mine[k], dtype=float),
            np.asarray(g_ref[k], dtype=float),
        )


def test_our_json_passes_reference_schema(ref_pulser):
    ref = ref_pulser
    my_json = _make_seq().to_abstract_repr()
    # The reference validates against its strict JSON schemas on load
    ref_seq = ref.Sequence.from_abstract_repr(my_json)
    assert list(ref_seq.declared_channels) == ["ryd"]
    assert list(ref_seq.declared_variables) == ["amp"]


def test_emulation_config_roundtrip():
    from pulser_tpu.backend.config import EmulationConfig
    from pulser_tpu.backend.default_observables import (
        BitStrings,
        Fidelity,
        Occupation,
    )
    from pulser_tpu.emulator import TpuState

    st = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"gg": 1.0}
    )
    cfg = EmulationConfig(
        observables=[
            BitStrings(evaluation_times=[1.0]),
            Occupation(),
            Fidelity(st),
        ],
        default_evaluation_times=np.array([0.0, 0.5, 1.0]),
        noise_model=tpu.NoiseModel(dephasing_rate=0.1),
    )
    cfg2 = EmulationConfig.from_abstract_repr(cfg.to_abstract_repr())
    assert [type(o).__name__ for o in cfg2.observables] == [
        "BitStrings",
        "Occupation",
        "Fidelity",
    ]
    assert cfg2.noise_model == cfg.noise_model
    # Observables keep their uuids through the roundtrip
    assert [o.uuid for o in cfg2.observables] == [
        o.uuid for o in cfg.observables
    ]


def test_results_roundtrip():
    from pulser_tpu.backend.default_observables import BitStrings
    from pulser_tpu.backend.results import Results

    res = Results(atom_order=("q0", "q1"), total_duration=500)
    obs = BitStrings(evaluation_times=[1.0])
    res._store(
        observable=obs, time=1.0, value={"00": 250, "11": 250}
    )
    res2 = Results.from_abstract_repr(res.to_abstract_repr())
    assert res2.atom_order == ("q0", "q1")
    assert res2.total_duration == 500
    assert res2.get_result(obs, 1.0) == {"00": 250, "11": 250}


def test_legacy_sequence_serialize_roundtrip():
    """The legacy object-graph JSON coders replay a full sequence,
    including a parametrized build (reference json/coders.py:30-49)."""
    import pulser_tpu as tpu

    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp = seq.declare_variable("amp", dtype=float)
    seq.add(tpu.Pulse.ConstantPulse(200, amp, -1.0, 0.5), "ryd")
    seq.delay(100, "ryd")

    s = seq._serialize()
    seq2 = tpu.Sequence._deserialize(s)
    assert seq2.is_parametrized()
    built = seq2.build(amp=2.0)
    ref_built = seq.build(amp=2.0)
    from pulser_tpu.sampler import sample

    a = sample(built).channel_samples["ryd"]
    b = sample(ref_built).channel_samples["ryd"]
    np.testing.assert_array_equal(
        np.asarray(a.amp, dtype=float), np.asarray(b.amp, dtype=float)
    )
    np.testing.assert_array_equal(
        np.asarray(a.phase, dtype=float),
        np.asarray(b.phase, dtype=float),
    )


def test_top_level_abstract_repr_shim():
    """Import parity with the reference's pulser/abstract_repr.py shim."""
    import pulser_tpu.abstract_repr as shim
    from pulser_tpu.json.abstract_repr import deserializer as impl

    assert shim.deserialize_sequence is impl.deserialize_abstract_sequence
    assert shim.deserialize_device is impl.deserialize_device
    assert shim.deserialize_layout is impl.deserialize_abstract_layout
    assert shim.deserialize_register is impl.deserialize_abstract_register
    assert shim.deserialize_noise_model is impl.deserialize_abstract_noise_model
    assert set(shim.__all__) == {
        "deserialize_layout",
        "deserialize_noise_model",
        "deserialize_register",
        "deserialize_sequence",
        "deserialize_device",
    }

    # Round-trip smoke check through the shim's names.
    import pulser_tpu as tpu

    dev = shim.deserialize_device(tpu.AnalogDevice.to_abstract_repr())
    assert dev == tpu.AnalogDevice
