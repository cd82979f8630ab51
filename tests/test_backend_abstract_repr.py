"""Backend-object serialization: observables, configs, states,
operators and results on the abstract-repr wire.

Ports the behavior matrix of the reference's
``tests/test_backend_abstract_repr.py`` (680 LoC), reorganized around
a single round-trip helper; the tensor variants use JAX arrays where
the reference uses torch.
"""

from __future__ import annotations

import json
from unittest.mock import MagicMock

import jax.numpy as jnp
import numpy as np
import pytest

from pulser_tpu.backend import (
    EmulationConfig,
    OperatorRepr,
    Results,
    StateRepr,
)
from pulser_tpu.backend.default_observables import (
    BitStrings,
    CorrelationMatrix,
    Energy,
    EnergySecondMoment,
    EnergyVariance,
    Expectation,
    Fidelity,
    Occupation,
    StateResult,
)
from pulser_tpu.backend.observable import AggregationMethod
from pulser_tpu.exceptions.serialization import AbstractReprError
from pulser_tpu.json.abstract_repr.backend import (
    _deserialize_observable,
    _deserialize_operator,
    _deserialize_state,
)
from pulser_tpu.json.abstract_repr.serializer import AbstractReprEncoder
from pulser_tpu.noise_model import NoiseModel

EXAMPLE_STATE = StateRepr.from_state_amplitudes(
    eigenstates=("0", "1"), amplitudes={"11": 0.1}
)
EXAMPLE_OP = OperatorRepr.from_operator_repr(
    eigenstates=("r", "g"),
    n_qudits=3,
    operations=[(0.3, [({"rr": 0.2j}, [0, 2])])],
)


def _wire(obj) -> dict:
    return json.loads(json.dumps(obj, cls=AbstractReprEncoder))


OBSERVABLE_CASES = [
    (
        BitStrings,
        (),
        {
            "evaluation_times": [i * 0.05 for i in range(10)],
            "num_shots": 211,
            "one_state": "r",
            "tag_suffix": "7",
        },
    ),
    (BitStrings, (), {}),
    (CorrelationMatrix, (), {"one_state": "r"}),
    (Occupation, (), {"one_state": "g"}),
    (Energy, (), {"evaluation_times": [i * 0.05 for i in range(10)]}),
    (EnergyVariance, (), {"evaluation_times": np.linspace(0, 1, 13)}),
    (
        EnergySecondMoment,
        (),
        {"evaluation_times": [i * 0.1 for i in range(5)]},
    ),
    (
        Fidelity,
        (EXAMPLE_STATE,),
        {"evaluation_times": [i / 7.2 for i in range(5)]},
    ),
    (Expectation, (EXAMPLE_OP,), {"tag_suffix": "my_op"}),
    (
        Expectation,
        (EXAMPLE_OP,),
        {"default_aggregation_method": AggregationMethod.SKIP},
    ),
]


class TestObservableRepr:
    @pytest.mark.parametrize("with_uuid", [True, False])
    @pytest.mark.parametrize(
        "observable, args, kwargs", OBSERVABLE_CASES
    )
    def test_roundtrip_fields(self, observable, args, kwargs, with_uuid):
        obs = observable(*args, **kwargs)
        obs_repr = _wire(obs)
        if not with_uuid:
            obs_repr.pop("uuid")

        back = _deserialize_observable(obs_repr, StateRepr, OperatorRepr)
        # UUID identity is preserved iff it traveled on the wire.
        assert (back._uuid == obs._uuid) is with_uuid

        for payload in (obs_repr, back._to_abstract_repr()):
            assert payload["observable"] == obs._base_tag
            assert payload["tag_suffix"] == kwargs.get(
                "tag_suffix", None
            )
            if payload["evaluation_times"] is None:
                assert "evaluation_times" not in kwargs
            else:
                np.testing.assert_allclose(
                    payload["evaluation_times"],
                    kwargs["evaluation_times"],
                )
            for field in ("one_state", "num_shots"):
                if isinstance(payload, dict):
                    assert payload.get(field, None) == kwargs.get(
                        field, None
                    )
            assert (
                payload["default_aggregation_method"]
                == obs.default_aggregation_method
            )

        # The schema accepts the payload with or without the uuid.
        ser_config = json.loads(
            EmulationConfig(observables=[obs]).to_abstract_repr(
                skip_validation=True
            )
        )
        if not with_uuid:
            ser_config["observables"][0].pop("uuid")
        EmulationConfig.from_abstract_repr(json.dumps(ser_config))

    @pytest.mark.parametrize(
        "eigenstates, amplitudes",
        [
            (("r", "g"), {"rgr": 1.0, "grg": 1.0}),
            (("0", "1"), {"1000": 1.0 + 0.5j, "0001": 1.0 - 0.5j}),
            (["u", "d", "x"], {"uuddx": 1 / 2}),
        ],
    )
    def test_fidelity_embeds_state(self, eigenstates, amplitudes):
        state = StateRepr.from_state_amplitudes(
            eigenstates=eigenstates, amplitudes=amplitudes
        )
        fid = Fidelity(state)
        embedded = fid._to_abstract_repr()["state"]
        assert embedded._eigenstates == eigenstates
        assert embedded._amplitudes == amplitudes

        back = _deserialize_observable(
            _wire(fid), StateRepr, OperatorRepr
        )
        assert isinstance(back.state, StateRepr)
        assert back.state._eigenstates == list(eigenstates)
        assert back.state._amplitudes == dict(amplitudes)

    @pytest.mark.parametrize(
        "op_kwargs",
        [
            {"eigenstates": ("0", "1"), "n_qudits": 3, "operations": []},
            {
                "eigenstates": ("r", "g"),
                "n_qudits": 5,
                "operations": [
                    (
                        1.0j,
                        [
                            ({"rg": 0.72j}, [0, 2]),
                            ({"rr": 1.0, "gg": -1.0}, [1, 3]),
                        ],
                    ),
                    (0.5j, [({"gr": 1.0j}, [4])]),
                ],
            },
        ],
    )
    def test_expectation_embeds_operator(self, op_kwargs):
        op = OperatorRepr.from_operator_repr(**op_kwargs)
        exp = Expectation(op)
        embedded = exp._to_abstract_repr()["operator"]
        assert embedded._eigenstates == op_kwargs["eigenstates"]
        assert embedded._n_qudits == op_kwargs["n_qudits"]
        assert embedded._operations == op_kwargs["operations"]

        back = _deserialize_observable(
            _wire(exp), StateRepr, OperatorRepr
        )
        assert isinstance(back.operator, OperatorRepr)
        assert back.operator._eigenstates == list(
            op_kwargs["eigenstates"]
        )
        assert back.operator._n_qudits == op_kwargs["n_qudits"]
        assert back.operator._operations == op_kwargs["operations"]

    def test_state_result_not_supported(self):
        with pytest.raises(
            AbstractReprError,
            match="not supported in any remote backend",
        ):
            json.dumps(StateResult(), cls=AbstractReprEncoder)

    def test_unknown_observable_tag_rejected(self):
        payload = _wire(BitStrings())
        payload["observable"] = "I'm not valid"
        with pytest.raises(
            AbstractReprError, match="Failed to deserialize"
        ):
            _deserialize_observable(payload, StateRepr, OperatorRepr)


class TestConfigRepr:
    def test_config_not_from_str(self):
        with pytest.raises(
            TypeError,
            match="The serialized EmulationConfig must be given as a "
            "string",
        ):
            EmulationConfig.from_abstract_repr(1.0)

    def test_legacy_interaction_matrix(self):
        """pulser <= 1.8 serialized the interaction matrix as 2D."""
        matrix = [[0.0, 0.5], [0.5, 0.0]]
        config = EmulationConfig(
            observables=[Energy()], interaction_matrix=matrix
        )
        ser = json.loads(config.to_abstract_repr())
        assert np.array(ser["interaction_matrix"]).shape == (1, 2, 2)

        ser["interaction_matrix"] = matrix  # legacy shape
        back = EmulationConfig.from_abstract_repr(json.dumps(ser))
        np.testing.assert_allclose(
            np.asarray(back.interaction_matrix),
            np.asarray(config.interaction_matrix),
        )

    def test_legacy_observable_without_aggregation_method(self):
        """pulser <= 1.8 had no 'default_aggregation_method' field."""
        obs = Energy()
        ser = json.loads(
            EmulationConfig(observables=[obs]).to_abstract_repr()
        )
        ser["observables"][0].pop("default_aggregation_method")
        back = EmulationConfig.from_abstract_repr(json.dumps(ser))
        assert (
            back.observables[0].default_aggregation_method
            == obs.default_aggregation_method
        )

    @pytest.mark.parametrize(
        "observables",
        [
            (
                BitStrings(
                    evaluation_times=[i * 0.01 for i in range(10)]
                ),
                CorrelationMatrix(),
            ),
            (Energy(), Occupation(one_state="0")),
        ],
    )
    @pytest.mark.parametrize(
        "kwargs",
        [
            {"with_modulation": True, "initial_state": EXAMPLE_STATE},
            {
                "default_evaluation_times": [0.1, 0.2, 0.3],
                "prefer_device_noise_model": True,
            },
            {
                "default_evaluation_times": "Full",
                "interaction_matrix": [[0.0, 0.5], [0.5, 0.0]],
            },
            {
                "noise_model": NoiseModel(
                    p_false_pos=0.1, dephasing_rate=0.01
                )
            },
            {"max_bond_dim": 10, "precision": 1e-6, "gpu": True},
        ],
    )
    def test_config_roundtrip(self, observables, kwargs):
        config = EmulationConfig(observables=observables, **kwargs)
        back = EmulationConfig.from_abstract_repr(
            config.to_abstract_repr()
        )
        assert isinstance(back, EmulationConfig)

        for got, want in zip(back.observables, config.observables):
            assert json.dumps(
                got._to_abstract_repr(), cls=AbstractReprEncoder
            ) == json.dumps(
                want._to_abstract_repr(), cls=AbstractReprEncoder
            )

        if isinstance(config.default_evaluation_times, np.ndarray):
            np.testing.assert_allclose(
                config.default_evaluation_times,
                back.default_evaluation_times,
            )
        else:
            assert (
                back.default_evaluation_times
                == config.default_evaluation_times
            )

        if config.initial_state is None:
            assert back.initial_state is None
        else:
            assert isinstance(back.initial_state, StateRepr)
            assert (
                back.initial_state._to_abstract_repr()
                == config.initial_state._to_abstract_repr()
            )

        assert back.with_modulation == config.with_modulation
        if config.interaction_matrix is None:
            assert back.interaction_matrix is None
        else:
            np.testing.assert_allclose(
                np.asarray(back.interaction_matrix),
                np.asarray(config.interaction_matrix),
            )
        assert (
            back.prefer_device_noise_model
            == config.prefer_device_noise_model
        )
        assert back.noise_model == config.noise_model

        # Unknown extra kwargs survive the round trip untouched.
        extras = kwargs.keys() - config._expected_kwargs()
        for key in extras:
            assert getattr(back, key) == kwargs[key]


class TestStateRepr:
    def test_n_qudits(self):
        state = StateRepr.from_state_amplitudes(
            eigenstates=("0", "1"), amplitudes={"00000": 1.0j}
        )
        assert state.n_qudits == 5

    def test_invalid_eigenstates(self):
        with pytest.raises(
            ValueError,
            match="All eigenstates must be represented by single "
            "characters",
        ):
            StateRepr(eigenstates=("av", "b", "c"))

    def test_invalid_amplitudes(self):
        with pytest.raises(
            ValueError,
            match="must be combinations of eigenstates with the same "
            "length",
        ):
            StateRepr.from_state_amplitudes(
                eigenstates=("0", "1"),
                amplitudes={"00000": 1.0j, "rrrrr": 1.0},
            )

    def test_not_from_amplitudes(self):
        state = StateRepr(eigenstates=("r", "g"))
        with pytest.raises(AbstractReprError):
            state._to_abstract_repr()

    def test_numeric_methods_not_implemented(self):
        state = StateRepr.from_state_amplitudes(
            eigenstates=("r", "g"),
            amplitudes={"rgr": 1.0, "grg": 1.0},
        )
        with pytest.raises(NotImplementedError):
            state.overlap(state)
        with pytest.raises(NotImplementedError):
            state.sample(num_shots=10)

    @pytest.mark.parametrize(
        "eigenstates, amplitudes",
        [
            (
                ("r", "g"),
                {"rgr": 1.0j + 0.2, "grg": 0.22j, "rrr": -2.0},
            ),
            (
                ["r", "g"],
                {"rgr": 1.0j + 0.2, "grg": 0.22j, "rrr": -2.0},
            ),
            (("0", "1"), {"10001": 0.5, "01010": 0.5}),
        ],
    )
    def test_repr_roundtrip(self, eigenstates, amplitudes):
        state = StateRepr.from_state_amplitudes(
            eigenstates=eigenstates, amplitudes=amplitudes
        )
        payload = state._to_abstract_repr()
        assert payload["eigenstates"] == tuple(eigenstates)
        assert payload["amplitudes"] == dict(amplitudes)

        back = _deserialize_state(_wire(state), StateRepr)
        assert isinstance(back, StateRepr)
        assert back._to_abstract_repr() == payload


class TestOperatorRepr:
    @pytest.mark.parametrize(
        "op_kwargs",
        [
            {
                "eigenstates": ("r", "g"),
                "n_qudits": 5,
                "operations": [
                    (
                        1.0,
                        [
                            ({"gr": 1.0, "rg": 1.0}, [0, 2]),
                            ({"rr": 1.0, "gg": -1.0}, [1, 3, 4]),
                        ],
                    )
                ],
            },
            {
                "eigenstates": ("0", "1"),
                "n_qudits": 3,
                "operations": [
                    (0.1j, [({"01": -1.0j, "10": 1.0j}, [0, 2])]),
                    (
                        0.7j,
                        [({"11": -0.7j, "00": 2.3 + 0.22j}, [1, 2])],
                    ),
                ],
            },
            {
                "eigenstates": ["r", "g", "l"],
                "n_qudits": 2,
                "operations": [
                    (
                        -1.0j,
                        [
                            ({"gr": 1.0, "rg": 1.0}, [0]),
                            ({"ll": 1.0}, [1]),
                        ],
                    )
                ],
            },
        ],
    )
    def test_repr_roundtrip(self, op_kwargs):
        op = OperatorRepr.from_operator_repr(**op_kwargs)
        payload = op._to_abstract_repr()
        assert payload["eigenstates"] == tuple(
            op_kwargs["eigenstates"]
        )
        assert payload["n_qudits"] == op_kwargs["n_qudits"]
        assert payload["operations"] == op_kwargs["operations"]

        back = _deserialize_operator(_wire(op), OperatorRepr)
        assert isinstance(back, OperatorRepr)
        assert back._to_abstract_repr() == payload

    def test_numeric_methods_not_implemented(self):
        op = OperatorRepr.from_operator_repr(
            eigenstates=("r", "g"), n_qudits=5, operations=[]
        )
        mock_state = MagicMock()
        for fail in (
            lambda: op.apply_to(mock_state),
            lambda: op.expect(mock_state),
            lambda: op + op,
            lambda: 3.0 * op,
            lambda: op @ op,
        ):
            with pytest.raises(NotImplementedError):
                fail()


@pytest.mark.parametrize("tensor", [True, False])
def test_result_serialization(tensor):
    """Stored values of every payload type survive the wire, with
    uuid/tag/time/aggregation bookkeeping intact (JAX arrays stand in
    for the reference's torch variant)."""
    bitstrings, corr = BitStrings(), CorrelationMatrix()
    energy, occ = Energy(), Occupation()
    results = Results(atom_order=(), total_duration=100)

    results._store(observable=bitstrings, time=0.1, value="rgrgrg")
    rng = np.random.default_rng(7)
    cor_mat = rng.normal(size=(6, 6))
    occ_vec = rng.normal(size=6).astype(complex)
    occ_vec[0] = occ_vec[0] + 1j
    if tensor:
        cor_mat = jnp.asarray(cor_mat)
        occ_vec = jnp.asarray(occ_vec)
    results._store(observable=corr, time=0.2, value=cor_mat)
    results._store(observable=energy, time=0.3, value=5.0)
    results._store(observable=occ, time=0.4, value=occ_vec)

    payload = results._to_abstract_repr()
    assert payload["results"][str(bitstrings.uuid)] == ["rgrgrg"]
    assert payload["results"][str(energy.uuid)] == [5.0]
    np.testing.assert_allclose(
        np.asarray(payload["results"][str(corr.uuid)][0]),
        np.asarray(cor_mat),
    )
    assert payload["tagmap"] == {
        o.tag: str(o.uuid) for o in (bitstrings, corr, energy, occ)
    }
    assert payload["times"] == {
        str(bitstrings.uuid): [0.1],
        str(corr.uuid): [0.2],
        str(energy.uuid): [0.3],
        str(occ.uuid): [0.4],
    }
    assert payload["aggregation_methods"] == {
        str(bitstrings.uuid): AggregationMethod.BAG_UNION,
        str(corr.uuid): AggregationMethod.MEAN,
        str(energy.uuid): AggregationMethod.MEAN,
        str(occ.uuid): AggregationMethod.MEAN,
    }

    wire = results.to_abstract_repr()
    assert wire == json.dumps(payload, cls=AbstractReprEncoder)

    back = Results.from_abstract_repr(wire)
    assert back.energy == results.energy
    assert back.bitstrings == results.bitstrings
    assert back.occupation == [
        np.asarray(x).tolist() for x in results.occupation
    ]
    # Mixed complex/real vectors deserialize element-wise.
    assert isinstance(back.occupation[0][0], complex)
    assert all(isinstance(v, float) for v in back.occupation[0][1:])
    assert back.correlation_matrix == [
        np.asarray(x).tolist() for x in results.correlation_matrix
    ]
    for obs in (bitstrings, corr, energy, occ):
        assert back.get_result_times(obs) == results.get_result_times(
            obs
        )
    assert back.get_result_tags() == results.get_result_tags()
    assert back._aggregation_methods == results._aggregation_methods


def test_result_atom_order_serialization():
    with pytest.warns(
        UserWarning, match="converts all qubit ID's to strings"
    ):
        assert Results.from_abstract_repr(
            Results(
                atom_order=(0, 1, 2), total_duration=1000
            ).to_abstract_repr()
        ) == Results(atom_order=("0", "1", "2"), total_duration=1000)

        with pytest.raises(
            AbstractReprError, match="Name collisions encountered"
        ):
            Results(atom_order=(0, "0"), total_duration=10).to_abstract_repr()
