"""Backend Results/Observable/aggregation behavior tests.

Coverage modeled on the reference's ``tests/test_backend.py``
(observable storage, GHZ-state hand-computed expectations, trajectory
aggregation; reference ``pulser-core/pulser/backend/results.py:52-488``
and ``backend/aggregators.py``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from pulser_tpu.backend.config import EmulationConfig
from pulser_tpu.backend.default_observables import (
    BitStrings,
    CorrelationMatrix,
    Energy,
    Expectation,
    Occupation,
)
from pulser_tpu.backend.results import Results
from pulser_tpu.emulator import TpuOperator, TpuState

GHZ = TpuState.from_state_amplitudes(
    eigenstates=("r", "g"),
    amplitudes={"gg": 1 / np.sqrt(2), "rr": 1 / np.sqrt(2)},
)


def _number_op(qubit: int) -> TpuOperator:
    """|r><r| on one qubit of a 2-qubit register."""
    return TpuOperator.from_operator_repr(
        eigenstates=("r", "g"),
        n_qudits=2,
        operations=[(1.0, [({"rr": 1.0}, [qubit])])],
    )


class TestResultsStorage:
    def _results(self):
        return Results(atom_order=("q0", "q1"), total_duration=100)

    def test_store_and_retrieve_by_tag(self):
        res = self._results()
        obs = Occupation(evaluation_times=[0.5, 1.0])
        res._store(observable=obs, time=0.5, value=[0.1, 0.2])
        res._store(observable=obs, time=1.0, value=[0.3, 0.4])
        assert res.get_result_tags() == ["occupation"]
        assert res.get_result_times("occupation") == [0.5, 1.0]
        assert res.get_tagged_results()["occupation"] == [
            [0.1, 0.2],
            [0.3, 0.4],
        ]
        assert res.get_result("occupation", 1.0) == [0.3, 0.4]
        # Attribute-style access
        assert res.occupation == [[0.1, 0.2], [0.3, 0.4]]

    def test_double_store_same_time_rejected(self):
        res = self._results()
        obs = Occupation(evaluation_times=[1.0])
        res._store(observable=obs, time=1.0, value=[0.5])
        with pytest.raises(
            RuntimeError, match="already stored"
        ):
            res._store(observable=obs, time=1.0, value=[0.6])

    def test_get_result_missing_time(self):
        res = self._results()
        obs = Occupation(evaluation_times=[1.0])
        res._store(observable=obs, time=1.0, value=[0.5])
        with pytest.raises(ValueError):
            res.get_result("occupation", 0.123)

    def test_uuid_lookup(self):
        res = self._results()
        obs = Occupation(evaluation_times=[1.0])
        res._store(observable=obs, time=1.0, value=[0.5])
        assert res.get_result(obs, 1.0) == [0.5]


class TestGHZExpectations:
    """Hand-computed GHZ-state observable values."""

    def test_occupation(self):
        obs = Occupation(evaluation_times=[1.0])
        values = obs.apply(state=GHZ, hamiltonian=_number_op(0))
        np.testing.assert_allclose(
            np.asarray(values, dtype=float), [0.5, 0.5], atol=1e-12
        )

    def test_correlation_matrix(self):
        obs = CorrelationMatrix(evaluation_times=[1.0])
        corr = np.asarray(
            obs.apply(state=GHZ, hamiltonian=_number_op(0)),
            dtype=float,
        )
        # <n_i n_j> = 0.5 for all pairs (rr half the time, together)
        np.testing.assert_allclose(corr, np.full((2, 2), 0.5))

    def test_expectation_single_number_op(self):
        obs = Expectation(
            _number_op(0), evaluation_times=[1.0], tag_suffix="n0"
        )
        val = obs.apply(state=GHZ)
        assert np.isclose(float(np.real(val)), 0.5)

    def test_energy_with_hamiltonian(self):
        ham = _number_op(0)
        obs = Energy(evaluation_times=[1.0])
        val = obs.apply(state=GHZ, hamiltonian=ham)
        assert np.isclose(float(np.real(val)), 0.5)

    def test_bitstrings_only_00_and_11(self):
        obs = BitStrings(evaluation_times=[1.0], num_shots=2000)
        with pytest.warns(UserWarning, match="without any observ"):
            cfg = EmulationConfig()
        np.random.seed(3)
        rng_counts = obs.apply(state=GHZ, config=cfg)
        assert set(rng_counts) <= {"00", "11"}
        assert sum(rng_counts.values()) == 2000
        # Roughly balanced (10-sigma bound)
        assert abs(rng_counts["00"] - 1000) < 350


class TestAggregation:
    def _traj_results(self, occupations, counters):
        out = []
        for occ, cnt in zip(occupations, counters):
            res = Results(
                atom_order=("q0", "q1"), total_duration=100
            )
            res._store(
                observable=Occupation(evaluation_times=[1.0]),
                time=1.0,
                value=np.asarray(occ),
            )
            res._store(
                observable=BitStrings(
                    evaluation_times=[1.0], num_shots=10
                ),
                time=1.0,
                value=Counter(cnt),
            )
            out.append(res)
        return out

    def test_mean_and_bag_union(self):
        results = self._traj_results(
            [[0.2, 0.4], [0.4, 0.6]],
            [{"00": 6, "11": 4}, {"00": 2, "11": 8}],
        )
        agg = Results.aggregate(results)
        np.testing.assert_allclose(
            np.asarray(agg.occupation[0], dtype=float), [0.3, 0.5]
        )
        assert agg.bitstrings[0] == Counter({"00": 8, "11": 12})

    def test_aggregate_single_returns_same(self):
        results = self._traj_results(
            [[0.2, 0.4]], [{"00": 10}]
        )
        agg = Results.aggregate(results)
        np.testing.assert_allclose(
            np.asarray(agg.occupation[0], dtype=float), [0.2, 0.4]
        )

    def test_aggregate_requires_compatible_results(self):
        a = self._traj_results([[0.2, 0.4]], [{"00": 10}])[0]
        b = Results(atom_order=("q0",), total_duration=50)
        with pytest.raises(ValueError):
            Results.aggregate([a, b])

    def test_aggregate_empty(self):
        with pytest.raises(ValueError):
            Results.aggregate([])


class TestObservableValidation:
    def test_evaluation_times_bounds(self):
        with pytest.raises(ValueError):
            Occupation(evaluation_times=[1.5])
        with pytest.raises(ValueError):
            Occupation(evaluation_times=[-0.1])

    def test_tag_suffix(self):
        obs = Occupation(
            evaluation_times=[1.0], tag_suffix="qubits"
        )
        assert obs.tag == "occupation_qubits"

    def test_uuid_unique(self):
        a = Occupation(evaluation_times=[1.0])
        b = Occupation(evaluation_times=[1.0])
        assert a.uuid != b.uuid


class TestEmulationConfigValidation:
    def test_interaction_matrix_shapes(self):
        good = np.zeros((3, 3))
        with pytest.warns(UserWarning, match="without any observ"):
            cfg = EmulationConfig(interaction_matrix=good)
        # Normalized to the stacked 3D form
        assert cfg.interaction_matrix.shape == (1, 3, 3)
        with pytest.warns(UserWarning, match="without any observ"):
            with pytest.raises(ValueError):
                EmulationConfig(
                    interaction_matrix=np.zeros((3, 4))
                )

    def test_interaction_matrix_symmetry(self):
        asym = np.array([[0.0, 1.0], [2.0, 0.0]])
        with pytest.warns(UserWarning):
            with pytest.raises(
                ValueError, match="symmetric"
            ):
                EmulationConfig(interaction_matrix=asym)

    def test_default_evaluation_times(self):
        with pytest.warns(UserWarning):
            cfg = EmulationConfig(
                default_evaluation_times=[0.0, 0.5, 1.0]
            )
        np.testing.assert_allclose(
            np.asarray(cfg.default_evaluation_times, dtype=float),
            [0.0, 0.5, 1.0],
        )
        with pytest.warns(UserWarning):
            with pytest.raises(ValueError):
                EmulationConfig(default_evaluation_times=[0.5, 0.2])

    def test_with_changes(self):
        with pytest.warns(UserWarning):
            cfg = EmulationConfig(default_num_shots=100)
        with pytest.warns(UserWarning):
            cfg2 = cfg.with_changes(default_num_shots=500)
        assert cfg2.default_num_shots == 500
        assert cfg.default_num_shots == 100


class TestStateSampling:
    def test_spam_flips(self):
        """p_false_pos/neg flip sampled bits with the given rates."""
        all_g = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"gg": 1.0}
        )
        np.random.seed(7)
        counts = all_g.sample(
            num_shots=5000, p_false_pos=0.2, p_false_neg=0.0
        )
        # Each 0-bit flips to 1 with p=0.2
        n1 = sum(
            v * k.count("1") for k, v in counts.items()
        )
        assert abs(n1 / 10000 - 0.2) < 0.03

    def test_overlap(self):
        gg = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"gg": 1.0}
        )
        # overlap returns |<a|b>|^2 for pure states
        assert np.isclose(float(GHZ.overlap(gg)), 0.5)


def test_results_abstract_repr_roundtrip():
    res = Results(atom_order=("q0", "q1"), total_duration=100)
    res._store(
        observable=Occupation(evaluation_times=[1.0]),
        time=1.0,
        value=np.asarray([0.25, 0.75]),
    )
    s = res.to_abstract_repr()
    back = Results.from_abstract_repr(s)
    np.testing.assert_allclose(
        np.asarray(back.occupation[0], dtype=float), [0.25, 0.75]
    )
    assert back.atom_order == ("q0", "q1")
