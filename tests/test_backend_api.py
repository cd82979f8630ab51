"""Backend API behavioral suite: ABCs, configs, Results, aggregation.

Covers the behaviors exercised by the reference's tests/test_backend.py
(pulser-core backend layer) against pulser_tpu's implementations.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
from collections import Counter

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.backend.abc import Backend, EmulatorBackend
from pulser_tpu.backend.config import (
    BackendConfig,
    EmulationConfig,
    EmulatorConfig,
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
from pulser_tpu.backend.results import _SAMPLED_RESULT_ATTRS, Results
from pulser_tpu.emulator import TpuOperator, TpuState
from pulser_tpu.noise_model import NoiseModel


@pytest.fixture
def sequence() -> tpu.Sequence:
    reg = tpu.Register.square(2, spacing=5, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("rydberg_global", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(1000, 1, -1, 0), "rydberg_global")
    return seq


@pytest.fixture
def ghz_state() -> TpuState:
    return TpuState.from_state_amplitudes(
        eigenstates=("r", "g"),
        amplitudes={"rrr": np.sqrt(0.5), "ggg": np.sqrt(0.5)},
    )


@pytest.fixture
def identity_ham() -> TpuOperator:
    return TpuOperator.from_operator_repr(
        eigenstates=("r", "g"), n_qudits=3, operations=[(1.0, [])]
    )


@pytest.fixture
def zzz_op() -> TpuOperator:
    return TpuOperator.from_operator_repr(
        eigenstates=("r", "g"),
        n_qudits=3,
        operations=[(1.0, [({"rr": 1.0, "gg": -1.0}, [0, 1, 2])])],
    )


class TestBackendABC:
    def test_cannot_instantiate_abstract(self, sequence):
        with pytest.raises(TypeError, match="abstract"):
            Backend(sequence)

    def test_requires_sequence_instance(self, sequence):
        class ConcreteBackend(Backend):
            def run(self):
                pass

        with pytest.raises(TypeError, match="Sequence"):
            ConcreteBackend(sequence.to_abstract_repr())

    @pytest.mark.parametrize("parametrized", [True, False])
    def test_validate_sequence_rejects_empty(self, parametrized):
        layout = tpu.register.SquareLatticeLayout(3, 3, 5)
        reg = layout.square_register(2, prefix="q")
        seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
        seq.declare_channel("rydberg_local", "rydberg_local")
        targ = (
            seq.declare_variable("targ", dtype=int) if parametrized else 0
        )
        seq.target_index(targ, "rydberg_local")
        with pytest.raises(ValueError, match="empty"):
            Backend.validate_sequence(seq, mimic_qpu=True)
        seq.delay(100, "rydberg_local")
        Backend.validate_sequence(seq, mimic_qpu=True)


class TestEmulatorConfigLegacy:
    @pytest.mark.parametrize(
        "kwargs",
        [
            {"sampling_rate": 0},
            {"sampling_rate": 1.2},
            {"evaluation_times": "full"},
            {"evaluation_times": 1.001},
            {"evaluation_times": [-1e9, 1]},
            {"initial_state": "all_ground"},
        ],
    )
    def test_value_errors(self, kwargs):
        with pytest.raises(ValueError):
            EmulatorConfig(**kwargs)

    @pytest.mark.parametrize(
        "kwargs",
        [
            {"evaluation_times": None},
            {"initial_state": None},
            {"noise_model": None},
        ],
    )
    def test_type_errors(self, kwargs):
        with pytest.raises(TypeError):
            EmulatorConfig(**kwargs)

    def test_defaults_valid(self):
        config = EmulatorConfig()
        assert config.sampling_rate == 1.0
        assert config.evaluation_times == "Full"
        assert config.initial_state == "all-ground"
        assert config.noise_model == NoiseModel()


class TestBackendConfigCore:
    def test_rejects_unexpected_kwargs(self):
        with pytest.raises(
            ValueError, match="unexpected keyword arguments"
        ):
            BackendConfig(prefer_device_noise_model=True)

    def test_missing_attribute_error(self):
        config = BackendConfig()
        with pytest.raises(AttributeError, match="'dt'"):
            config.dt
        assert config.default_num_shots is None

    def test_legacy_backend_options_deprecated(self):
        with pytest.warns(DeprecationWarning, match="backend_options"):
            config = BackendConfig(
                default_num_shots=1, backend_options={"dt": 10}
            )
        assert config.backend_options["dt"] == 10
        assert config.dt == 10
        assert config.default_num_shots == 1

    def test_default_num_shots_validation(self):
        with pytest.raises(ValueError, match="greater than or equal to 1"):
            BackendConfig(default_num_shots=0.1)
        # Floats >= 1 are cast to int
        assert BackendConfig(default_num_shots=5.0).default_num_shots == 5

    def test_read_only(self):
        config = BackendConfig()
        with pytest.raises(AttributeError, match="read-only"):
            config.default_num_shots = 1
        assert config.default_num_shots is None
        changed = config.with_changes(default_num_shots=1)
        assert changed.default_num_shots == 1
        assert config.default_num_shots is None

    def test_repr(self):
        assert (
            repr(BackendConfig())
            == "BackendConfig(\n    default_num_shots=None,\n)"
        )

    def test_pickle_roundtrip(self, tmp_path):
        cf = EmulationConfig(observables=[StateResult()])
        blob = pickle.dumps(cf)
        new_cf = pickle.loads(blob)
        assert set(cf._backend_options) == set(new_cf._backend_options)
        for key, value in cf._backend_options.items():
            if key == "observables":
                assert [o.uuid for o in value] == [
                    o.uuid for o in new_cf._backend_options[key]
                ]
            else:
                assert np.all(value == new_cf._backend_options[key])


class TestEmulationConfigValidation:
    def test_warns_without_observables(self):
        with pytest.warns(UserWarning, match="without any observables"):
            EmulationConfig()

    def test_observables_must_be_observables(self):
        with pytest.raises(TypeError, match="index 0"):
            EmulationConfig(observables=["fidelity"])

    def test_callbacks_must_not_be_observables(self):
        with pytest.raises(TypeError, match="callbacks"):
            EmulationConfig(
                callbacks=(BitStrings(),),
                observables=(StateResult(),),
            )

    def test_callbacks_must_be_callbacks(self):
        with pytest.raises(TypeError, match="callbacks"):
            EmulationConfig(
                callbacks=("Hello",), observables=(StateResult(),)
            )

    def test_duplicate_observable_tags(self):
        with pytest.raises(ValueError, match="identical tags"):
            EmulationConfig(
                observables=[BitStrings(), BitStrings(num_shots=200000)]
            )

    @pytest.mark.parametrize(
        "times, msg",
        [
            ([-1e15, 0.0, 0.5, 1.0], "between 0. and 1."),
            ([0.0, 0.5, 0.5 + 1e-14, 1.0], "unique"),
            ([0.0, 1.0, 0.5], "ascending"),
        ],
    )
    def test_default_evaluation_times_validation(self, times, msg):
        with pytest.raises(ValueError, match=msg):
            EmulationConfig(
                observables=(BitStrings(num_shots=10),),
                default_evaluation_times=times,
            )

    def test_initial_state_type(self):
        with pytest.raises(TypeError, match="State"):
            EmulationConfig(
                observables=(StateResult(),), initial_state=[[1], [0]]
            )

    def test_interaction_matrix_vs_initial_state(self):
        with pytest.raises(ValueError, match="initial state"):
            EmulationConfig(
                observables=(StateResult(),),
                interaction_matrix=np.eye(2),
                initial_state=TpuState.from_state_amplitudes(
                    eigenstates=("r", "g"), amplitudes={"rrr": 1.0}
                ),
            )

    @pytest.mark.parametrize("shape", [(4, 4), (2, 4, 4)])
    def test_interaction_matrix_diagonal_warning(self, shape):
        with pytest.warns(UserWarning, match="diagonal"):
            EmulationConfig(
                observables=(StateResult(),),
                interaction_matrix=np.ones(shape),
            )

    @pytest.mark.parametrize("shape", [(4, 4), (2, 4, 4)])
    def test_interaction_matrix_asymmetry(self, shape):
        matrix = np.ones(shape)
        matrix[(0,) * (len(shape) - 2) + (0, 3)] += 1e-4
        with pytest.raises(ValueError, match="symmetric"):
            EmulationConfig(
                observables=(StateResult(),), interaction_matrix=matrix
            )

    def test_xy_shaped_interaction_matrix_accepted(self):
        EmulationConfig(
            observables=(StateResult(),),
            interaction_matrix=np.array(
                [[[0, 1], [1, 0]], [[0, 2], [2, 0]]]
            ),
        )

    def test_bad_interaction_matrix_shape(self):
        with pytest.raises(ValueError, match=r"\(4, 3\)"):
            EmulationConfig(
                observables=(StateResult(),),
                interaction_matrix=np.arange(12).reshape((4, 3)),
            )

    def test_noise_model_type(self):
        with pytest.raises(TypeError, match="NoiseModel"):
            EmulationConfig(
                observables=(StateResult(),),
                noise_model={"p_false_pos": 0.1},
            )

    def test_extra_kwargs_tolerated_unless_enforced(self):
        # Unknown kwargs pass through by default...
        EmulationConfig(observables=(StateResult(),), dt=1)
        try:
            EmulationConfig._enforce_expected_kwargs = True
            with pytest.raises(ValueError, match="unexpected keyword"):
                EmulationConfig(observables=(StateResult(),), dt=1)
        finally:
            EmulationConfig._enforce_expected_kwargs = False

    @pytest.mark.parametrize("bad", [0, 1.001])
    def test_n_trajectories_must_be_positive_int(self, bad):
        with pytest.raises(ValueError, match="strictly positive integer"):
            EmulationConfig(
                observables=(StateResult(),), n_trajectories=bad
            )

    def test_n_trajectories_vs_noise_model_runs(self):
        with pytest.deprecated_call():
            runs_noise_model = NoiseModel(amp_sigma=0.1, runs=10)
        with pytest.raises(
            ValueError, match="can't be simultaneously defined"
        ):
            EmulationConfig(
                observables=(StateResult(),),
                noise_model=runs_noise_model,
                n_trajectories=2,
            )
        # Matching value is allowed (and floats are coerced)
        assert (
            EmulationConfig(
                observables=(StateResult(),),
                noise_model=runs_noise_model,
                n_trajectories=10.0,
            ).n_trajectories
            == 10
        )
        # Without n_trajectories, runs takes over
        assert (
            EmulationConfig(
                observables=(StateResult(),), noise_model=runs_noise_model
            ).n_trajectories
            == 10
        )
        # prefer_device_noise_model overrides runs with the default 40
        assert (
            EmulationConfig(
                observables=(StateResult(),),
                noise_model=runs_noise_model,
                prefer_device_noise_model=True,
            ).n_trajectories
            == 40
        )

    def test_n_trajectories_default_and_with_changes(self):
        config = EmulationConfig(observables=(StateResult(),))
        assert config.n_trajectories == 1
        with pytest.raises(AttributeError, match="read-only"):
            config.n_trajectories = 10
        assert config.with_changes(n_trajectories=10).n_trajectories == 10
        assert config.n_trajectories == 1

    def test_state_and_operator_types(self):
        from pulser_tpu.backend import OperatorRepr, StateRepr

        assert EmulationConfig.state_type is StateRepr
        assert EmulationConfig.operator_type is OperatorRepr

    def test_numpy_default_evaluation_times(self):
        times = np.array([0.5, 1.0])
        conf = EmulationConfig(
            default_evaluation_times=times,
            observables=(StateResult(),),
        )
        np.testing.assert_equal(conf.default_evaluation_times, times)


class TestEmulatorBackendConfig:
    def _concrete(self):
        class ConcreteEmulator(EmulatorBackend):
            default_config = EmulationConfig(
                observables=(BitStrings(num_shots=100),),
                with_modulation=True,
                extra_param="foo",
            )

            def run(self):
                pass

        return ConcreteEmulator

    def test_config_type_check(self, sequence):
        with pytest.raises(TypeError, match="EmulationConfig"):
            self._concrete()(sequence, config=EmulatorConfig)

    def test_validate_config_merges_defaults(self, sequence):
        cls = self._concrete()
        concrete_config = EmulationConfig(
            observables=(BitStrings(num_shots=100),),
            default_evaluation_times="Full",
            my_param="bar",
        )
        emu = cls(sequence, config=concrete_config)
        merged = json.loads(emu._config.to_abstract_repr())
        assert merged == json.loads(
            cls.validate_config(concrete_config).to_abstract_repr()
        )
        # Values present in the user config win over the class default:
        # with_modulation is False (EmulationConfig's signature default),
        # but the default-config-only extra_param persists.
        assert merged["with_modulation"] is False
        assert merged["extra_param"] == "foo"
        assert merged["my_param"] == "bar"

    def test_device_noise_runs_ignored_warning(self, sequence):
        cls = self._concrete()
        config = EmulationConfig(
            observables=(StateResult(),), prefer_device_noise_model=True
        )
        assert config.n_trajectories == 40
        with pytest.deprecated_call():
            device = dataclasses.replace(
                sequence.device,
                default_noise_model=NoiseModel(amp_sigma=0.1, runs=3),
            )
        with pytest.warns(UserWarning, match="ignored"):
            cls(
                tpu.Sequence(sequence.register, device), config=config
            )


class TestResultsAccess:
    def test_empty_results(self):
        res = Results(atom_order=(), total_duration=100)
        assert res.get_result_tags() == []
        assert res.get_tagged_results() == {}
        with pytest.raises(AttributeError, match="not in the results"):
            res.bitstrings
        with pytest.raises(ValueError, match="not an Observable"):
            res.get_result_times("bitstrings")
        obs = BitStrings(num_shots=100, tag_suffix="test")
        with pytest.raises(ValueError, match="has not been stored"):
            res.get_result(obs, 1.0)

    def test_final_bitstrings_unavailable(self):
        res = Results(atom_order=(), total_duration=0)
        with pytest.raises(RuntimeError, match="not available"):
            res.final_bitstrings

    def test_final_state_unavailable(self):
        res = Results(atom_order=(), total_duration=0)
        with pytest.raises(RuntimeError, match="not available"):
            res.final_state

    def test_final_state_stored(self, ghz_state, identity_ham):
        res = Results(atom_order=("q0", "q1", "q2"), total_duration=100)
        obs = StateResult()
        obs(
            config=EmulationConfig(observables=(obs,)),
            t=1.0,
            state=ghz_state,
            hamiltonian=identity_ham,
            result=res,
        )
        stored = res.final_state
        assert stored == res.get_result(obs, 1.0)
        assert np.isclose(
            float(np.real(stored.overlap(ghz_state))), 1.0
        )

    def test_from_final_bitstrings(self):
        final_bitstrings = {"000": 60, "111": 40}
        res = Results.from_final_bitstrings(
            atom_order=("q0", "q1", "q2"),
            total_duration=1000,
            final_bitstrings=final_bitstrings,
        )
        assert res.atom_order == ("q0", "q1", "q2")
        assert res.total_duration == 1000
        assert res.final_bitstrings == Counter(final_bitstrings)
        assert res.get_result_times("bitstrings") == [1.0]

        counter = Counter({"01": 5, "10": 5})
        res2 = Results.from_final_bitstrings(
            atom_order=("q0", "q1"),
            total_duration=100,
            final_bitstrings=counter,
        )
        assert res2.final_bitstrings == counter

        with pytest.raises(TypeError, match="not a valid bitstrings"):
            Results.from_final_bitstrings(
                atom_order=("q0",),
                total_duration=100,
                final_bitstrings=42,
            )

    def test_bitstring_counts_deprecation(self):
        res = Results.from_final_bitstrings(
            atom_order=("q0", "q1"),
            total_duration=100,
            final_bitstrings={"00": 30, "11": 70},
        )
        with pytest.warns(FutureWarning, match="bitstring_counts"):
            assert res.bitstring_counts == res.final_bitstrings

        empty = Results(atom_order=("q0",), total_duration=100)
        with pytest.warns(FutureWarning, match="bitstring_counts"):
            with pytest.raises(RuntimeError, match="not available"):
                empty.bitstring_counts

    def test_sampled_result_attrs_messages(self):
        res = Results(atom_order=("q0",), total_duration=100)
        assert len(_SAMPLED_RESULT_ATTRS) > 0
        for attr in _SAMPLED_RESULT_ATTRS:
            with pytest.raises(
                AttributeError, match="only in 'SampledResult'"
            ):
                getattr(res, attr)
        with pytest.raises(
            AttributeError, match="'not_an_attr' is not in the results"
        ):
            res.not_an_attr


class TestObservableCallTiming:
    @pytest.mark.parametrize("eval_times", [None, (0.0, 0.5, 1.0)])
    def test_storage_window(self, ghz_state, identity_ham, eval_times):
        config = EmulationConfig(observables=(BitStrings(num_shots=1),))
        results = Results(
            atom_order=("q0", "q1", "q2"), total_duration=1000
        )
        assert tuple(config.default_evaluation_times) == (1.0,)
        obs = StateResult(evaluation_times=eval_times)
        true_eval_times = (
            eval_times or tuple(config.default_evaluation_times)
        )

        # An off-grid time is silently skipped
        assert not config.is_time_in_evaluation_times(
            0.1, true_eval_times
        )
        obs(config, 0.1, ghz_state, identity_ham, results)
        assert not results.get_result_tags()

        # Half a time step below the evaluation time still lands
        tol = 0.5 / results.total_duration
        t_minus = 1.0 - tol
        obs(config, t_minus, ghz_state, identity_ham, results)
        assert results.get_result_times(obs) == [t_minus]
        assert np.isclose(
            float(
                np.real(
                    results.get_result(obs, t_minus).overlap(ghz_state)
                )
            ),
            1.0,
        )

        # The exact evaluation time lands too
        obs(config, 1.0, ghz_state, identity_ham, results)
        assert results.get_result_times(obs) == [t_minus, 1.0]

        # Storing twice at the same time is an error
        with pytest.raises(RuntimeError, match="already stored"):
            obs(config, 1.0, ghz_state, identity_ham, results)

        # Past t=1 is not an evaluation time
        obs(config, 1.0 + tol, ghz_state, identity_ham, results)
        assert 1.0 + tol not in results.get_result_times(obs)


class TestAggregationSemantics:
    @pytest.mark.parametrize(
        "obs_cls, default_method",
        [
            (StateResult, AggregationMethod.SKIP_WARN),
            (BitStrings, AggregationMethod.BAG_UNION),
            (CorrelationMatrix, AggregationMethod.MEAN),
            (Occupation, AggregationMethod.MEAN),
            (Energy, AggregationMethod.MEAN),
            (EnergyVariance, AggregationMethod.SKIP_WARN),
            (EnergySecondMoment, AggregationMethod.MEAN),
        ],
    )
    def test_default_aggregation_methods(self, obs_cls, default_method):
        assert obs_cls().default_aggregation_method == default_method
        with pytest.raises(AttributeError):
            obs_cls().default_aggregation_method = AggregationMethod.SKIP
        overridden = obs_cls(
            default_aggregation_method=AggregationMethod.SKIP
        )
        assert (
            overridden.default_aggregation_method
            == AggregationMethod.SKIP
        )

    @staticmethod
    def _results_pair(values1=(1.0, 2.0), values2=(3.0, 4.0)):
        out = []
        for vals in (values1, values2):
            res = Results(atom_order=(0, 1), total_duration=100)
            obs = Energy()
            for t, v in zip((0.1, 0.2), vals):
                res._store(observable=obs, time=t, value=v)
            out.append(res)
        return out

    def test_custom_callable_aggregator(self):
        results1, results2 = self._results_pair()
        calls = []

        def aggregator(values):
            calls.append(tuple(values))
            return min(values)

        agg = Results.aggregate([results1, results2], energy=aggregator)
        assert calls == [(1.0, 3.0), (2.0, 4.0)]
        assert agg.energy == [1.0, 2.0]
        assert agg.get_result_times("energy") == [0.1, 0.2]

    def test_meanstd_override(self):
        results1, results2 = self._results_pair()
        agg = Results.aggregate(
            [results1, results2], energy=AggregationMethod.MEANSTD
        )
        assert all(isinstance(x, tuple) for x in agg.energy)
        mean, std = agg.energy[0]
        # Sample standard deviation (ddof=1) of [1.0, 3.0]
        assert np.isclose(mean, 2.0) and np.isclose(std, np.sqrt(2))

    def test_mean_default(self):
        results1, results2 = self._results_pair()
        agg = Results.aggregate([results1, results2])
        assert agg.energy == [2.0, 3.0]

    def test_single_results_returned_unchanged(self):
        (results1, _) = self._results_pair()
        assert Results.aggregate([results1]) is results1

    def test_aggregate_empty(self):
        with pytest.raises(ValueError, match="No results to aggregate"):
            Results.aggregate([])

    def test_times_mismatch(self):
        results1, results2 = self._results_pair()
        results2._times[next(iter(results2._times))] = [0.1, 0.3]
        with pytest.raises(ValueError, match="times for `energy`"):
            Results.aggregate([results1, results2])

    def test_missing_tag_not_skipped(self):
        results1, _ = self._results_pair()
        results2 = Results(atom_order=(0, 1), total_duration=100)
        results2._store(
            observable=Occupation(), time=0.1, value=[0.5, 0.5]
        )
        with pytest.raises(ValueError, match="not present in all"):
            Results.aggregate([results1, results2])

    def test_missing_tag_skipped_is_fine(self):
        results1, results2 = self._results_pair()
        results2._store(
            observable=StateResult(), time=0.1, value="a state"
        )
        # StateResult defaults to SKIP_WARN: missing elsewhere is OK
        agg = Results.aggregate([results1, results2])
        assert agg.get_result_tags() == ["energy"]

    def test_skip_warn_common_tag_warns(self):
        results1, results2 = self._results_pair()
        for res in (results1, results2):
            res._store(
                observable=StateResult(), time=0.1, value="a state"
            )
        # The tag is common to all inputs but marked SKIP_WARN: it is
        # dropped from the aggregate with a warning.
        with pytest.warns(UserWarning, match="Skipping aggregation"):
            agg = Results.aggregate([results1, results2])
        assert agg.get_result_tags() == ["energy"]

    def test_atom_order_mismatch(self):
        results1, _ = self._results_pair()
        results2 = Results(atom_order=(0, 2), total_duration=100)
        results2._store(observable=Energy(), time=0.1, value=1.0)
        results2._store(observable=Energy(), time=0.2, value=1.0)
        with pytest.raises(ValueError, match="atom order"):
            Results.aggregate([results1, results2])

    def test_duration_mismatch(self):
        results1, _ = self._results_pair()
        results2 = Results(atom_order=(0, 1), total_duration=200)
        results2._store(observable=Energy(), time=0.1, value=1.0)
        results2._store(observable=Energy(), time=0.2, value=1.0)
        with pytest.raises(ValueError, match="duration"):
            Results.aggregate([results1, results2])

    def test_aggregation_method_mismatch(self):
        results1, results2 = self._results_pair()
        for uid in results2._aggregation_methods:
            results2._aggregation_methods[uid] = (
                AggregationMethod.BAG_UNION
            )
        with pytest.raises(ValueError, match="aggregation"):
            Results.aggregate([results1, results2])

    def test_legacy_results_not_aggregatable(self):
        results1, results2 = self._results_pair()
        results1._aggregation_methods = {}
        with pytest.raises(NotImplementedError):
            Results.aggregate([results1, results2])


class TestObservableValues:
    @pytest.mark.parametrize("one_state", [None, "r", "g"])
    def test_correlation_and_occupation_one_state(
        self, ghz_state, identity_ham, one_state
    ):
        corr = CorrelationMatrix(one_state=one_state)
        occ = Occupation(one_state=one_state)
        assert corr.tag == "correlation_matrix"
        assert occ.tag == "occupation"

        expected = np.full((3, 3), 0.5)
        np.testing.assert_allclose(
            np.asarray(
                corr.apply(state=ghz_state, hamiltonian=identity_ham)
            ),
            expected,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(
                occ.apply(state=ghz_state, hamiltonian=identity_ham)
            ),
            expected.diagonal(),
            atol=1e-7,
        )

        ggr = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"ggr": 1.0}
        )
        if one_state == "g":
            expected = np.array(
                [[1, 1, 0], [1, 1, 0], [0, 0, 0]], dtype=float
            )
        else:
            expected = np.zeros((3, 3))
            expected[2, 2] = 1
        np.testing.assert_allclose(
            np.asarray(corr.apply(state=ggr, hamiltonian=identity_ham)),
            expected,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(occ.apply(state=ggr, hamiltonian=identity_ham)),
            expected.diagonal(),
            atol=1e-7,
        )

    def test_energy_trio(self, ghz_state, identity_ham, zzz_op):
        energy, var, second = (
            Energy(),
            EnergyVariance(),
            EnergySecondMoment(),
        )
        assert energy.tag == "energy"
        assert var.tag == "energy_variance"
        assert second.tag == "energy_second_moment"

        def vals(ham):
            return (
                float(
                    np.real(
                        energy.apply(state=ghz_state, hamiltonian=ham)
                    )
                ),
                float(
                    np.real(
                        second.apply(state=ghz_state, hamiltonian=ham)
                    )
                ),
                float(
                    np.real(var.apply(state=ghz_state, hamiltonian=ham))
                ),
            )

        # <1> = 1, <1^2> = 1, var = 0
        assert np.allclose(vals(identity_ham), (1.0, 1.0, 0.0))
        # ZZZ on GHZ: <Z> = 0, <Z^2> = 1, var = 1
        assert np.allclose(vals(zzz_op), (0.0, 1.0, 1.0))

        # P_ggg projector with weight -1: <P> = -0.5, <P^2> = 0.5
        ggg_proj = TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=3,
            operations=[(1.0, [({"gg": -1.0}, [0, 1, 2])])],
        )
        assert np.allclose(vals(ggg_proj), (-0.5, 0.5, 0.25))

    def test_expectation(self, ghz_state, identity_ham, zzz_op):
        with pytest.raises(TypeError, match="Operator"):
            Expectation("not an operator")
        h_exp = Expectation(identity_ham)
        assert h_exp.tag == "expectation"
        assert np.isclose(
            float(np.real(h_exp.apply(state=ghz_state))), 1.0
        )
        z_exp = Expectation(zzz_op, tag_suffix="zzz")
        assert z_exp.tag == "expectation_zzz"
        assert np.isclose(
            float(np.real(z_exp.apply(state=ghz_state))), 0.0, atol=1e-7
        )

    def test_fidelity(self, ghz_state):
        with pytest.raises(TypeError, match="State"):
            Fidelity("not a state")
        ggg = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"ggg": 1.0}
        )
        fid_ggg = Fidelity(ggg, tag_suffix="ggg")
        assert fid_ggg.tag == "fidelity_ggg"
        assert np.isclose(
            float(np.real(fid_ggg.apply(state=ghz_state))), 0.5
        )
        fid_self = Fidelity(ghz_state)
        assert fid_self.tag == "fidelity"
        assert np.isclose(
            float(np.real(fid_self.apply(state=ghz_state))), 1.0
        )

    def test_state_result_identity(self, ghz_state):
        out = StateResult().apply(state=ghz_state)
        assert np.isclose(float(np.real(out.overlap(ghz_state))), 1.0)
