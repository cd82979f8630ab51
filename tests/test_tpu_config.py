"""TpuConfig (QutipConfig counterpart) suite.

Mirrors the reference's
``tests/pulser_simulation/test_qutip_config.py`` (147 LoC):
interaction-matrix rejection, sampling-rate bounds, samples-per-run
warning, initial-state typing, preferred types, progress bar,
evaluation-time unions, and solver (de)serialization (reference
``pulser-simulation/pulser_simulation/qutip_config.py``).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pytest

from pulser_tpu import NoiseModel
from pulser_tpu.backend.default_observables import (
    BitStrings,
    StateResult,
)
from pulser_tpu.emulator import TpuOperator, TpuState
from pulser_tpu.emulator.simulation import Solver
from pulser_tpu.emulator.tpu_config import TpuConfig


def test_no_interaction_matrix():
    with pytest.raises(
        NotImplementedError,
        match="does not handle custom interaction matrices.",
    ):
        TpuConfig(
            observables=[StateResult(evaluation_times=[1.0])],
            interaction_matrix=np.eye(4),
        )


def test_sampling_rate():
    with pytest.raises(
        ValueError,
        match="be greater than 0 and less than or equal to 1",
    ):
        TpuConfig(
            observables=[StateResult(evaluation_times=[1.0])],
            sampling_rate=1.2,
        )

    config = TpuConfig(
        observables=[StateResult(evaluation_times=[1.0])],
        sampling_rate=0.5,
    )

    assert "sampling_rate" in config._expected_kwargs()


def test_samples_per_run():
    with pytest.warns(
        UserWarning,
        match="The number of samples per run .* is ignored ",
    ):
        with pytest.warns(
            DeprecationWarning,
            match="Setting samples_per_run different to 1 is",
        ):
            TpuConfig(
                observables=[StateResult(evaluation_times=[1.0])],
                noise_model=NoiseModel(
                    temperature=45, samples_per_run=5
                ),
            )


def test_initial_state():
    with pytest.raises(
        TypeError,
        match=re.escape("`initial_state` must be an instance of"),
    ):
        TpuConfig(
            observables=[StateResult(evaluation_times=[1.0])],
            initial_state="all-ground",
        )


def test_preferred_types():
    assert TpuConfig.state_type is TpuState
    assert TpuConfig.operator_type is TpuOperator


def test_progress_bar():
    config = TpuConfig(
        observables=[StateResult(evaluation_times=[1.0])],
        progress_bar=True,
    )
    assert config.progress_bar
    assert "progress_bar" in config._expected_kwargs()


def test_evaluation_times_as_numpy_arrays():
    default_times = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    obs_times_1 = np.array([0.2, 0.4, 0.8])
    obs_times_2 = np.array([0.15, 0.35, 0.65, 0.95])

    config = TpuConfig(
        observables=[
            StateResult(evaluation_times=obs_times_1),
            StateResult(
                evaluation_times=obs_times_2, tag_suffix="second"
            ),
        ],
        default_evaluation_times=default_times,
    )

    expected_times = np.union1d(
        np.union1d(default_times, obs_times_1), obs_times_2
    )

    # With total_duration=1000 ns the legacy times (µs) equal the
    # relative evaluation times
    np.testing.assert_almost_equal(
        config._get_legacy_evaluation_times(1000), expected_times
    )


@pytest.mark.parametrize("as_str", [True, False])
@pytest.mark.parametrize("solver", list(Solver))
def test_solver_deserialization(solver, as_str):
    config = TpuConfig(
        observables=[BitStrings(evaluation_times=[1.0])],
        solver=solver if not as_str else str(solver.value),
    )

    ser_config = config.to_abstract_repr()
    assert json.loads(ser_config)["solver"] == str(solver.value)
    re_config = TpuConfig.from_abstract_repr(ser_config)
    assert re_config.solver is solver


def test_invalid_solver_error():
    with pytest.raises(
        ValueError, match="Invalid solver 'fakesolver'"
    ):
        TpuConfig(
            observables=[BitStrings(evaluation_times=[1.0])],
            solver="fakesolver",
        )
