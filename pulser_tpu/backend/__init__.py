"""Classes for backend execution."""

import pulser_tpu.noise_model as noise_model  # For backwards compat
from pulser_tpu.noise_model import (  # For backwards compat
    NoiseModel as NoiseModel,
)

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
from pulser_tpu.backend.observable import (
    AggregationMethod,
    Callback,
    Observable,
)
from pulser_tpu.backend.operator import Operator, OperatorRepr
from pulser_tpu.backend.qpu import QPUBackend
from pulser_tpu.backend.remote import (
    BatchStatus,
    JobParams,
    JobStatus,
    RemoteBackend,
    RemoteConnection,
    RemoteResults,
    RemoteResultsError,
)
from pulser_tpu.backend.results import Results, ResultsSequence
from pulser_tpu.backend.state import State, StateRepr

__all__ = [
    "AggregationMethod",
    "Backend",
    "EmulatorBackend",
    "BackendConfig",
    "QPUBackend",
    "BatchStatus",
    "JobParams",
    "JobStatus",
    "RemoteBackend",
    "RemoteConnection",
    "RemoteResults",
    "RemoteResultsError",
    "EmulationConfig",
    "EmulatorConfig",
    "BitStrings",
    "CorrelationMatrix",
    "Energy",
    "EnergySecondMoment",
    "EnergyVariance",
    "Expectation",
    "Fidelity",
    "Occupation",
    "StateResult",
    "Callback",
    "Observable",
    "Operator",
    "OperatorRepr",
    "Results",
    "ResultsSequence",
    "State",
    "StateRepr",
]
