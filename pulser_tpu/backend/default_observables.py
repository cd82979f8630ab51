"""The default observables.

API parity with reference
``pulser-core/pulser/backend/default_observables.py:33-579``.
"""

from __future__ import annotations

import copy
import functools
import warnings
from collections import Counter
from collections.abc import Sequence
from typing import TYPE_CHECKING, Any, Type

from pulser_tpu.backend.observable import AggregationMethod, Observable
from pulser_tpu.backend.operator import Operator, OperatorType
from pulser_tpu.backend.state import Eigenstate, State, StateType
from pulser_tpu.exceptions.serialization import AbstractReprError

if TYPE_CHECKING:
    from pulser_tpu.backend.config import EmulationConfig


class StateResult(Observable):
    """Stores the quantum state at the evaluation times."""

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.SKIP_WARN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )

    @property
    def _base_tag(self) -> str:
        return "state"

    def _to_abstract_repr(self) -> dict[str, Any]:
        raise AbstractReprError(
            "`StateResult` observable is not supported in any remote"
            " backend. If you are interested in the full quantum state at"
            " arbitrary times during the emulation, please consider using"
            " the local version of the same backend."
        )

    def apply(self, *, state: StateType, **kwargs: Any) -> StateType:
        """Calculates the observable to store in the Results."""
        return copy.deepcopy(state)


class BitStrings(Observable):
    """Stores bitstrings sampled from the state at the evaluation times.

    Error rates are taken from the NoiseModel passed to the backend via
    the EmulationConfig. The bitstrings are stored as a Counter[str].

    Args:
        evaluation_times: The relative times at which to sample.
        num_shots: How many bitstrings to sample each time. If left as
            `None`, uses `default_num_shots` of the ``EmulationConfig``.
        one_state: The eigenstate that measures to 1.
        tag_suffix: Optional suffix appended to the tag.
        default_aggregation_method: How to combine the values of this
            observable from multiple results.
    """

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        num_shots: int | None = None,
        one_state: Eigenstate | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.BAG_UNION
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )
        self.num_shots = num_shots
        self.one_state = one_state

    @property
    def _base_tag(self) -> str:
        return "bitstrings"

    @property
    def num_shots(self) -> int | None:
        """How many bitstrings to sample at each evaluation."""
        if self._num_shots is None:
            warnings.warn(
                "When `BitStrings.num_shots` is left as None, it relies"
                " on `EmulationConfig.default_num_shots` to decide how"
                " many shots to take.",
                RuntimeWarning,
                stacklevel=2,
            )
        return self._num_shots

    @num_shots.setter
    def num_shots(self, num_shots: int | None) -> None:
        if num_shots is not None:
            if num_shots < 1:
                raise ValueError(
                    "'num_shots' must be greater than or equal to 1, "
                    f"not {num_shots}."
                )
            num_shots = int(num_shots)
        self._num_shots = num_shots

    def _to_abstract_repr(self) -> dict[str, Any]:
        repr = super()._to_abstract_repr()
        repr["num_shots"] = self._num_shots
        repr["one_state"] = self.one_state
        return repr

    def apply(
        self,
        *,
        config: EmulationConfig,
        state: State,
        **kwargs: Any,
    ) -> Counter[str]:
        """Calculates the observable to store in the Results."""
        return state.sample(
            num_shots=(
                self._num_shots
                if self._num_shots is not None
                else config.default_num_shots
            ),
            one_state=self.one_state,
            p_false_pos=config.noise_model.p_false_pos,
            p_false_neg=config.noise_model.p_false_neg,
        )


class Fidelity(Observable):
    """Stores the fidelity with a pure state at the evaluation times.

    For pure states this corresponds to ``|<ψ|φ(t)>|^2`` for the given
    state ``|ψ>`` and the evolved state ``|φ(t)>``.

    Args:
        state: The state ``|ψ>``. Must be of an appropriate type for the
            backend.
        evaluation_times: The relative times at which to compute.
        tag_suffix: Optional suffix appended to the tag.
        default_aggregation_method: How to combine values from multiple
            results.
    """

    def __init__(
        self,
        state: State,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )
        if not isinstance(state, State):
            raise TypeError(
                f"'state' must be a State instance; got {type(state)}"
                " instead."
            )
        self.state = state

    @property
    def _base_tag(self) -> str:
        return "fidelity"

    def _to_abstract_repr(self) -> dict[str, Any]:
        repr = super()._to_abstract_repr()
        repr["state"] = self.state
        return repr

    def apply(self, *, state: State, **kwargs: Any) -> Any:
        """Calculates the observable to store in the Results."""
        return self.state.overlap(state)


class Expectation(Observable):
    """Stores the expectation of an operator on the current state.

    Args:
        operator: The operator to measure. Must be of the appropriate
            type for the backend.
        evaluation_times: The relative times at which to compute.
        tag_suffix: Optional suffix appended to the tag.
        default_aggregation_method: How to combine values from multiple
            results.
    """

    def __init__(
        self,
        operator: Operator,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )
        if not isinstance(operator, Operator):
            raise TypeError(
                "'operator' must be an Operator instance;"
                f" got {type(operator)} instead."
            )
        self.operator = operator

    @property
    def _base_tag(self) -> str:
        return "expectation"

    def _to_abstract_repr(self) -> dict[str, Any]:
        repr = super()._to_abstract_repr()
        repr["operator"] = self.operator
        return repr

    def apply(self, *, state: State, **kwargs: Any) -> Any:
        """Calculates the observable to store in the Results."""
        return self.operator.expect(state)


class CorrelationMatrix(Observable):
    """Stores the correlation matrix for the current state.

    Calculated as ``[[<φ(t)|n_i n_j|φ(t)> for j] for i]`` where
    ``n_k = |one_state><one_state|``.

    Args:
        evaluation_times: The relative times at which to compute.
        one_state: The eigenstate to measure the population of.
        tag_suffix: Optional suffix appended to the tag.
        default_aggregation_method: How to combine values from multiple
            results.
    """

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        one_state: Eigenstate | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )
        self.one_state = one_state

    @property
    def _base_tag(self) -> str:
        return "correlation_matrix"

    def _to_abstract_repr(self) -> dict[str, Any]:
        repr = super()._to_abstract_repr()
        repr["one_state"] = self.one_state
        return repr

    @staticmethod
    @functools.cache
    def _get_number_operator(
        qudit_ids: frozenset[int],
        n_qudits: int,
        eigenstates: Sequence[Eigenstate],
        one_state: Eigenstate,
        op_type: Type[OperatorType],
    ) -> OperatorType:
        n_op = {one_state * 2: 1.0}
        return op_type.from_operator_repr(
            eigenstates=eigenstates,
            n_qudits=n_qudits,
            operations=[(1.0, [(n_op, qudit_ids)])],
        )

    def apply(
        self, *, state: State, hamiltonian: Operator, **kwargs: Any
    ) -> list[list]:
        """Calculates the observable to store in the Results."""

        @functools.cache
        def calc_expectation(qudit_ids: frozenset[int]) -> Any:
            return self._get_number_operator(
                qudit_ids,
                state.n_qudits,
                state.eigenstates,
                self.one_state or state.infer_one_state(),
                type(hamiltonian),
            ).expect(state)

        return [
            [
                calc_expectation(frozenset((i, j)))
                for j in range(state.n_qudits)
            ]
            for i in range(state.n_qudits)
        ]


class Occupation(Observable):
    """Stores the occupation number of an eigenstate on each qudit.

    For every qudit i, calculates ``<φ(t)|n_i|φ(t)>``, where
    ``n_i = |one_state><one_state|``.

    Args:
        evaluation_times: The relative times at which to compute.
        one_state: The eigenstate to measure the population of.
        tag_suffix: Optional suffix appended to the tag.
        default_aggregation_method: How to combine values from multiple
            results.
    """

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        one_state: Eigenstate | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )
        self.one_state = one_state

    @property
    def _base_tag(self) -> str:
        return "occupation"

    def _to_abstract_repr(self) -> dict[str, Any]:
        repr = super()._to_abstract_repr()
        repr["one_state"] = self.one_state
        return repr

    def apply(
        self, *, state: State, hamiltonian: Operator, **kwargs: Any
    ) -> list:
        """Calculates the observable to store in the Results."""
        return [
            CorrelationMatrix._get_number_operator(
                frozenset((i,)),
                state.n_qudits,
                state.eigenstates,
                self.one_state or state.infer_one_state(),
                type(hamiltonian),
            ).expect(state)
            for i in range(state.n_qudits)
        ]


class Energy(Observable):
    """Stores the energy of the system at the evaluation times.

    Calculated as the expectation value of the Hamiltonian,
    i.e. ``<φ(t)|H(t)|φ(t)>``.
    """

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )

    @property
    def _base_tag(self) -> str:
        return "energy"

    def apply(
        self, *, state: State, hamiltonian: Operator, **kwargs: Any
    ) -> Any:
        """Calculates the observable to store in the Results."""
        return hamiltonian.expect(state)


class EnergyVariance(Observable):
    r"""Stores the variance of the Hamiltonian at the evaluation times.

    Calculated as ``<φ(t)|H(t)^2|φ(t)> - <φ(t)|H(t)|φ(t)>^2``.
    """

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.SKIP_WARN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )

    @property
    def _base_tag(self) -> str:
        return "energy_variance"

    def apply(
        self, *, state: State, hamiltonian: Operator, **kwargs: Any
    ) -> Any:
        """Calculates the observable to store in the Results."""
        # Works for state vectors and density matrices and avoids
        # squaring the hamiltonian
        h_state = hamiltonian.apply_to(state)
        identity = hamiltonian.from_operator_repr(
            eigenstates=state.eigenstates,
            n_qudits=state.n_qudits,
            operations=[(1.0, [])],
        )
        return (
            identity.expect(h_state) - hamiltonian.expect(state) ** 2
        )


class EnergySecondMoment(Observable):
    """Stores the expectation value of ``H(t)^2`` at evaluation times."""

    def __init__(
        self,
        *,
        evaluation_times: Sequence[float] | None = None,
        tag_suffix: str | None = None,
        default_aggregation_method: AggregationMethod = (
            AggregationMethod.MEAN
        ),
    ):
        """Initializes the observable."""
        super().__init__(
            evaluation_times=evaluation_times,
            tag_suffix=tag_suffix,
            default_aggregation_method=default_aggregation_method,
        )

    @property
    def _base_tag(self) -> str:
        return "energy_second_moment"

    def apply(
        self, *, state: State, hamiltonian: Operator, **kwargs: Any
    ) -> Any:
        """Calculates the observable to store in the Results."""
        h_state = hamiltonian.apply_to(state)
        identity = hamiltonian.from_operator_repr(
            eigenstates=state.eigenstates,
            n_qudits=state.n_qudits,
            operations=[(1.0, [])],
        )
        return identity.expect(h_state)
