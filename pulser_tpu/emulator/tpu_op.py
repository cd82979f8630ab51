"""The TpuOperator: the modern Operator implementation over dense arrays.

Behavioral parity with reference
``pulser-simulation/pulser_simulation/qutip_op.py:30-259``
(``QutipOperator``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Type, TypeVar

import numpy as np

from pulser_tpu.backend.operator import FullOp, Operator, QuditOp
from pulser_tpu.backend.state import Eigenstate
from pulser_tpu.emulator.qobj import Qobj, basis as basis_ket, qeye, tensor
from pulser_tpu.emulator.tpu_state import TpuState

TpuStateType = TypeVar("TpuStateType", bound=TpuState)
TpuOperatorType = TypeVar("TpuOperatorType", bound="TpuOperator")


class TpuOperator(Operator[complex, complex, TpuStateType]):
    """A quantum operator stored as a dense Qobj.

    Args:
        operator: The operator as a Qobj.
        eigenstates: The eigenstates forming a qudit's eigenbasis, each
            as an individual character, in state-vector order.
    """

    _eigenstates: Sequence[Eigenstate]

    def __init__(
        self, operator: Qobj, eigenstates: Sequence[Eigenstate]
    ):
        """Initializes a TpuOperator."""
        super().__init__()
        TpuState._validate_eigenstates(eigenstates)
        self._eigenstates = eigenstates
        if not isinstance(operator, Qobj) or not operator.isoper:
            raise TypeError(
                "'operator' must be a Qobj with type 'oper', not "
                f"{operator!r}."
            )
        TpuState._validate_shape(
            operator.shape, len(self._eigenstates)
        )
        self._operator = operator

    @property
    def eigenstates(self) -> tuple[Eigenstate, ...]:
        """The eigenstates that form a qudit's eigenbasis."""
        return tuple(self._eigenstates)

    def to_qobj(self) -> Qobj:
        """Returns a copy of the operator's Qobj representation."""
        return Qobj(self._operator.full(), dims=self._operator.dims)

    def apply_to(self, state: TpuStateType, /) -> TpuStateType:
        """Applies the operator to a state."""
        self._validate_other(
            state, TpuState, "TpuOperator.apply_to()"
        )
        out = self._operator @ state._state
        if state._state.isoper and not state._state.isket:
            out = out @ self._operator.dag()
        return type(state)(out, eigenstates=state.eigenstates)

    def expect(self, state: TpuState, /) -> complex:
        """The expectation value of self on the given state."""
        self._validate_other(state, TpuState, "TpuOperator.expect()")
        val = self._operator.expect(state._state)
        if np.allclose(
            self._operator.full(), self._operator.full().conj().T
        ):
            return val.real
        return val

    def __add__(
        self: TpuOperatorType, other: TpuOperatorType, /
    ) -> TpuOperatorType:
        """The sum of two operators."""
        self._validate_other(other, TpuOperator, "__add__")
        return type(self)(
            self._operator + other._operator,
            eigenstates=self.eigenstates,
        )

    def __rmul__(
        self: TpuOperatorType, scalar: complex
    ) -> TpuOperatorType:
        """The operator scaled by a scalar factor."""
        return type(self)(
            complex(scalar) * self._operator,
            eigenstates=self.eigenstates,
        )

    def __matmul__(
        self: TpuOperatorType, other: TpuOperatorType
    ) -> TpuOperatorType:
        """Composes two operators, 'self' applied after 'other'."""
        self._validate_other(other, TpuOperator, "__matmul__")
        return type(self)(
            self._operator @ other._operator,
            eigenstates=self.eigenstates,
        )

    @classmethod
    def _from_operator_repr(
        cls: Type[TpuOperatorType],
        *,
        eigenstates: Sequence[Eigenstate],
        n_qudits: int,
        operations: FullOp[complex],
    ) -> tuple[TpuOperatorType, FullOp[complex]]:
        """Creates an operator from the operator representation."""
        qudit_dim = len(eigenstates)

        def build_qudit_op(qudit_op: QuditOp[complex]) -> Qobj:
            op = qeye(qudit_dim) * 0
            for proj_str, coeff in qudit_op.items():
                ket = basis_ket(
                    qudit_dim, eigenstates.index(proj_str[0])
                )
                bra = basis_ket(
                    qudit_dim, eigenstates.index(proj_str[1])
                ).dag()
                op = op + complex(coeff) * (ket @ bra)
            return op

        coeffs: list[complex] = []
        tensor_ops: list[Qobj] = []
        reconstructed_ops = []
        for tensor_op_num, (coeff, tensor_op) in enumerate(operations):
            coeffs.append(complex(coeff))
            qobj_qudit_ops = [
                qeye(qudit_dim) for _ in range(n_qudits)
            ]
            re_tensor_op = []
            for qudit_op, qudit_inds in tensor_op:
                for ind in qudit_inds:
                    qobj_qudit_ops[ind] = build_qudit_op(qudit_op)
                re_qudit_op = {
                    k: complex(v) for k, v in qudit_op.items()
                }
                re_tensor_op.append((re_qudit_op, set(qudit_inds)))
            tensor_ops.append(tensor(qobj_qudit_ops))
            reconstructed_ops.append((coeffs[-1], re_tensor_op))

        full_op: Qobj = sum(
            c * t for c, t in zip(coeffs, tensor_ops)
        )
        return cls(full_op, eigenstates=eigenstates), reconstructed_ops

    def __repr__(self) -> str:
        return "\n".join(
            [
                "TpuOperator",
                "-----------",
                f"Eigenstates: {self.eigenstates}",
                self._operator.__repr__(),
            ]
        )

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, TpuOperator):
            return False
        return (
            self.eigenstates == other.eigenstates
            and self._operator == other._operator
        )

    def _validate_other(
        self,
        other: TpuState | TpuOperator,
        expected_type: Type,
        op_name: str,
    ) -> None:
        if not isinstance(other, expected_type):
            raise TypeError(
                f"'{op_name}' expects a '{expected_type.__name__}'"
                f" instance, not {type(other)}."
            )
        if self.eigenstates != other.eigenstates:
            msg = (
                f"Can't apply {op_name} between a"
                f" {self.__class__.__name__} "
                f"with eigenstates {self.eigenstates} and a "
                f"{other.__class__.__name__} with {other.eigenstates}."
            )
            if set(self.eigenstates) != set(other.eigenstates):
                raise ValueError(msg)
            raise NotImplementedError(msg)


# Drop-in alias matching the reference class name
QutipOperator = TpuOperator
