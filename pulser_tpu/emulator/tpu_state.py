"""The TpuState: the modern State implementation over dense arrays.

Behavioral parity with reference
``pulser-simulation/pulser_simulation/qutip_state.py:35-282``
(``QutipState``), with the state stored in a dense
:class:`~pulser_tpu.emulator.qobj.Qobj` (numpy/JAX backed) instead of a
qutip CSR object.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from collections.abc import Collection, Mapping, Sequence
from typing import Any, Type, TypeVar

import numpy as np

from pulser_tpu.backend.state import Eigenstate, State
from pulser_tpu.emulator.qobj import Qobj, basis as basis_ket, tensor
from pulser_tpu.math.multinomial import multinomial


def _readout_errors(
    bitstrings: np.ndarray, p_false_pos: float, p_false_neg: float
) -> list[str]:
    """Applies vectorized SPAM bit flips to sampled bitstrings.

    A measured 1 flips to 0 with ``p_false_neg``, a 0 to 1 with
    ``p_false_pos`` (reference ``qutip_state.py:112-217``); all flips
    draw from the global numpy RNG in one call.
    """
    bits = (
        np.frombuffer(
            "".join(bitstrings.tolist()).encode(), dtype=np.uint8
        ).reshape(len(bitstrings), -1)
        - ord("0")
    ).astype(int)
    flip_probs = np.where(bits == 1, p_false_neg, p_false_pos)
    bits ^= np.random.uniform(size=flip_probs.shape) < flip_probs
    return [
        "".join(map(str, row)) for row in bits
    ]

TpuStateType = TypeVar("TpuStateType", bound="TpuState")

QuditOp = Mapping[str, complex]
TensorOp = Sequence[tuple[QuditOp, Collection[int]]]
FullOp = Sequence[tuple[complex, TensorOp]]


class TpuState(State[complex, float]):
    """A quantum state stored as a dense Qobj.

    Args:
        state: The state as a Qobj (statevector or density matrix).
        eigenstates: The eigenstates forming a qudit's eigenbasis, each
            as an individual character, in state-vector order.
    """

    def __init__(
        self, state: Qobj, *, eigenstates: Sequence[Eigenstate]
    ):
        """Initializes a TpuState."""
        super().__init__(eigenstates=eigenstates)
        if not isinstance(state, Qobj):
            raise TypeError(
                "'state' must be a Qobj (ket, bra or operator), not "
                f"{state!r}."
            )
        self._state = state.dag() if state.isbra else state
        self._validate_shape(self._state.shape, self.qudit_dim)

    @property
    def n_qudits(self) -> int:
        """The number of qudits in the state."""
        return round(math.log(self._state.shape[0], self.qudit_dim))

    def to_qobj(self) -> Qobj:
        """Returns a copy of the state's Qobj representation."""
        return Qobj(self._state.full(), dims=self._state.dims)

    def overlap(self, other: TpuState) -> float:
        """The overlap between this state and another of the same type.

        ``Tr[AB]`` for mixed states, ``|<a|b>|^2`` for pure states.
        """
        if not isinstance(other, TpuState):
            raise TypeError(
                "'TpuState.overlap()' expects another 'TpuState', not "
                f"{type(other)}."
            )
        if (
            self.n_qudits != other.n_qudits
            or self.qudit_dim != other.qudit_dim
        ):
            raise ValueError(
                "Can't calculate the overlap between a state with "
                f"{self.n_qudits} {self.qudit_dim}-dimensional qudits"
                f" and another with {other.n_qudits}"
                f" {other.qudit_dim}-dimensional qudits."
            )
        if self.eigenstates != other.eigenstates:
            msg = (
                "Can't calculate the overlap between states with"
                f" eigenstates {self.eigenstates} and"
                f" {other.eigenstates}."
            )
            if set(self.eigenstates) != set(other.eigenstates):
                raise ValueError(msg)
            raise NotImplementedError(msg)
        a, b = self._state, other._state
        if a.isket and b.isket:
            return float(abs(a.overlap(b)) ** 2)
        if a.isket:
            # <a| B |a>
            return float(
                (a.full().conj().T @ b.full() @ a.full())[0, 0].real
            )
        if b.isket:
            return float(
                (b.full().conj().T @ a.full() @ b.full())[0, 0].real
            )
        return float(np.trace(a.full() @ b.full()).real)

    def probabilities(
        self, *, cutoff: float = 1e-12
    ) -> dict[str, float]:
        """The probabilities of measuring each basis state combination.

        Normalized to sum to 1.

        Args:
            cutoff: The value below which a probability is considered
                zero.
        """
        if not self._state.isket:
            probs = np.abs(self._state.diag()).real
        else:
            probs = (np.abs(self._state.full()) ** 2).flatten().real
        non_zero = np.argwhere(probs > cutoff).flatten()
        probs = probs[non_zero]
        probs = probs / np.sum(probs)
        return dict(
            zip(
                map(
                    self.get_basis_state_from_index,
                    non_zero,
                ),
                probs,
            )
        )

    def bitstring_probabilities(
        self,
        *,
        one_state: Eigenstate | None = None,
        cutoff: float = 1e-12,
    ) -> Mapping[str, float]:
        """The probabilities of measuring each bitstring.

        Args:
            one_state: The eigenstate that measures to 1.
            cutoff: The value below which a probability is considered
                zero.
        """
        one_state = one_state or self.infer_one_state()
        # One translation table maps every eigenstate char to its bit
        to_bits = str.maketrans(
            {s: "1" if s == one_state else "0" for s in self.eigenstates}
        )
        bitstring_probs: dict[str, float] = defaultdict(float)
        for state_str, p in self.probabilities(cutoff=cutoff).items():
            bitstring_probs[state_str.translate(to_bits)] += p
        return dict(bitstring_probs)

    def sample(
        self,
        *,
        num_shots: int,
        one_state: Eigenstate | None = None,
        p_false_pos: float = 0.0,
        p_false_neg: float = 0.0,
    ) -> Counter[str]:
        """Samples bitstrings, taking into account error rates.

        Args:
            num_shots: How many bitstrings to sample.
            one_state: The eigenstate that measures to 1.
            p_false_pos: The rate at which a 0 is read as a 1.
            p_false_neg: The rate at which a 1 is read as a 0.

        Returns:
            The measured bitstrings, by count.
        """
        bitstring_probs = self.bitstring_probabilities(
            one_state=one_state, cutoff=1 / (1000 * num_shots)
        )
        bitstrings = np.array(list(bitstring_probs))
        probs = np.array(list(map(float, bitstring_probs.values())))
        drawn = bitstrings[multinomial(num_shots, probs)]
        if p_false_pos == 0.0 and p_false_neg == 0.0:
            return Counter(drawn.tolist())
        return Counter(
            _readout_errors(drawn, p_false_pos, p_false_neg)
        )

    @classmethod
    def _from_state_amplitudes(
        cls: Type[TpuStateType],
        *,
        eigenstates: Sequence[Eigenstate],
        n_qudits: int,
        amplitudes: Mapping[str, complex],
    ) -> tuple[TpuStateType, Mapping[str, complex]]:
        """Constructs the state from its basis states' amplitudes."""
        qudit_dim = len(eigenstates)

        def make_qobj(basis_state: str) -> Qobj:
            return tensor(
                [
                    basis_ket(qudit_dim, eigenstates.index(s))
                    for s in basis_state
                ]
            )

        state = make_qobj(eigenstates[0] * n_qudits) * 0
        amps = {k: complex(v) for k, v in amplitudes.items()}
        for basis_state, amp in amps.items():
            state = state + amp * make_qobj(basis_state)

        return cls(state, eigenstates=eigenstates), amps

    def __repr__(self) -> str:
        return "\n".join(
            [
                "TpuState",
                "--------",
                f"Eigenstates: {self.eigenstates}",
                self._state.__repr__(),
            ]
        )

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, TpuState):
            return False
        return (
            self.eigenstates == other.eigenstates
            and self._state == other._state
        )

    @staticmethod
    def _validate_shape(
        shape: tuple[int, int], qudit_dim: int
    ) -> None:
        expected_n_qudits = math.log(shape[0], qudit_dim)
        if not np.isclose(expected_n_qudits, round(expected_n_qudits)):
            raise ValueError(
                f"A Qobj with shape {shape} is incompatible with "
                f"a system of {qudit_dim}-level qudits."
            )


# Drop-in alias matching the reference class name
QutipState = TpuState
