"""Legacy classes to store measurement results.

API parity with reference ``pulser-core/pulser/result.py:52-243``.
"""

from __future__ import annotations

import collections.abc
import uuid
import warnings
from abc import ABC, abstractmethod
from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Type

import numpy as np

import pulser_tpu.backend.results as backend_results
from pulser_tpu.backend.default_observables import BitStrings
from pulser_tpu.math.multinomial import multinomial

_RENAMED = {"Results": "ResultsSequence", "ResultType": "ResultsType"}

# Shared by all SampledResult instances so equal counts compare equal.
_FIXED_UUID = uuid.UUID("00000000-0000-0000-0000-000000000000")


def __getattr__(name: str) -> Any:
    if name not in _RENAMED:
        raise AttributeError(
            f"Module {__name__!r} has no attribute {name!r}."
        )
    warnings.warn(
        f"The 'pulser.result.{name}' class has been renamed to "
        f"'{_RENAMED[name]}' and moved to 'pulser.backend.results'. "
        f"Importing it as '{name}' from 'pulser.results' is deprecated.",
        DeprecationWarning,
        stacklevel=3,
    )
    return getattr(backend_results, _RENAMED[name])


__all__ = ["Result", "SampledResult"]


@dataclass
class Result(ABC, backend_results.Results):
    """Base class to store the result of an observable at a given time."""

    meas_basis: str
    total_duration: int = field(default=0, init=False, repr=False)

    def __post_init__(self) -> None:
        warnings.warn(
            f"The '{type(self).__name__}' class has been deprecated. "
            "Please prefer storing a result in a 'Results' instance via "
            "the appropriate observable or via "
            "'Results.from_final_bitstrings()' when adequate.",
            DeprecationWarning,
            stacklevel=3,
        )
        super().__post_init__()

    @property
    def _size(self) -> int:
        return len(self.atom_order)

    def _bitstring_of(self, index: int) -> str:
        return np.binary_repr(index, width=self._size)

    @property
    def sampling_dist(self) -> dict[str, float]:
        """Probability per observed bitstring."""
        weights = self._weights()
        return {
            self._bitstring_of(ind): weights[ind]
            for ind in np.flatnonzero(weights)
        }

    @property
    @abstractmethod
    def sampling_errors(self) -> dict[str, float]:
        """The sampling error associated to each bitstring's rate."""

    @abstractmethod
    def _weights(self) -> np.ndarray:
        """The sampling rate for every state in an ordered array."""

    def get_samples(self, n_samples: int) -> Counter[str]:
        """Draws bitstrings from this result's distribution.

        Args:
            n_samples: How many draws to make.

        Returns:
            The drawn bitstrings, as a Counter.
        """
        draws = multinomial(n_samples, self._weights())
        return Counter(self._bitstring_of(i) for i in draws)

    def get_state(self) -> Any:
        """The underlying quantum state, when one is available.

        Only emulation results that keep the full state (instead of
        sampled bitstrings) can implement this.
        """
        raise NotImplementedError(
            f"`{self.__class__.__name__}.get_state()` is not implemented."
        )

    def plot_histogram(
        self,
        min_rate: float = 0.001,
        max_n_bitstrings: int | None = None,
        show: bool = True,
    ) -> None:
        """Bar-plots the bitstring distribution.

        Args:
            min_rate: Bitstrings rarer than this are left out.
            max_n_bitstrings: Cap on how many bitstrings are shown.
            show: Whether to call `plt.show()` before returning.
        """
        import matplotlib.pyplot as plt

        ranked = np.array(
            Counter(self.sampling_dist).most_common(max_n_bitstrings),
            dtype=object,
        )
        ranked = ranked[ranked[:, 1] >= min_rate]
        plt.bar(ranked[:, 0], ranked[:, 1])
        plt.xticks(rotation="vertical")
        plt.ylabel("Probabilites")
        if show:
            plt.show()

    def __str__(self) -> str:
        return self.__repr__()

    @classmethod
    def from_final_bitstrings(
        cls: Type[Result],
        atom_order: collections.abc.Sequence[str],
        total_duration: int,
        final_bitstrings: collections.abc.Mapping[str, int],
    ) -> Result:
        """[Not Implemented] Creates a Result from final bitstrings."""
        raise NotImplementedError(
            f"'{cls.__name__}.from_final_bitstrings()' is not implemented."
        )


@dataclass
class SampledResult(Result):
    """A run's outcome, given as measured-bitstring counts.

    Args:
        atom_order: Which atom each bitstring position refers to.
        meas_basis: The measurement basis.
        bitstring_counts: How many times each bitstring came up.
        evaluation_time: The relative sampling time, in [0, 1].
    """

    bitstring_counts: dict[str, int]
    evaluation_time: float = 1.0

    def __post_init__(self) -> None:
        super().__post_init__()
        self.n_samples = sum(self.bitstring_counts.values())
        via_obs = BitStrings(num_shots=self.n_samples)
        via_obs._uuid = _FIXED_UUID
        self._store(
            observable=via_obs,
            time=self.evaluation_time,
            value=Counter(self.bitstring_counts),
        )

    @property
    def sampling_errors(self) -> dict[str, float]:
        """The sampling error associated to each bitstring's rate."""
        return {
            bitstr: np.sqrt(p * (1 - p) / self.n_samples)
            for bitstr, p in self.sampling_dist.items()
        }

    def _weights(self) -> np.ndarray:
        weights = np.zeros(2**self._size)
        for bitstr, counts in self.bitstring_counts.items():
            weights[int(bitstr, base=2)] = counts / self.n_samples
        return weights / sum(weights)

    def get_samples(self, n_samples: int) -> Counter[str]:
        """Resamples from the distribution derived from the counts.

        Warning:
            To get the actual samples, access
            'SampledResult.final_bitstrings' instead.
        """
        warnings.warn(
            "'SampledResult.get_samples()' resamples a sampling"
            " distribution derived from the original 'bitstring_counts'."
            " To get the real samples, accessing"
            " 'SampledResult.final_bitstrings' is recommended.",
            stacklevel=2,
        )
        return super().get_samples(n_samples)
