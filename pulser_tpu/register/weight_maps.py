"""Weight maps on top of traps.

Behavioral parity with reference
``pulser-core/pulser/register/weight_maps.py:46-232`` (exact-spot or
Gaussian-crosstalk qubit weight matching).
"""

from __future__ import annotations

import hashlib
import typing
import warnings
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Mapping, Optional, TypeVar, cast

import numpy as np
from numpy.typing import ArrayLike
from scipy.spatial.distance import cdist

import pulser_tpu.math as pm
from pulser_tpu.json.utils import obj_to_dict
from pulser_tpu.register._reg_drawer import RegDrawer
from pulser_tpu.register.traps import COORD_PRECISION, Traps

if TYPE_CHECKING:
    from matplotlib.axes import Axes

    from pulser_tpu.register.base_register import QubitId

WEIGHT_PRECISION = 6

WeightMapType = TypeVar("WeightMapType", bound="WeightMap")


@dataclass(init=False, repr=False, eq=False, frozen=True)
class WeightMap(Traps, RegDrawer):
    """Defines a generic map of weights on traps.

    Args:
        trap_coordinates: An array containing the coordinates of the traps.
        weights: A list of weights (between 0 and 1) to associate to the
            traps.
    """

    weights: tuple[float, ...]

    def __init__(
        self,
        trap_coordinates: ArrayLike,
        weights: typing.Sequence[float],
        slug: str | None = None,
    ) -> None:
        """Initializes a new weight map."""
        super().__init__(trap_coordinates, slug)
        if len(cast(list, trap_coordinates)) != len(weights):
            raise ValueError("Number of traps and weights don't match.")
        if not (
            np.all(np.array(weights) >= 0)
            and np.all(np.array(weights) <= 1)
        ):
            raise ValueError("All weights must be between 0 and 1.")
        if np.count_nonzero(weights) == 0:
            warnings.warn(
                "A WeightMap should have at least one non-zero weight.",
                stacklevel=3,
            )
        object.__setattr__(self, "weights", tuple(weights))

    @property
    def trap_coordinates(self) -> np.ndarray:
        """The array of trap coordinates, in the order they were given."""
        return self._coords_arr.as_array(detach=True)

    @property
    def _rounded_weights(self) -> np.ndarray:
        return np.round(self.weights, decimals=WEIGHT_PRECISION)

    @property
    def sorted_weights(self) -> np.ndarray:
        """The weights sorted to match the sorted trap coordinates."""
        sorting = self._calc_sorting_order()
        return cast(np.ndarray, self._rounded_weights[sorting])

    def get_qubit_weight_map(
        self,
        qubits: Mapping[QubitId, ArrayLike],
        spot_waist: float | None = None,
    ) -> dict[QubitId, float]:
        """Creates a map between qubit IDs and the weight on their sites.

        Qubits are matched to spots either exactly (within coordinate
        precision) or through a Gaussian crosstalk kernel
        exp(-d²/2w²) when ``spot_waist`` is given.
        """
        coords_arr = self.sorted_coords
        weights_arr = self.sorted_weights
        q_pos_arr = (
            pm.vstack(list(qubits.values()))
            .astype(float)
            .as_array(detach=True)
        )
        dists = cdist(q_pos_arr, coords_arr)

        if spot_waist:
            spots_shape = np.exp(-(dists**2) / (2 * spot_waist**2))
        else:
            # Every point within COORD_PRECISION in x and y
            spots_shape = dists < np.sqrt(2) * (10 ** (-COORD_PRECISION))

        total_weights = spots_shape @ weights_arr
        return dict(zip(qubits.keys(), total_weights))

    def with_pos_offset(
        self: WeightMapType, x_offset: float, y_offset: float
    ) -> WeightMapType:
        """Returns a new weight map with an offset on all coordinates.

        Args:
            x_offset: The shift along x, in µm.
            y_offset: The shift along y, in µm.
        """
        new_coords = np.array(self.trap_coordinates)
        new_coords[:, :2] += np.array([x_offset, y_offset])
        return type(self)(
            trap_coordinates=new_coords, weights=self.weights, slug=self.slug
        )

    def draw(
        self,
        labels: typing.Sequence[QubitId] | None = None,
        fig_name: str | None = None,
        kwargs_savefig: dict = {},
        custom_ax: Optional[Axes] = None,
        show: bool = True,
    ) -> None:
        """Draws the detuning map.

        Args:
            labels: If defined, writes the labels next to each site.
            fig_name: The name on which to save the figure, if any.
            kwargs_savefig: Keyword arguments for savefig.
            custom_ax: Optional pre-existing Axes to draw on.
            show: Whether to call ``plt.show()`` before returning.
        """
        import matplotlib.pyplot as plt

        pos = self.trap_coordinates
        custom_ax = custom_ax or cast(
            "Axes", self._initialize_fig_axes(pos)[1]
        )

        labels_ = (
            labels
            if labels is not None
            else [str(i) for i in range(len(pos))]
        )

        super()._draw_2D(
            custom_ax,
            pos,
            labels_,
            with_labels=labels is not None,
            are_traps=True,
            dmm_qubits=dict(zip(labels_, self.weights)),
        )

        if fig_name is not None:
            plt.savefig(fig_name, **kwargs_savefig)

        if show:
            plt.show()

    @property
    def _hash_object(self) -> hashlib._Hash:
        hash_ = super()._hash_object
        # Include the weights and the type in the hash
        hash_.update(self.sorted_weights.tobytes())
        hash_.update(type(self).__name__.encode())
        return hash_

    def __repr__(self) -> str:
        return f"{type(self).__name__}_{self._safe_hash().hex()}"

    def _to_dict(self) -> dict[str, Any]:
        return obj_to_dict(
            self,
            trap_coordinates=self.trap_coordinates,
            weights=self.weights,
            slug=self.slug,
        )

    def _to_abstract_repr(self) -> dict[str, Any]:
        d: dict[str, Any] = dict(
            traps=[
                {"weight": weight, "x": x, "y": y}
                for weight, (x, y) in zip(
                    self.sorted_weights,
                    self.sorted_coords,
                )
            ]
        )
        if self.slug is not None:
            d["slug"] = self.slug
        return d


@dataclass(init=False, repr=False, eq=False, frozen=True)
class DetuningMap(WeightMap):
    """Defines a DetuningMap.

    A ``DetuningMap`` is associated to a ``DMM`` in a ``Sequence``. It
    links a set of weights to a set of trap coordinates. It is intended to
    be defined by the user from a ``RegisterLayout``, a ``Register`` or a
    ``MappableRegister`` using ``define_detuning_map``.

    Args:
        trap_coordinates: An array containing the coordinates of the traps.
        weights: A list of detuning weights (between 0 and 1) to associate
            to the traps.
    """
