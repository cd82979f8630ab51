"""The configuration of an array of neutral atoms in 3D.

Behavioral parity with reference
``pulser-core/pulser/register/register3d.py:35``.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import TYPE_CHECKING, Any, Optional, Union

import numpy as np
from numpy.typing import ArrayLike

import pulser_tpu.math as pm
from pulser_tpu.json.utils import stringify_qubit_ids
from pulser_tpu.register._reg_drawer import RegDrawer
from pulser_tpu.register.base_register import BaseRegister, QubitId
from pulser_tpu.register.register import Register

if TYPE_CHECKING:
    pass


class Register3D(BaseRegister, RegDrawer):
    """A 3D quantum register containing a set of qubits.

    Args:
        qubits: Dictionary with the qubit names as keys and their position
            coordinates (in μm) as values.
    """

    def __init__(
        self,
        qubits: Mapping[Any, Union[ArrayLike, pm.TensorLike]],
        **kwargs: Any,
    ):
        """Initializes a custom Register."""
        super().__init__(qubits, **kwargs)
        if (
            any(c.shape != (self.dimensionality,) for c in self._coords_arr)
            or self.dimensionality != 3
        ):
            raise ValueError(
                "All coordinates must be specified as vectors of size 3."
            )

    @classmethod
    def cubic(
        cls,
        side: int,
        spacing: Union[float, pm.TensorLike] = 4.0,
        prefix: Optional[str] = None,
    ) -> Register3D:
        """Initializes the register with the qubits in a cubic array.

        Args:
            side: Side of the cube in number of qubits.
            spacing: The distance between neighbouring qubits in μm.
            prefix: The prefix for the qubit ids.
        """
        if side < 1:
            raise ValueError(
                f"The number of atoms per side (`side` = {side})"
                " must be greater than or equal to 1."
            )

        return cls.cuboid(side, side, side, spacing=spacing, prefix=prefix)

    @classmethod
    def cuboid(
        cls,
        rows: int,
        columns: int,
        layers: int,
        spacing: Union[float, pm.TensorLike] = 4.0,
        prefix: Optional[str] = None,
    ) -> Register3D:
        """Initializes the register with the qubits in a cuboid array.

        Args:
            rows: Number of rows.
            columns: Number of columns.
            layers: Number of layers.
            spacing: The distance between neighbouring qubits in μm.
            prefix: The prefix for the qubit ids.
        """
        if rows < 1:
            raise ValueError(
                f"The number of rows (`rows` = {rows})"
                " must be greater than or equal to 1."
            )

        if columns < 1:
            raise ValueError(
                f"The number of columns (`columns` = {columns})"
                " must be greater than or equal to 1."
            )

        if layers < 1:
            raise ValueError(
                f"The number of layers (`layers` = {layers})"
                " must be greater than or equal to 1."
            )

        spacing_ = pm.AbstractArray(spacing)
        if spacing_ <= 0.0:
            raise ValueError(
                f"Spacing between atoms (`spacing` = {spacing})"
                " must be greater than 0."
            )

        coords = (
            pm.AbstractArray(
                [
                    (x, y, z)
                    for z in range(layers)
                    for y in range(rows)
                    for x in range(columns)
                ],
                dtype=float,
            )
            * spacing_
        )

        return cls.from_coordinates(coords, center=True, prefix=prefix)

    def to_2D(self, tol_width: float = 0.0) -> Register:
        """Converts a Register3D into a Register (if possible).

        Args:
            tol_width: The allowed transverse width of the register to be
                projected.

        Returns:
            A 2D register with the coordinates of the atoms in a plane, if
            they are coplanar.

        Raises:
            ValueError: If the atoms are not coplanar.
        """
        coords = self._coords_arr.as_array(detach=True)
        barycenter = coords.sum(axis=0) / coords.shape[0]
        _, _, vh = np.linalg.svd(coords - barycenter)
        e_z = vh[2, :]
        perp_extent = [e_z.dot(r) for r in coords]
        width = np.ptp(perp_extent)
        # A set of vectors is coplanar iff one of the singular values is 0
        if width > tol_width:
            raise ValueError(
                f"Atoms are not coplanar (`width` = {width:#.2f} µm)"
            )
        else:
            e_x = vh[0, :]
            e_y = vh[1, :]
            coords_2D = pm.vstack(
                [
                    pm.hstack([pm.dot(e_x, r), pm.dot(e_y, r)])
                    for r in self._coords_arr
                ]
            )
            return Register.from_coordinates(coords_2D, labels=self._ids)

    def draw(
        self,
        with_labels: bool = False,
        blockade_radius: Optional[float] = None,
        draw_graph: bool = True,
        draw_half_radius: bool = False,
        qubit_colors: Mapping[QubitId, str] = dict(),
        projection: bool = False,
        fig_name: str | None = None,
        kwargs_savefig: dict = {},
    ) -> None:
        """Draws the entire register.

        Args:
            with_labels: If True, writes the qubit IDs next to each qubit.
            blockade_radius: The distance (in μm) between atoms below which
                the Rydberg blockade effect occurs.
            draw_half_radius: Whether to draw half the blockade radius
                around each atom.
            draw_graph: Whether to draw atom interactions as graph edges.
            qubit_colors: Optional colors for specific atoms.
            projection: Whether to draw a 2D projection instead of a
                perspective view.
            fig_name: The name on which to save the figure, if any.
            kwargs_savefig: Keyword arguments for savefig.
        """
        import matplotlib.pyplot as plt

        super()._draw_checks(
            len(self._ids),
            blockade_radius=blockade_radius,
            draw_graph=draw_graph,
            draw_half_radius=draw_half_radius,
        )

        pos = self._coords_arr.as_array(detach=True)

        self._draw_3D(
            pos,
            self._ids,
            projection=projection,
            with_labels=with_labels,
            blockade_radius=blockade_radius,
            draw_graph=draw_graph,
            draw_half_radius=draw_half_radius,
            qubit_colors=qubit_colors,
        )

        if fig_name is not None:
            plt.savefig(fig_name, **kwargs_savefig)
        plt.show()

    def _to_dict(self) -> dict[str, Any]:
        return super()._to_dict()

    def _to_abstract_repr(self) -> list[dict[str, Union[QubitId, float]]]:
        names = stringify_qubit_ids(self._ids)
        return [
            {"name": name, "x": x, "y": y, "z": z}
            for name, (x, y, z) in zip(names, self._coords_arr.tolist())
        ]

    @staticmethod
    def from_abstract_repr(obj_str: str) -> Register3D:
        """Deserialize a 3D register from an abstract JSON object.

        Args:
            obj_str: the JSON string representing the register encoded in
                the abstract JSON format.
        """
        if not isinstance(obj_str, str):
            raise TypeError(
                "The serialized register must be given as a string. "
                f"Instead, got object of type {type(obj_str)}."
            )
        from pulser_tpu.json.abstract_repr.deserializer import (
            deserialize_abstract_register,
        )

        return deserialize_abstract_register(obj_str, expected_dim=3)
