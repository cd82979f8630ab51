"""RegisterLayout and special-layout behavior tests.

Coverage modeled on the reference's ``tests/test_register_layout.py``
(trap bookkeeping, hashing, register extraction from lattices;
reference ``pulser-core/pulser/register/register_layout.py`` and
``special_layouts.py``).
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from pulser_tpu import Register
from pulser_tpu.register import RegisterLayout
from pulser_tpu.register.special_layouts import (
    RectangularLatticeLayout,
    SquareLatticeLayout,
    TriangularLatticeLayout,
)


@pytest.fixture
def layout():
    return RegisterLayout(
        [[0, 0], [1, 1], [0, 1], [1, 0]], slug="2DLayout"
    )


def test_creation_and_traps(layout):
    assert layout.number_of_traps == 4
    assert layout.dimensionality == 2
    # traps_dict maps sorted trap ids to coordinates
    td = layout.traps_dict
    assert set(td) == {0, 1, 2, 3}
    # Coordinates sort by x then y
    np.testing.assert_array_equal(
        layout.sorted_coords,
        [[0, 0], [0, 1], [1, 0], [1, 1]],
    )
    with pytest.raises(ValueError, match="must be unique"):
        RegisterLayout([[0, 0], [0, 0], [1, 1]])


def test_slug_and_repr(layout):
    assert str(layout) == "2DLayout"
    assert repr(layout).startswith("RegisterLayout_")
    no_slug = RegisterLayout([[0, 0], [1, 1]])
    assert str(no_slug) == repr(no_slug)


def test_static_hash_is_coordinate_based(layout):
    same = RegisterLayout(
        [[1, 0], [0, 1], [1, 1], [0, 0]], slug="other-name"
    )
    assert same.static_hash() == layout.static_hash()
    different = RegisterLayout([[0, 0], [1, 1], [0, 1], [2, 0]])
    assert different.static_hash() != layout.static_hash()


def test_equality(layout):
    same = RegisterLayout([[1, 0], [0, 1], [1, 1], [0, 0]])
    assert same == layout
    assert layout != RegisterLayout([[0, 0], [1, 1], [0, 1]])
    assert layout != "not a layout"


def test_register_definition_errors(layout):
    with pytest.raises(
        ValueError, match="must correspond to the ID of a trap"
    ):
        layout.define_register(0, 4)
    with pytest.raises(
        ValueError, match="must be a unique integer"
    ):
        layout.define_register(1, 1)
    reg = layout.define_register(0, 2, qubit_ids=["a", "b"])
    assert reg.qubit_ids == ("a", "b")
    with pytest.raises(
        ValueError,
        match="same size as the number of provided 'trap_ids'",
    ):
        layout.define_register(0, 1, qubit_ids=["only-one"])


def test_get_traps_from_coordinates(layout):
    ids = layout.get_traps_from_coordinates([0, 1], [1, 1])
    coords = [tuple(layout.traps_dict[i]) for i in ids]
    assert set(coords) == {(0, 1), (1, 1)}
    with pytest.raises(ValueError, match="not a part of the RegisterLayout"):
        layout.get_traps_from_coordinates([5, 5])


def test_detuning_map_from_layout(layout):
    # Trap ids follow the sorted coordinate order: 0=(0,0), 1=(0,1)
    dmap = layout.define_detuning_map({0: 1.0, 1: 0.5})
    weights = dmap.get_qubit_weight_map(
        {"q0": (0, 0), "q1": (0, 1), "q2": (1, 1)}
    )
    assert weights["q0"] == pytest.approx(1.0)
    assert weights["q1"] == pytest.approx(0.5)
    assert weights["q2"] == pytest.approx(0.0)


def test_abstract_repr_roundtrip(layout):
    s = layout.to_abstract_repr()
    back = RegisterLayout.from_abstract_repr(s)
    assert back == layout
    assert back.static_hash() == layout.static_hash()


def test_square_lattice_layout():
    square = SquareLatticeLayout(9, 7, 5)
    assert str(square) == "SquareLatticeLayout(9x7, 5.0µm)"
    assert square.square_register(3) == Register.square(
        3, spacing=5, prefix="q"
    )
    # An even side won't align the center with an atom
    assert square.square_register(4) != Register.square(
        4, spacing=5, prefix="q"
    )
    with pytest.raises(ValueError, match="'8x8' array doesn't fit"):
        square.square_register(8)
    assert square.rectangular_register(
        3, 7, prefix="r"
    ) == Register.rectangle(3, 7, spacing=5, prefix="r")
    with pytest.raises(ValueError, match="'10x3' array doesn't fit"):
        square.rectangular_register(10, 3)


def test_rectangular_lattice_layout():
    rectangle = RectangularLatticeLayout(9, 7, 2, 4)
    assert (
        str(rectangle) == "RectangularLatticeLayout(9x7, 2.0x4.0µm)"
    )
    assert rectangle.square_register(
        3
    ) == Register.rectangular_lattice(
        3, 3, col_spacing=2, row_spacing=4, prefix="q"
    )
    with pytest.raises(ValueError, match="'8x8' array doesn't fit"):
        rectangle.square_register(8)


def test_triangular_lattice_layout():
    tri = TriangularLatticeLayout(50, 5)
    assert str(tri) == "TriangularLatticeLayout(50, 5.0µm)"
    assert tri.hexagonal_register(19) == Register.hexagon(
        2, spacing=5, prefix="q"
    )
    with pytest.raises(
        ValueError,
        match=re.escape(
            "The desired register has more atoms (51) than there"
            " are traps in this TriangularLatticeLayout (50)"
        ),
    ):
        tri.hexagonal_register(51)
    with pytest.raises(
        ValueError, match="has more atoms than there are traps"
    ):
        tri.rectangular_register(7, 8)
    with pytest.raises(
        ValueError, match="not a part of the RegisterLayout"
    ):
        tri.rectangular_register(8, 3)


def test_layout_draw(layout, patch_plt_show):
    layout.draw()
