"""Register/Register3D geometry, constructors and layout tests.

Coverage modeled on the reference's ``tests/test_register.py`` and
``tests/test_register_layout.py`` (constructor validation, exact
lattice coordinates, rotation, hashing, 3D projections, layouts).
"""

from __future__ import annotations

import numpy as np
import pytest

from pulser_tpu import Register, Register3D
from pulser_tpu.devices import DigitalAnalogDevice, MockDevice
from pulser_tpu.register import RegisterLayout

CREST_Y = np.sqrt(3) / 2.0


class TestCreation:
    def test_from_dict(self):
        reg = Register({"a": (0, 0), "b": (1, 1)})
        assert set(reg.qubit_ids) == {"a", "b"}
        np.testing.assert_allclose(
            np.asarray(reg.qubits["b"], dtype=float), [1, 1]
        )

    def test_rejects_empty(self):
        with pytest.raises(ValueError, match="Cannot create a Register"):
            Register({})

    def test_rejects_bad_coords(self):
        with pytest.raises(ValueError):
            Register({"a": (0, 0, 0)})  # 3D coords in a 2D register
        with pytest.raises(ValueError):
            Register3D({"a": (0, 0)})  # 2D coords in a 3D register

    def test_from_coordinates_centering(self):
        reg = Register.from_coordinates(
            [(0, 0), (2, 0)], center=True, prefix="q"
        )
        coords = np.array(
            [np.asarray(c, dtype=float) for c in reg.qubits.values()]
        )
        np.testing.assert_allclose(
            coords, [[-1.0, 0.0], [1.0, 0.0]]
        )
        reg_off = Register.from_coordinates(
            [(0, 0), (2, 0)], center=False, prefix="q"
        )
        coords_off = np.array(
            [
                np.asarray(c, dtype=float)
                for c in reg_off.qubits.values()
            ]
        )
        np.testing.assert_allclose(coords_off, [[0, 0], [2, 0]])

    def test_prefix_and_labels(self):
        reg = Register.from_coordinates(
            [(0, 0), (1, 0)], prefix="atom"
        )
        assert reg.qubit_ids == ("atom0", "atom1")
        reg2 = Register.from_coordinates(
            [(0, 0), (1, 0)], labels=["x", "y"]
        )
        assert reg2.qubit_ids == ("x", "y")
        with pytest.raises(ValueError, match="Label length"):
            Register.from_coordinates(
                [(0, 0), (1, 0)], labels=["only-one"]
            )


class TestLatticeConstructors:
    def test_rectangular_lattice_validation(self):
        with pytest.raises(ValueError, match="The number of rows"):
            Register.rectangular_lattice(0, 2, 3, 4)
        with pytest.raises(ValueError, match="The number of columns"):
            Register.rectangular_lattice(2, 0, 3, 4)
        with pytest.raises(ValueError, match="Spacing"):
            Register.rectangular_lattice(2, 2, 0.0, 5)
        with pytest.raises(ValueError, match="Spacing"):
            Register.rectangular_lattice(2, 2, 3, 0.0)

    def test_rectangular_lattice_coords(self):
        reg = Register.rectangular_lattice(
            2, 2, row_spacing=4.0, col_spacing=2.0, prefix="q"
        )
        coords = np.array(
            [np.asarray(c, dtype=float) for c in reg.qubits.values()]
        )
        np.testing.assert_allclose(
            coords,
            [[-1, -2], [1, -2], [-1, 2], [1, 2]],
        )

    def test_rectangle_and_square_validation(self):
        with pytest.raises(ValueError, match="The number of rows"):
            Register.rectangle(0, 2)
        with pytest.raises(ValueError, match="The number of columns"):
            Register.rectangle(2, 0)
        with pytest.raises(ValueError, match="Spacing"):
            Register.rectangle(2, 2, 0.0)
        with pytest.raises(
            ValueError, match="The number of atoms per side"
        ):
            Register.square(0)
        with pytest.raises(ValueError, match="Spacing"):
            Register.square(2, 0.0)

    def test_square_coords(self):
        reg = Register.square(2, spacing=2.0, prefix="q")
        coords = np.array(
            [np.asarray(c, dtype=float) for c in reg.qubits.values()]
        )
        np.testing.assert_allclose(
            coords, [[-1, -1], [1, -1], [-1, 1], [1, 1]]
        )

    def test_triangular_lattice_validation(self):
        with pytest.raises(ValueError, match="The number of rows"):
            Register.triangular_lattice(0, 2)
        with pytest.raises(
            ValueError, match="The number of atoms per row"
        ):
            Register.triangular_lattice(2, 0)
        with pytest.raises(ValueError, match="Spacing"):
            Register.triangular_lattice(2, 2, 0.0)

    def test_triangular_lattice_geometry(self):
        reg = Register.triangular_lattice(
            2, 2, spacing=1.0, prefix="q"
        )
        coords = np.array(
            [np.asarray(c, dtype=float) for c in reg.qubits.values()]
        )
        # Second row offset by half a spacing, crest height sqrt(3)/2
        diffs = coords[2:] - coords[:2]
        np.testing.assert_allclose(
            diffs, [[0.5, CREST_Y], [0.5, CREST_Y]]
        )

    def test_hexagon_validation(self):
        with pytest.raises(ValueError, match="The number of layers"):
            Register.hexagon(0)
        with pytest.raises(ValueError, match="Spacing "):
            Register.hexagon(1, spacing=-1.0)

    def test_hexagon_single_layer(self):
        reg = Register.hexagon(1, spacing=1.0, prefix="q")
        assert len(reg.qubits) == 7
        atoms = [
            np.asarray(c, dtype=float) for c in reg.qubits.values()
        ]
        np.testing.assert_allclose(atoms[0], [0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(atoms[1], [-0.5, CREST_Y])
        np.testing.assert_allclose(atoms[2], [0.5, CREST_Y])
        np.testing.assert_allclose(atoms[3], [1.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(atoms[4], [0.5, -CREST_Y])
        np.testing.assert_allclose(atoms[5], [-0.5, -CREST_Y])
        np.testing.assert_allclose(atoms[6], [-1.0, 0.0], atol=1e-12)

    def test_hexagon_two_layers(self):
        reg = Register.hexagon(2, spacing=1.0, prefix="q")
        assert len(reg.qubits) == 19
        atoms = [
            np.asarray(c, dtype=float) for c in reg.qubits.values()
        ]
        np.testing.assert_allclose(atoms[7], [-1.5, CREST_Y])
        np.testing.assert_allclose(atoms[8], [-1.0, 2 * CREST_Y])
        np.testing.assert_allclose(
            atoms[9], [-0.0, 2 * CREST_Y], atol=1e-12
        )
        np.testing.assert_allclose(atoms[13], [1.5, -CREST_Y])
        np.testing.assert_allclose(atoms[14], [1.0, -2 * CREST_Y])
        np.testing.assert_allclose(
            atoms[15], [0.0, -2 * CREST_Y], atol=1e-12
        )


class TestMaxConnectivity:
    def test_validation(self):
        with pytest.raises(TypeError):
            Register.max_connectivity(2, None)
        with pytest.raises(
            ValueError, match=r"The number of qubits(.+)greater than"
        ):
            Register.max_connectivity(0, DigitalAnalogDevice)
        with pytest.raises(
            ValueError, match=r"The number of qubits(.+)less than"
        ):
            Register.max_connectivity(
                DigitalAnalogDevice.max_atom_num + 1,
                DigitalAnalogDevice,
            )
        spacing = DigitalAnalogDevice.min_atom_distance
        with pytest.raises(ValueError, match="Spacing "):
            Register.max_connectivity(
                10, DigitalAnalogDevice, spacing=spacing - 1.0
            )
        with pytest.raises(
            NotImplementedError,
            match="not well defined for a device with"
            " 'min_atom_distance=0.0'",
        ):
            Register.max_connectivity(10, MockDevice)

    def test_small_counts_follow_hexagon_fill(self):
        spacing = DigitalAnalogDevice.min_atom_distance
        hex_coords = spacing * np.array(
            [
                (0.0, 0.0),
                (-0.5, CREST_Y),
                (0.5, CREST_Y),
                (1.0, 0.0),
                (0.5, -CREST_Y),
                (-0.5, -CREST_Y),
            ]
        )
        for i in range(1, 7):
            reg = Register.max_connectivity(
                i, DigitalAnalogDevice, prefix="q"
            )
            DigitalAnalogDevice.validate_register(reg)
            atoms = [
                np.asarray(c, dtype=float)
                for c in reg.qubits.values()
            ]
            assert len(atoms) == i
            np.testing.assert_allclose(
                np.array(atoms), hex_coords[:i], atol=1e-9
            )

    def test_two_full_layers(self):
        spacing = DigitalAnalogDevice.min_atom_distance
        reg = Register.max_connectivity(
            19, DigitalAnalogDevice, prefix="q"
        )
        DigitalAnalogDevice.validate_register(reg)
        atoms = [
            np.asarray(c, dtype=float) for c in reg.qubits.values()
        ]
        np.testing.assert_allclose(
            atoms[7], [-1.5 * spacing, CREST_Y * spacing]
        )
        np.testing.assert_allclose(
            atoms[8], [-1.0 * spacing, 2 * CREST_Y * spacing]
        )
        np.testing.assert_allclose(
            atoms[13], [1.5 * spacing, -CREST_Y * spacing]
        )
        np.testing.assert_allclose(
            atoms[14], [1.0 * spacing, -2 * CREST_Y * spacing]
        )


def test_rotated():
    reg = Register.square(2, spacing=np.sqrt(2), prefix="q")
    rot = reg.rotated(45)
    np.testing.assert_allclose(
        rot._coords_arr.as_array(),
        np.array([(0, -1), (1, 0), (-1, 0), (0, 1)], dtype=float),
        atol=1e-12,
    )
    assert rot != reg
    # Full turn is identity
    np.testing.assert_allclose(
        reg.rotated(360)._coords_arr.as_array(),
        reg._coords_arr.as_array(),
        atol=1e-9,
    )


def test_find_indices():
    reg = Register({"a": (0, 0), "b": (1, 0), "c": (2, 0)})
    assert reg.find_indices(["c", "a"]) == [2, 0]
    with pytest.raises(
        ValueError, match="IDs list must be selected among"
    ):
        reg.find_indices(["d"])


def test_equality_and_hash():
    a = Register({"q0": (0, 0), "q1": (1, 1)})
    b = Register({"q0": (0, 0), "q1": (1, 1)})
    c = Register({"q0": (0, 0), "q1": (1, 1.001)})
    assert a == b
    assert a != c
    assert a != "not a register"
    # Equality tolerates fp noise; the hash rounds at COORD_PRECISION
    # (6 decimals) so it distinguishes what equality cannot
    eps = Register({"q0": (0, 0), "q1": (1, 1.000001)})
    assert a == eps
    assert a.coords_hex_hash() != eps.coords_hex_hash()
    # The hash is qubit-order-insensitive (coords are sorted)
    d = Register({"q1": (1, 1), "q0": (0, 0)})
    assert a.coords_hex_hash() == d.coords_hex_hash()


class TestRegister3D:
    def test_cuboid(self):
        reg = Register3D.cuboid(1, 2, 1, spacing=1.0, prefix="q")
        assert len(reg.qubits) == 2
        with pytest.raises(ValueError, match="The number of rows"):
            Register3D.cuboid(0, 2, 2, prefix="q")
        with pytest.raises(ValueError, match="The number of columns"):
            Register3D.cuboid(2, 0, 2, prefix="q")
        with pytest.raises(ValueError, match="The number of layers"):
            Register3D.cuboid(2, 2, 0, prefix="q")
        with pytest.raises(ValueError, match="Spacing"):
            Register3D.cuboid(2, 2, 2, 0.0, prefix="q")

    def test_cubic(self):
        reg = Register3D.cubic(2, spacing=1.0, prefix="q")
        assert len(reg.qubits) == 8
        with pytest.raises(
            ValueError, match="The number of atoms per side"
        ):
            Register3D.cubic(0)
        with pytest.raises(ValueError, match="Spacing"):
            Register3D.cubic(2, spacing=-3.0)

    def test_to_2D(self):
        reg = Register3D.cubic(2, spacing=1.0, prefix="q")
        with pytest.raises(
            ValueError, match="Atoms are not coplanar"
        ):
            reg.to_2D()
        flat = Register3D(
            {
                "q0": (0.0, 0.0, 0.0),
                "q1": (1.0, 0.0, 0.0),
                "q2": (0.0, 1.0, 0.0),
            }
        )
        reg2d = flat.to_2D()
        assert isinstance(reg2d, Register)
        assert len(reg2d.qubits) == 3

    def test_to_2D_with_tolerance(self):
        wobbly = Register3D(
            {
                "q0": (0.0, 0.0, 0.01),
                "q1": (10.0, 0.0, -0.01),
                "q2": (0.0, 10.0, 0.0),
            }
        )
        with pytest.raises(ValueError, match="not coplanar"):
            wobbly.to_2D()
        assert len(wobbly.to_2D(tol_width=0.1).qubits) == 3


class TestLayouts:
    def test_define_register_from_layout(self):
        layout = RegisterLayout(
            [[0, 0], [5, 0], [0, 5], [5, 5]], slug="2x2"
        )
        reg = layout.define_register(0, 3, qubit_ids=["a", "b"])
        assert reg.qubit_ids == ("a", "b")
        assert reg.layout == layout
        assert reg._layout_info is not None
        with pytest.raises(
            ValueError,
            match="must correspond to the ID of a trap",
        ):
            layout.define_register(4)

    def test_mappable_register(self):
        layout = RegisterLayout(
            [[0, 0], [5, 0], [0, 5], [5, 5]], slug="2x2"
        )
        mapp = layout.make_mappable_register(2)
        assert mapp.qubit_ids == ("q0", "q1")
        reg = mapp.build_register({"q0": 1, "q1": 2})
        assert set(reg.qubit_ids) == {"q0", "q1"}

    def test_detuning_map_from_register(self):
        reg = Register.square(2, spacing=5.0, prefix="q")
        dmap = reg.define_detuning_map(
            {"q0": 1.0, "q1": 0.5, "q2": 0.0, "q3": 0.0}
        )
        qubit_weights = dmap.get_qubit_weight_map(reg.qubits)
        assert qubit_weights["q0"] == pytest.approx(1.0)
        assert qubit_weights["q1"] == pytest.approx(0.5)
        with pytest.raises(
            ValueError, match="weights must be between 0 and 1"
        ):
            reg.define_detuning_map({"q0": 1.5})

    def test_automatic_layout(self):
        reg = Register.square(3, spacing=6.0, prefix="q")
        new_reg = reg.with_automatic_layout(DigitalAnalogDevice)
        assert new_reg.layout is not None
        # Same qubit positions, now backed by a layout
        np.testing.assert_allclose(
            new_reg._coords_arr.as_array(),
            reg._coords_arr.as_array(),
        )
        assert (
            new_reg.layout.number_of_traps
            >= len(reg.qubit_ids)
        )
        with pytest.raises(TypeError, match="device"):
            reg.with_automatic_layout(None)


def test_drawing_register(patch_plt_show):
    reg = Register.square(2, spacing=6.0, prefix="q")
    reg.draw(blockade_radius=7.0, draw_graph=True, draw_half_radius=True)
    with pytest.raises(ValueError, match="'blockade_radius' to draw"):
        reg.draw(draw_half_radius=True)


def test_drawing_register3d(patch_plt_show):
    reg = Register3D.cubic(2, spacing=6.0, prefix="q")
    reg.draw(blockade_radius=7.0, draw_half_radius=True)
