"""Register creation matrix, coords hashing, automatic layouts.

Complements tests/test_register.py with the reference's creation
error matrix, repr output, coordinate-hash semantics and the
with_automatic_layout trap-count bound matrix
(reference tests/test_register.py:27-115, 508-530, 672-766).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.register import Register, Register3D
from pulser_tpu.register.register_layout import RegisterLayout


class TestCreationMatrix:
    def test_empty_rejected(self):
        with pytest.raises(
            ValueError, match="Cannot create a Register"
        ):
            Register({})

    def test_coordinate_sizes(self):
        with pytest.raises(ValueError, match="vectors of size 2"):
            Register.from_coordinates([(0, 1, 0, 1)], prefix="q")
        with pytest.raises(ValueError, match="vectors of size 3"):
            Register3D.from_coordinates(
                [((1, 0),), ((-1, 0),)], prefix="q"
            )

    def test_prefix_and_labels_exclusive(self):
        with pytest.raises(
            NotImplementedError, match="prefix and a set of labels"
        ):
            Register.from_coordinates(
                [(0, 0), (1, 0)], prefix="a", labels=["a", "b"]
            )

    def test_label_length(self):
        with pytest.raises(ValueError, match="Label length"):
            Register.from_coordinates(
                [(0, 0), (1, 0)], center=False, labels=["a", "b", "c"]
            )
        reg = Register.from_coordinates(
            [(0, 0), (1, 0)], center=False, labels=["a", "b"]
        )
        assert reg._ids == ("a", "b")

    def test_uncentered_matches_dict_construction(self):
        coords = [(0, 0), (1, 0)]
        reg1 = Register(dict(zip(("q0", "q1"), coords)))
        reg2 = Register.from_coordinates(
            coords, center=False, prefix="q"
        )
        np.testing.assert_array_equal(
            np.array(reg1._coords, dtype=float),
            np.array(reg2._coords, dtype=float),
        )
        assert reg1._ids == reg2._ids

    def test_float32_input_upcast_and_centered(self):
        reg = Register.from_coordinates(
            np.array([(0, 0), (1, 0)], dtype=np.float32), prefix="foo"
        )
        assert reg._ids == ("foo0", "foo1")
        coords = np.array(reg._coords, dtype=np.float64)
        np.testing.assert_array_equal(
            coords, [(-0.5, 0), (0.5, 0)]
        )
        assert reg.sorted_coords.dtype == np.float64

    def test_rectangle_and_square_coords(self):
        reg4 = Register.rectangle(1, 2, spacing=1, prefix="q")
        np.testing.assert_array_equal(
            np.array(reg4._coords, dtype=float),
            [(-0.5, 0), (0.5, 0)],
        )
        reg5 = Register.square(2, spacing=2, prefix="q")
        np.testing.assert_array_equal(
            np.array(reg5._coords, dtype=float),
            [(-1, -1), (1, -1), (-1, 1), (1, 1)],
        )

    def test_triangular_lattice_coords(self):
        reg = Register.triangular_lattice(2, 2, spacing=4, prefix="q")
        np.testing.assert_allclose(
            np.array(reg._coords, dtype=float),
            [
                (-3, -np.sqrt(3)),
                (1, -np.sqrt(3)),
                (-1, np.sqrt(3)),
                (3, np.sqrt(3)),
            ],
        )

    def test_spurious_kwargs_rejected(self):
        with pytest.raises(
            ValueError, match="'layout' and 'trap_ids'"
        ):
            Register(
                {"q0": (0, 0)},
                spacing=10,
                layout="square",
                trap_ids=(0, 1, 3),
            )

    def test_int_ids_deprecated(self):
        with pytest.warns(DeprecationWarning, match="QubitId"):
            Register.from_coordinates([(0, 0)])


def test_repr():
    assert (
        repr(Register(dict(q0=(1.0, 0.0), q1=(-1, 5))))
        == "Register({'q0': array([1., 0.]), 'q1': array([-1.,  5.])})"
    )
    assert (
        repr(Register3D(dict(q0=(1, 2, 3))))
        == "Register3D({'q0': array([1., 2., 3.])})"
    )


def test_coords_hex_hash():
    reg1 = Register.square(2, prefix="foo")
    reg2 = Register.rectangle(2, 2, prefix="bar")
    assert reg1 != reg2  # ids differ
    coords1 = [np.array(c, dtype=float) for c in reg1.qubits.values()]
    coords2 = [np.array(c, dtype=float) for c in reg2.qubits.values()]
    np.testing.assert_equal(coords1, coords2)
    assert reg1.coords_hex_hash() == reg2.coords_hex_hash()

    # Order-independent
    reg3 = Register.from_coordinates(coords1[::-1], prefix="q")
    assert reg1.coords_hex_hash() == reg3.coords_hex_hash()

    # Sub-precision jitter keeps the hash
    coords1[0][0] += 1e-10
    reg4 = Register.from_coordinates(coords1, prefix="q")
    assert reg1.coords_hex_hash() == reg4.coords_hex_hash()

    # Above-precision changes break it
    coords1[0][1] += 1e-6
    reg5 = Register.from_coordinates(coords1, prefix="q")
    assert reg1.coords_hex_hash() != reg5.coords_hex_hash()


@pytest.mark.parametrize("optimal_filling", [None, 0.4])
def test_automatic_layout_bounds(optimal_filling):
    reg = tpu.Register.triangular_lattice(4, 5, spacing=5, prefix="q")
    max_layout_filling = 0.5
    min_traps = int(np.ceil(len(reg.qubits) / max_layout_filling))
    optimal_traps = int(
        np.ceil(
            len(reg.qubits) / (optimal_filling or max_layout_filling)
        )
    )
    device = dataclasses.replace(
        tpu.AnalogDevice,
        max_atom_num=44,
        max_layout_filling=max_layout_filling,
        optimal_layout_filling=optimal_filling,
        pre_calibrated_layouts=(),
    )
    device.validate_register(reg)

    new_reg = reg.with_automatic_layout(device, layout_slug="foo")
    assert new_reg.qubit_ids == reg.qubit_ids
    assert new_reg == reg
    assert isinstance(new_reg.layout, RegisterLayout)
    assert str(new_reg.layout) == "foo"
    trap_num = new_reg.layout.number_of_traps
    assert min_traps <= trap_num <= optimal_traps
    if not optimal_filling:
        assert trap_num == min_traps
        # The device's min_layout_traps floor is enforced
        bound_below = dataclasses.replace(
            device, min_layout_traps=trap_num + 1
        )
        assert (
            reg.with_automatic_layout(
                bound_below
            ).layout.number_of_traps
            == bound_below.min_layout_traps
        )
    else:
        assert trap_num > min_traps
        # The device's max_layout_traps cap is enforced
        bound_above = dataclasses.replace(
            device,
            max_layout_traps=trap_num - 1,
            max_layout_filling=device.max_layout_filling + 0.4,
        )
        assert (
            reg.with_automatic_layout(
                bound_above
            ).layout.number_of_traps
            == bound_above.max_layout_traps
        )


def test_automatic_layout_errors():
    reg = tpu.Register.triangular_lattice(4, 5, spacing=5, prefix="q")
    device = dataclasses.replace(
        tpu.AnalogDevice,
        max_atom_num=52,
        max_layout_filling=0.5,
        pre_calibrated_layouts=(),
    )
    with pytest.raises(TypeError, match="must be of type Device"):
        reg.with_automatic_layout(tpu.MockDevice)
    with pytest.raises(RuntimeError, match="Failed to find a site"):
        reg.with_automatic_layout(
            dataclasses.replace(device, min_layout_traps=200)
        )
    # A register too large for max_layout_traps fails...
    big_reg = tpu.Register.square(8, spacing=5, prefix="q")
    min_traps = np.ceil(len(big_reg.qubit_ids) / 0.5)
    with pytest.raises(RuntimeError, match="Failed to find a site"):
        big_reg.with_automatic_layout(
            dataclasses.replace(
                device, max_layout_traps=int(min_traps - 2)
            )
        )
    # ...but works without the cap
    assert (
        big_reg.with_automatic_layout(device).layout.number_of_traps
        >= min_traps
    )
