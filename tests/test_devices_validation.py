"""Device specification and validation rules.

Exercises the device dataclass invariants, register/layout validators
(and their typed exceptions), virtual-device conversions, interaction
coefficients and the spec pretty-printers — with reference
cross-checks where numeric values are involved.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import pytest

sys.path.append("/root/reference/pulser-core")
ref = pytest.importorskip("pulser")

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.channels import Rydberg  # noqa: E402
from pulser_tpu.devices import (  # noqa: E402
    AnalogDevice,
    DigitalAnalogDevice,
    MockDevice,
    VirtualDevice,
)
from pulser_tpu.exceptions.sequence import (  # noqa: E402
    AtomsNumberError,
    DistanceError,
    RadiusError,
    RydbergLevelError,
    TrapsNumberTooLowError,
)
from pulser_tpu.register import (  # noqa: E402
    Register,
    TriangularLatticeLayout,
)


def test_interaction_coefficients_match_reference():
    for lvl in (50, 60, 70, 90, 100):
        # change_rydberg_level mutates in place; work on clones
        dev_t = dataclasses.replace(MockDevice)
        dev_r = dataclasses.replace(ref.MockDevice)
        dev_t.change_rydberg_level(lvl)
        dev_r.change_rydberg_level(lvl)
        assert dev_t.interaction_coeff == dev_r.interaction_coeff
    assert (
        MockDevice.interaction_coeff_xy
        == ref.MockDevice.interaction_coeff_xy
    )


def test_rydberg_blockade_radius():
    omega = 2 * np.pi
    rb_t = DigitalAnalogDevice.rydberg_blockade_radius(omega)
    rb_r = ref.DigitalAnalogDevice.rydberg_blockade_radius(omega)
    assert rb_t == pytest.approx(rb_r)
    back = DigitalAnalogDevice.rabi_from_blockade(rb_t)
    assert back == pytest.approx(omega)


def test_register_too_many_atoms():
    if DigitalAnalogDevice.max_atom_num is None:
        pytest.skip("no atom-number limit")
    n = DigitalAnalogDevice.max_atom_num + 1
    side = int(np.ceil(np.sqrt(n)))
    reg = Register.square(side, spacing=5.0, prefix="q")
    with pytest.raises(AtomsNumberError):
        DigitalAnalogDevice.validate_register(reg)


def test_register_min_distance():
    reg = Register(
        {"q0": (0.0, 0.0), "q1": (0.0, 1.0)}  # too close
    )
    with pytest.raises(DistanceError):
        DigitalAnalogDevice.validate_register(reg)


def test_register_radial_limit():
    r = DigitalAnalogDevice.max_radial_distance + 5
    reg = Register({"q0": (0.0, 0.0), "q1": (float(r), 0.0)})
    with pytest.raises(RadiusError):
        DigitalAnalogDevice.validate_register(reg)


def test_register_dimension_rules():
    reg3 = tpu.Register3D.cubic(2, spacing=5.0, prefix="q")
    with pytest.raises(ValueError):
        DigitalAnalogDevice.validate_register(reg3)
    # MockDevice supports 3D
    MockDevice.validate_register(reg3)


def test_change_rydberg_level_bounds():
    virt = dataclasses.replace(MockDevice)
    with pytest.raises(RydbergLevelError):
        virt.change_rydberg_level(49)
    with pytest.raises(RydbergLevelError):
        virt.change_rydberg_level(101)
    with pytest.raises((TypeError, RydbergLevelError)):
        virt.change_rydberg_level(70.5)
    virt.change_rydberg_level(70)
    assert virt.rydberg_level == 70


def test_device_to_virtual_roundtrip_properties():
    virt = AnalogDevice.to_virtual()
    assert isinstance(virt, VirtualDevice)
    assert virt.rydberg_level == AnalogDevice.rydberg_level
    assert virt.channels.keys() == AnalogDevice.channels.keys()


def test_layout_validation():
    layout = TriangularLatticeLayout(61, 5.0)
    AnalogDevice.validate_layout(layout)
    tiny = TriangularLatticeLayout(7, 5.0)
    if AnalogDevice.min_layout_traps > 7:
        with pytest.raises(TrapsNumberTooLowError):
            AnalogDevice.validate_layout(tiny)


def test_layout_filling_bounds():
    layout = TriangularLatticeLayout(61, 5.0)
    # One atom on a 61-trap layout breaks min_layout_filling when set
    reg = layout.define_register(0)
    if AnalogDevice.min_layout_filling > 1 / 61:
        with pytest.raises(ValueError):
            AnalogDevice.validate_layout_filling(reg)
    # Too many atoms for max_layout_filling
    n_traps = layout.number_of_traps
    max_fill = int(AnalogDevice.max_layout_filling * n_traps)
    if max_fill + 1 <= n_traps:
        reg_over = layout.define_register(*range(max_fill + 1))
        with pytest.raises(ValueError):
            AnalogDevice.validate_layout_filling(reg_over)


def test_calibrated_layouts_and_requires_layout():
    assert AnalogDevice.requires_layout
    names = {
        str(layout) for layout in AnalogDevice.calibrated_register_layouts
    }
    assert any("TriangularLatticeLayout" in n for n in names)
    # A register from a pre-calibrated layout passes QPU-style checks
    layout = AnalogDevice.pre_calibrated_layouts[0]
    reg = layout.define_register(*range(4))
    AnalogDevice.validate_register(reg)


def test_device_specs_strings():
    specs_t = DigitalAnalogDevice.specs
    specs_r = ref.DigitalAnalogDevice.specs
    assert specs_t == specs_r
    assert "Register parameters" in specs_t
    assert "Channels" in specs_t


def test_device_immutability():
    with pytest.raises(dataclasses.FrozenInstanceError):
        DigitalAnalogDevice.max_atom_num = 3


def test_supported_bases_and_states():
    assert "ground-rydberg" in DigitalAnalogDevice.supported_bases
    assert "digital" in DigitalAnalogDevice.supported_bases
    assert set(MockDevice.supported_states) >= {"r", "g", "h"}


def test_channel_validate_duration_rules():
    ch = AnalogDevice.channels["rydberg_global"]
    with pytest.raises(TypeError, match="castable to an int"):
        ch.validate_duration("abc")
    with pytest.raises(ValueError, match="at least"):
        ch.validate_duration(2)
    if ch.max_duration is not None:
        with pytest.raises(ValueError, match="at most"):
            ch.validate_duration(ch.max_duration + 1000)
    with pytest.warns(UserWarning, match="not a multiple"):
        rounded = ch.validate_duration(ch.clock_period * 4 + 1)
    assert rounded == ch.clock_period * 5


def test_channel_pulse_limits():
    ch = DigitalAnalogDevice.channels["rydberg_global"]
    too_strong = tpu.Pulse.ConstantPulse(
        100, ch.max_amp * 1.01, 0.0, 0.0
    )
    with pytest.raises(ValueError, match="maximum"):
        ch.validate_pulse(too_strong)
    too_detuned = tpu.Pulse.ConstantPulse(
        100, 1.0, ch.max_abs_detuning * 1.01, 0.0
    )
    with pytest.raises(ValueError, match="detuning"):
        ch.validate_pulse(too_detuned)


def test_custom_device_validation():
    # A hand-built Device must validate its own consistency
    ryd = Rydberg.Global(
        max_abs_detuning=10.0, max_amp=5.0, clock_period=1
    )
    dev = tpu.devices.Device(
        name="custom",
        dimensions=2,
        rydberg_level=61,
        max_atom_num=10,
        max_radial_distance=30,
        min_atom_distance=4.0,
        channel_objects=(ryd,),
    )
    assert dev.channels["rydberg_global"] is ryd
    with pytest.raises(ValueError):
        tpu.devices.Device(
            name="bad",
            dimensions=2,
            rydberg_level=61,
            max_atom_num=10,
            max_radial_distance=30,
            min_atom_distance=-1.0,  # negative distance
            channel_objects=(ryd,),
        )
