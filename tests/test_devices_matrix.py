"""Device construction validation matrix.

Mirrors the reference's tests/test_devices.py post-init checks:
type errors, value errors, SLM/DMM compatibility, optional params,
default channel IDs, eigenstates, and virtual-device conversion.
"""

from __future__ import annotations

import re
from dataclasses import FrozenInstanceError, replace

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels import Microwave, Raman, Rydberg
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.devices._device_datacls import Device, VirtualDevice
from pulser_tpu.devices.interaction_coefficients import c3_dict, c6_dict


@pytest.fixture
def test_params():
    return dict(
        name="Test",
        dimensions=2,
        rydberg_level=70,
        channel_ids=None,
        channel_objects=(),
        min_atom_distance=1,
        max_atom_num=None,
        max_radial_distance=None,
        min_layout_traps=10,
        max_layout_traps=100,
    )


@pytest.mark.parametrize(
    "param, value, msg",
    [
        ("name", 1, None),
        ("supports_slm_mask", 0, None),
        ("reusable_channels", "true", None),
        ("max_atom_num", 1e9, None),
        ("max_radial_distance", 100.4, None),
        ("rydberg_level", 70.0, "Rydberg level has to be an int."),
        (
            "channel_ids",
            {"fake_channel"},
            "'channel_ids' must be a tuple or a list of strings",
        ),
        (
            "channel_ids",
            ("ch1", 2),
            "'channel_ids' must be a tuple or a list of strings",
        ),
        (
            "channel_objects",
            ("Rydberg.Global(None, None)",),
            "All channels must be of type 'Channel', not 'str'",
        ),
        (
            "dmm_objects",
            ("DMM(bottom_detuning=-1)",),
            "All DMM channels must be of type 'DMM', not 'str'",
        ),
        ("max_sequence_duration", 1.02, None),
        ("max_runs", 1e8, None),
    ],
)
def test_post_init_type_checks(test_params, param, value, msg):
    test_params[param] = value
    error_msg = msg or f"{param} must be of type"
    with pytest.raises(TypeError, match=error_msg):
        VirtualDevice(**test_params)


@pytest.mark.parametrize(
    "param, value, msg",
    [
        (
            "dimensions",
            1,
            re.escape("'dimensions' must be one of (2, 3), not 1."),
        ),
        (
            "rydberg_level",
            49,
            "Rydberg level should be between 50 and 100.",
        ),
        (
            "rydberg_level",
            101,
            "Rydberg level should be between 50 and 100.",
        ),
        (
            "min_atom_distance",
            -0.001,
            "'min_atom_distance' must be greater than or equal to zero",
        ),
        ("max_atom_num", 0, None),
        ("max_radial_distance", 0, None),
        (
            "max_layout_filling",
            0.0,
            "maximum layout filling fraction must be greater than 0.",
        ),
        (
            "min_layout_filling",
            0.5,
            "minimum layout filling fraction must be greater than or"
            " equal to 0.",
        ),
        (
            "optimal_layout_filling",
            -0.1,
            "optimal layout filling fraction",
        ),
        (
            "optimal_layout_filling",
            0.9,
            "optimal layout filling fraction",
        ),
        (
            "min_layout_traps",
            0,
            "'min_layout_traps' must be greater than zero",
        ),
        ("max_layout_traps", 0, None),
        (
            "max_atom_num",
            100,
            "a layout supports at most 50 atoms",
        ),
        (
            "max_layout_traps",
            9,
            "must be greater than or equal to the minimum",
        ),
        (
            "channel_ids",
            ("rydberg_global", "rydberg_global"),
            "can't have repeated elements",
        ),
        (
            "channel_ids",
            ("rydberg_global",),
            "number of channel IDs must match",
        ),
        ("max_sequence_duration", 0, None),
        ("max_runs", 0, None),
    ],
)
def test_post_init_value_errors(test_params, param, value, msg):
    if param == "channel_ids" and len(value) != len(
        test_params["channel_objects"]
    ):
        test_params["channel_objects"] = tuple(
            Rydberg.Global(None, None) for _ in range(2)
        )
    error_msg = (
        msg or f"When defined, '{param}' must be greater than zero"
    )
    test_params[param] = value
    with pytest.raises(ValueError, match=error_msg):
        VirtualDevice(**test_params)


def test_post_init_slm_dmm_compatibility(test_params):
    test_params["supports_slm_mask"] = True
    test_params["dmm_objects"] = ()
    with pytest.raises(
        ValueError,
        match="One DMM object should be defined to support SLM mask",
    ):
        VirtualDevice(**test_params)


_POTENTIAL = ["max_atom_num", "max_radial_distance"]
_ALWAYS_NONE_OK = ["max_sequence_duration", "max_runs"]


@pytest.mark.parametrize("none_param", _POTENTIAL + _ALWAYS_NONE_OK)
def test_optional_parameters(test_params, none_param):
    test_params.update({p: 10 for p in _POTENTIAL})
    test_params[none_param] = None
    if none_param not in _ALWAYS_NONE_OK:
        with pytest.raises(
            TypeError,
            match=f"'{none_param}' can't be None in a 'Device'",
        ):
            Device(**test_params)
    else:
        Device(**test_params)
    VirtualDevice(**test_params)


def test_default_channel_ids(test_params):
    test_params["channel_objects"] = (
        Rydberg.Local(None, None),
        Raman.Local(None, None),
        Rydberg.Local(None, None),
        Raman.Global(None, None),
        Microwave.Global(None, None),
    )
    dev = VirtualDevice(**test_params)
    assert dev.channel_ids == (
        "rydberg_local",
        "raman_local",
        "rydberg_local_2",
        "raman_global",
        "mw_global",
    )


@pytest.mark.parametrize(
    "channels, states",
    [
        ((Rydberg.Local(None, None),), ["r", "g"]),
        ((Raman.Local(None, None),), ["g", "h"]),
        (tpu.DigitalAnalogDevice.channel_objects, ["r", "g", "h"]),
        (
            (
                Microwave.Global(None, None),
                Raman.Global(None, None),
            ),
            ["u", "d", "g", "h"],
        ),
        ((Microwave.Global(None, None),), ["u", "d"]),
        (tpu.MockDevice.channel_objects, ["u", "d", "r", "g", "h"]),
    ],
)
def test_eigenstates(test_params, channels, states):
    test_params["channel_objects"] = channels
    assert VirtualDevice(**test_params).supported_states == states


def test_tuple_conversion(test_params):
    test_params["channel_objects"] = [Rydberg.Global(None, None)]
    test_params["channel_ids"] = ["custom_channel"]
    dev = VirtualDevice(**test_params)
    assert dev.channel_objects == (Rydberg.Global(None, None),)
    assert dev.channel_ids == ("custom_channel",)


def test_valid_devices():
    for dev in (
        tpu.AnalogDevice,
        tpu.DigitalAnalogDevice,
        tpu.WeightedAnalogDevice,
    ):
        assert dev.dimensions in (2, 3)
        assert dev.rydberg_level > 49
        assert dev.rydberg_level < 101
        assert dev.max_atom_num > 10
        assert dev.max_radial_distance > 10
        assert dev.interaction_coeff > 0
        assert 0 < dev.max_layout_filling <= 1
        assert isinstance(dev.channels, dict)
        with pytest.raises(FrozenInstanceError):
            dev.name = "something else"
    assert tpu.MockDevice.max_atom_num is None
    assert tpu.MockDevice.max_radial_distance is None


class TestInteractionCoefficients:
    def test_c3_coeffs_cover_valid_rydberg_levels(self):
        assert set(c6_dict) == set(range(50, 101))
        assert set(range(50, 101)).issubset(set(c3_dict))

    def test_inferred_from_rydberg_level(self, test_params):
        dev = VirtualDevice(**test_params)
        assert dev.interaction_coeff_xy == c3_dict[70]
        assert dev.interaction_coeff == c6_dict[70]

    def test_follows_rydberg_level_change(self, test_params):
        dev = VirtualDevice(**test_params)
        # change_rydberg_level mutates a VirtualDevice in place
        dev.change_rydberg_level(60)
        assert dev.rydberg_level == 60
        assert dev.interaction_coeff_xy == c3_dict[60]
        assert dev.interaction_coeff == c6_dict[60]

    def test_custom_coeff_deprecated(self, test_params):
        with pytest.warns(
            DeprecationWarning, match="interaction_coeff_xy"
        ):
            dev = VirtualDevice(
                **test_params, interaction_coeff_xy=500.0
            )
        assert dev.interaction_coeff_xy == 500.0
        assert dev._custom_interaction_coeff_xy == 500.0
        # A custom coefficient is unaffected by a rydberg-level change
        dev.change_rydberg_level(60)
        assert dev.interaction_coeff_xy == 500.0

    def test_custom_coeff_type(self, test_params):
        with pytest.raises(TypeError):
            with pytest.warns(
                DeprecationWarning, match="interaction_coeff_xy"
            ):
                VirtualDevice(
                    **test_params, interaction_coeff_xy="large"
                )


def test_rydberg_blockade():
    dev = tpu.MockDevice
    omega = 2 * np.pi
    radius = dev.rydberg_blockade_radius(omega)
    assert np.isclose(
        dev.rabi_from_blockade(radius), omega, atol=1e-9
    )
    # The blockade radius grows as Omega shrinks
    assert dev.rydberg_blockade_radius(omega / 10) > radius


def test_convert_to_virtual():
    virtual = tpu.AnalogDevice.to_virtual()
    assert isinstance(virtual, VirtualDevice)
    assert not isinstance(virtual, Device)
    assert virtual.rydberg_level == tpu.AnalogDevice.rydberg_level
    assert (
        virtual.channel_objects == tpu.AnalogDevice.channel_objects
    )
    # Calibrated layouts don't carry over to the virtual version
    assert not hasattr(virtual, "pre_calibrated_layouts")


def test_convert_to_virtual_keeps_custom_coeff():
    with pytest.warns(DeprecationWarning, match="interaction_coeff_xy"):
        dev = replace(tpu.AnalogDevice, interaction_coeff_xy=1234.5)
    assert dev.to_virtual().interaction_coeff_xy == 1234.5


def test_dmm_channels():
    assert tuple(tpu.DigitalAnalogDevice.dmm_channels) == ("dmm_0",)
    # A fully-specified DMM pair works on a physical device...
    dev = replace(
        tpu.DigitalAnalogDevice,
        dmm_objects=(
            DMM(bottom_detuning=-1, total_bottom_detuning=-100),
            DMM(bottom_detuning=-2, total_bottom_detuning=-200),
        ),
    )
    assert tuple(dev.dmm_channels) == ("dmm_0", "dmm_1")
    assert dev.dmm_channels["dmm_0"] == dev.dmm_objects[0]
    # ...but a virtual (under-specified) DMM is rejected there
    with pytest.raises(ValueError, match="virtual channels"):
        replace(tpu.DigitalAnalogDevice, dmm_objects=(DMM(),))
    virt = replace(tpu.MockDevice, dmm_objects=(DMM(), DMM()))
    assert tuple(virt.dmm_channels) == ("dmm_0", "dmm_1")


def test_default_noise_model_attachment():
    noise = tpu.NoiseModel(p_false_pos=0.1)
    dev = replace(tpu.AnalogDevice, default_noise_model=noise)
    assert dev.default_noise_model == noise
    assert tpu.AnalogDevice.default_noise_model is None
