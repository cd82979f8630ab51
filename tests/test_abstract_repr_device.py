"""Device abstract-repr serialization: schema, roundtrips, errors.

Mirrors the reference's tests/test_abstract_repr.py::TestDevice matrix.
"""

from __future__ import annotations

import json
from copy import deepcopy
from dataclasses import replace

import pytest

import pulser_tpu as tpu
from pulser_tpu.channels import Rydberg
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.channels.eom import RydbergBeam, RydbergEOM
from pulser_tpu.devices._device_datacls import Device, VirtualDevice
from pulser_tpu.exceptions.serialization import (
    AbstractReprError,
    DeserializeDeviceError,
)
from pulser_tpu.json.abstract_repr.deserializer import deserialize_device
from pulser_tpu.json.abstract_repr.validation import validate_abstract_repr

ALL_DEVICES = [
    tpu.DigitalAnalogDevice,
    tpu.MockDevice,
    tpu.AnalogDevice,
    tpu.WeightedAnalogDevice,
]


@pytest.fixture(params=ALL_DEVICES, ids=lambda d: d.name)
def abstract_device(request):
    return json.loads(request.param.to_abstract_repr())


def _check_wrapped(obj_str, original_err, func=deserialize_device):
    """deserialize raises DeserializeDeviceError chained on the cause."""
    with pytest.raises(DeserializeDeviceError) as exc_info:
        func(obj_str)
    cause = exc_info.value.__cause__
    assert isinstance(cause, original_err)
    return cause


class TestDeviceSerialization:
    def test_schema(self, abstract_device):
        validate_abstract_repr(json.dumps(abstract_device), "device")

    def test_version_stamp(self, abstract_device):
        assert abstract_device["pulser_version"]

    def test_roundtrip(self, abstract_device):
        device = deserialize_device(json.dumps(abstract_device))
        assert json.loads(device.to_abstract_repr()) == abstract_device

    def test_interaction_coeff_xy_inferred(self, abstract_device):
        from pulser_tpu.devices.interaction_coefficients import c3_dict

        ryd_lvl = abstract_device["rydberg_level"]
        assert (
            abstract_device["interaction_coeff_xy"] == c3_dict[ryd_lvl]
        )
        device = deserialize_device(json.dumps(abstract_device))
        assert device._custom_interaction_coeff_xy is None

    def test_custom_interaction_coeff_xy_roundtrip(self):
        with pytest.warns(
            DeprecationWarning, match="interaction_coeff_xy"
        ):
            dev = replace(tpu.MockDevice, interaction_coeff_xy=4321.0)
        abstract_repr = dev.to_abstract_repr()
        assert (
            json.loads(abstract_repr)["interaction_coeff_xy"] == 4321.0
        )
        with pytest.warns(
            DeprecationWarning, match="interaction_coeff_xy"
        ):
            re_dev = deserialize_device(abstract_repr)
        assert re_dev == dev
        assert re_dev.interaction_coeff_xy == 4321.0


class TestDeviceDeserializationErrors:
    def test_typed_entry_points(self, abstract_device):
        dev_str = json.dumps(abstract_device)
        good_device = deserialize_device(dev_str)
        assert type(good_device).from_abstract_repr(dev_str) == (
            good_device
        )
        if isinstance(good_device, Device):
            assert (
                VirtualDevice.from_abstract_repr(dev_str)
                == good_device.to_virtual()
            )
        else:
            with pytest.raises(
                TypeError, match="not related to a Device"
            ):
                Device.from_abstract_repr(dev_str)

    def test_rejects_non_string(self, abstract_device):
        _check_wrapped(abstract_device, TypeError)
        with pytest.raises(TypeError, match="string"):
            Device.from_abstract_repr(abstract_device)
        with pytest.raises(TypeError, match="string"):
            VirtualDevice.from_abstract_repr(abstract_device)

    def test_json_decode_error(self):
        bad_str = "﻿"
        for func in (
            deserialize_device,
            Device.from_abstract_repr,
            VirtualDevice.from_abstract_repr,
        ):
            cause = _check_wrapped(bad_str, AbstractReprError, func)
            assert "not a valid JSON string" in str(cause)
            assert isinstance(cause.__cause__, json.JSONDecodeError)

    def test_schema_violation(self, abstract_device):
        invalid_dev = dict(abstract_device)
        invalid_dev["rydberg_level"] = "70"
        for func in (
            deserialize_device,
            Device.from_abstract_repr,
            VirtualDevice.from_abstract_repr,
        ):
            _check_wrapped(json.dumps(invalid_dev), Exception, func)

    def test_bad_eom_config(self):
        abstract_device = json.loads(
            tpu.AnalogDevice.to_abstract_repr()
        )
        assert (
            "max_limiting_amp"
            in abstract_device["channels"][0]["eom_config"]
        )
        bad_eom_dev = deepcopy(abstract_device)
        bad_eom_dev["channels"][0]["eom_config"][
            "max_limiting_amp"
        ] = 0.0
        for func in (
            deserialize_device,
            Device.from_abstract_repr,
            VirtualDevice.from_abstract_repr,
        ):
            cause = _check_wrapped(
                json.dumps(bad_eom_dev), AbstractReprError, func
            )
            assert "RydbergEOM" in str(cause)
            assert isinstance(cause.__cause__, ValueError)

    def test_bad_channel_value(self, abstract_device):
        bad_ch_dev = deepcopy(abstract_device)
        bad_ch_dev["channels"][0]["min_duration"] = -1
        for func in (
            deserialize_device,
            Device.from_abstract_repr,
            VirtualDevice.from_abstract_repr,
        ):
            cause = _check_wrapped(
                json.dumps(bad_ch_dev), AbstractReprError, func
            )
            assert "Channel deserialization failed" in str(cause)
            assert isinstance(cause.__cause__, ValueError)

    def test_bad_layout(self, abstract_device):
        good_device = deserialize_device(json.dumps(abstract_device))
        if not isinstance(good_device, Device):
            pytest.skip("layouts only exist on physical devices")
        bad_layout_dev = dict(abstract_device)
        bad_layout_dev["pre_calibrated_layouts"] = [
            {"coordinates": [[0, 0], [0.0, 0.0]]}
        ]
        cause = _check_wrapped(
            json.dumps(bad_layout_dev), AbstractReprError
        )
        assert "layout" in str(cause).lower()
        assert isinstance(cause.__cause__, ValueError)

    def test_bad_device_value(self, abstract_device):
        bad_dev = dict(abstract_device)
        bad_dev["min_atom_distance"] = -1
        for func in (
            deserialize_device,
            Device.from_abstract_repr,
            VirtualDevice.from_abstract_repr,
        ):
            cause = _check_wrapped(
                json.dumps(bad_dev), AbstractReprError, func
            )
            assert "Device deserialization failed" in str(cause)
            assert isinstance(cause.__cause__, ValueError)


class TestOptionalFields:
    @pytest.mark.parametrize(
        "og_device, field, value",
        [
            (tpu.MockDevice, "max_sequence_duration", 1000),
            (tpu.MockDevice, "max_runs", 100),
            (tpu.MockDevice, "optimal_layout_filling", 0.4),
            (tpu.AnalogDevice, "min_layout_filling", 0.2),
            (tpu.MockDevice, "min_layout_traps", 10),
            (tpu.MockDevice, "max_layout_traps", 200),
            (tpu.MockDevice, "requires_layout", True),
            (tpu.AnalogDevice, "requires_layout", False),
            (tpu.AnalogDevice, "accepts_new_layouts", False),
        ],
    )
    def test_optional_device_fields(self, og_device, field, value):
        device = replace(og_device, **{field: value})
        dev_str = device.to_abstract_repr()
        assert device == deserialize_device(dev_str)
        assert device == type(og_device).from_abstract_repr(dev_str)
        if isinstance(og_device, Device):
            assert (
                device.to_virtual()
                == VirtualDevice.from_abstract_repr(dev_str)
            )
        else:
            with pytest.raises(
                TypeError, match="not related to a Device"
            ):
                Device.from_abstract_repr(dev_str)

    @pytest.mark.parametrize(
        "ch_obj",
        [
            Rydberg.Global(None, None, min_avg_amp=1),
            Rydberg.Global(None, None, propagation_dir=(1, 0, 0)),
            Rydberg.Global(None, None, custom_phase_jump_time=0),
            Rydberg.Global(
                None,
                None,
                mod_bandwidth=5,
                eom_config=RydbergEOM(
                    max_limiting_amp=10,
                    mod_bandwidth=20,
                    limiting_beam=RydbergBeam.RED,
                    intermediate_detuning=1000,
                    controlled_beams=tuple(RydbergBeam),
                    multiple_beam_control=False,
                ),
            ),
            Rydberg.Global(
                None,
                None,
                mod_bandwidth=5,
                eom_config=RydbergEOM(
                    max_limiting_amp=10,
                    mod_bandwidth=20,
                    limiting_beam=RydbergBeam.RED,
                    intermediate_detuning=1000,
                    controlled_beams=tuple(RydbergBeam),
                    custom_buffer_time=500,
                ),
            ),
            Rydberg.Global(
                None,
                None,
                mod_bandwidth=5,
                eom_config=RydbergEOM(
                    max_limiting_amp=10,
                    mod_bandwidth=20,
                    limiting_beam=RydbergBeam.RED,
                    intermediate_detuning=1000,
                    controlled_beams=tuple(RydbergBeam),
                    red_shift_coeff=1.4,
                ),
            ),
            Rydberg.Global(
                None,
                None,
                mod_bandwidth=5,
                eom_config=RydbergEOM(
                    max_limiting_amp=10,
                    mod_bandwidth=20,
                    limiting_beam=RydbergBeam.RED,
                    intermediate_detuning=1000,
                    controlled_beams=tuple(RydbergBeam),
                    blue_shift_coeff=1.4,
                ),
            ),
        ],
    )
    def test_optional_channel_fields(self, ch_obj):
        device = replace(
            tpu.MockDevice, channel_objects=(ch_obj,), channel_ids=None
        )
        dev_str = device.to_abstract_repr()
        assert device == deserialize_device(dev_str)
        assert device == VirtualDevice.from_abstract_repr(dev_str)

    @pytest.mark.parametrize(
        "dmm_ch_obj",
        [
            DMM(total_bottom_detuning=-10),
            DMM(min_avg_abs_detuning=0.1),
        ],
    )
    def test_optional_dmm_fields(self, dmm_ch_obj):
        device = replace(tpu.MockDevice, dmm_objects=(dmm_ch_obj,))
        dev_str = device.to_abstract_repr()
        assert device == deserialize_device(dev_str)
        assert device == VirtualDevice.from_abstract_repr(dev_str)


def test_version_mismatch_hint():
    obj_str = json.dumps({"pulser_version": "9.0.0"})
    with pytest.raises(AbstractReprError):
        validate_abstract_repr(obj_str, "device")
