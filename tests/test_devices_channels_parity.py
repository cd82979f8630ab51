"""Device/channel/EOM behavior parity against the reference."""

from __future__ import annotations

import sys

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels import DMM, Microwave, Raman, Rydberg
from pulser_tpu.channels.eom import RydbergBeam, RydbergEOM

sys.path.insert(0, "/root/reference/pulser-core")
ref = pytest.importorskip("pulser")


def test_device_specs_parity():
    for name in ("DigitalAnalogDevice", "AnalogDevice", "MockDevice"):
        mine = getattr(tpu.devices, name)
        theirs = getattr(ref.devices, name)
        assert mine.dimensions == theirs.dimensions
        assert mine.rydberg_level == theirs.rydberg_level
        assert mine.min_atom_distance == theirs.min_atom_distance
        assert mine.max_atom_num == theirs.max_atom_num
        assert mine.interaction_coeff == theirs.interaction_coeff
        assert sorted(mine.channels) == sorted(theirs.channels)
        assert mine.supported_bases == theirs.supported_bases


def test_device_validation_rules():
    dev = tpu.devices.DigitalAnalogDevice
    # Too-close atoms
    reg = tpu.Register(
        {"a": (0.0, 0.0), "b": (0.0, dev.min_atom_distance / 2)}
    )
    with pytest.raises(ValueError):
        dev.validate_register(reg)
    # Too many atoms
    with pytest.raises(ValueError):
        dev.validate_register(
            tpu.Register.square(
                int(np.ceil(np.sqrt(dev.max_atom_num + 1))),
                spacing=5.0,
            )
        )


def test_eom_detuning_off_options_parity():
    eom_kwargs = dict(
        mod_bandwidth=24.0,
        max_limiting_amp=100.0,
        intermediate_detuning=700.0,
    )
    mine = RydbergEOM(
        limiting_beam=RydbergBeam.RED,
        controlled_beams=(RydbergBeam.BLUE,),
        **eom_kwargs,
    )
    theirs = ref.channels.eom.RydbergEOM(
        limiting_beam=ref.channels.eom.RydbergBeam.RED,
        controlled_beams=(ref.channels.eom.RydbergBeam.BLUE,),
        **eom_kwargs,
    )
    for amp, det in [(3.0, 0.0), (5.0, -4.0), (1.0, 10.0)]:
        np.testing.assert_allclose(
            np.asarray(
                mine.detuning_off_options(amp, det), dtype=float
            ),
            np.asarray(
                theirs.detuning_off_options(amp, det), dtype=float
            ),
        )


def test_channel_rise_time_parity():
    for bw in (4.0, 8.0, 16.0):
        mine = Rydberg.Global(None, None, mod_bandwidth=bw)
        theirs = ref.channels.Rydberg.Global(
            None, None, mod_bandwidth=bw
        )
        assert mine.rise_time == theirs.rise_time


def test_channel_classes_exist():
    for cls in (Rydberg, Raman, Microwave, DMM):
        assert hasattr(cls, "Global") or cls is DMM
    dmm = DMM(bottom_detuning=-100.0, total_bottom_detuning=-1000.0)
    assert dmm.basis == "ground-rydberg"
    assert dmm.addressing == "Global"


def test_virtual_device_conversion():
    vdev = tpu.devices.DigitalAnalogDevice.to_virtual()
    rdev = ref.devices.DigitalAnalogDevice.to_virtual()
    assert vdev.rydberg_level == rdev.rydberg_level
    from pulser_tpu.devices._device_datacls import VirtualDevice

    assert isinstance(vdev, VirtualDevice)
