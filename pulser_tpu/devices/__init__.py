"""Classes for specification of neutral-atom devices.

The :class:`Device` class sets the structure of a physical device, while
:class:`VirtualDevice` is a more permissive device type which can only be
used in emulators.
"""

from __future__ import annotations

from pulser_tpu.devices._device_datacls import Device, VirtualDevice
from pulser_tpu.devices._devices import (
    AnalogDevice,
    DigitalAnalogDevice,
    WeightedAnalogDevice,
)
from pulser_tpu.devices._mock_device import MockDevice

_mock_devices: tuple[VirtualDevice, ...] = (MockDevice,)
_valid_devices: tuple[Device, ...] = (
    AnalogDevice,
    DigitalAnalogDevice,
    WeightedAnalogDevice,
)

__all__ = [
    "Device",
    "VirtualDevice",
    "AnalogDevice",
    "DigitalAnalogDevice",
    "MockDevice",
    "WeightedAnalogDevice",
]
