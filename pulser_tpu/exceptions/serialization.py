"""Serialization errors.

API parity with reference ``pulser-core/pulser/exceptions/serialization.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pulser_tpu.exceptions.base import PulserError


class SerializationError(PulserError):
    """Exception raised while attempting to serialize data."""


class SerializationSupportMissing(SerializationError):
    """Attempting to serialize a class we don't know how to serialize."""


@dataclass
class SerializationSupportModuleMissing(SerializationSupportMissing):
    """Error: we don't know how to serialize values from this module."""

    module: str

    def __str__(self) -> str:
        return f"No serialization support for module '{self.module}'."


@dataclass
class SerializationSupportAttributeMissing(SerializationSupportMissing):
    """Error: we don't know how to serialize this attribute."""

    module: str
    submodule: str
    class_name: str

    def __str__(self) -> str:
        return (
            "No serialization support for attributes of "
            f"'{self.module}.{self.submodule}'."
        )


@dataclass
class SerializationSupportClassMissing(SerializationSupportMissing):
    """Error: we don't know how to serialize values of this class."""

    module: str
    class_name: str

    def __str__(self) -> str:
        return (
            "No serialization support for "
            f"'{self.module}.{self.class_name}'."
        )


class AbstractReprError(PulserError):
    """Error raised when representing a sequence in the abstract format."""


class DeserializeDeviceError(PulserError):
    """Error raised when deserializing a device fails."""
