"""Exception-hierarchy behaviors.

Mirrors the reference's ``tests/test_exceptions.py`` (deprecated alias
module) and extends it with hierarchy/rendering checks for the
spec-table-driven error classes.
"""

from __future__ import annotations

import pytest

from pulser_tpu.exceptions.base import PulserError
from pulser_tpu.exceptions.sequence import RadiusError
from pulser_tpu.exceptions.serialization import (
    AbstractReprError,
    DeserializeDeviceError,
    SerializationError,
    SerializationSupportAttributeMissing,
    SerializationSupportClassMissing,
    SerializationSupportModuleMissing,
)


def test_import_old_serialize_exceptions():
    """The legacy pulser_tpu.json.exceptions path warns but works."""
    with pytest.warns(
        DeprecationWarning,
        match="module pulser_tpu.json.exceptions is deprecated",
    ):
        from pulser_tpu.json import exceptions as legacy

    assert legacy.SerializationError is SerializationError
    assert legacy.AbstractReprError is AbstractReprError
    assert legacy.DeserializeDeviceError is DeserializeDeviceError


def test_hierarchy():
    """Mirrors the reference MRO: serialization-support errors hang off
    SerializationError, while the abstract-repr and device errors are
    direct PulserError children (reference
    ``pulser/exceptions/serialization.py:58,68``)."""
    assert issubclass(SerializationError, PulserError)
    assert issubclass(AbstractReprError, PulserError)
    assert not issubclass(AbstractReprError, SerializationError)
    assert issubclass(DeserializeDeviceError, PulserError)
    assert issubclass(RadiusError, PulserError)
    for cls in (
        SerializationSupportModuleMissing,
        SerializationSupportClassMissing,
        SerializationSupportAttributeMissing,
    ):
        assert issubclass(cls, SerializationError)


def test_support_missing_messages():
    assert (
        str(SerializationSupportModuleMissing("some.mod"))
        == "No serialization support for module 'some.mod'."
    )
    assert (
        str(SerializationSupportClassMissing("some.mod", "Cls"))
        == "No serialization support for 'some.mod.Cls'."
    )
    assert (
        str(SerializationSupportAttributeMissing("some.mod", "sub"))
        == "No serialization support for attributes of "
        "'some.mod.sub'."
    )


def test_radius_error_is_value_error():
    """Sequence-level errors stay catchable as builtin ValueError."""
    assert issubclass(RadiusError, ValueError)
