"""Deprecated alias module for serialization errors.

The exceptions live in :mod:`pulser_tpu.exceptions.serialization`;
this path is kept for compatibility with code written against the old
layout (reference: pulser-core/pulser/json/exceptions.py) and warns on
import.
"""

import warnings

from pulser_tpu.exceptions.serialization import (
    AbstractReprError,
    DeserializeDeviceError,
    SerializationError,
)

warnings.warn(
    "module pulser_tpu.json.exceptions is deprecated, "
    "please migrate your code to "
    "use pulser_tpu.exceptions.serialization",
    category=DeprecationWarning,
    stacklevel=2,
)

__all__ = [
    "AbstractReprError",
    "DeserializeDeviceError",
    "SerializationError",
]
