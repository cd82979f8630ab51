"""Exception hierarchy for pulser_tpu."""

from pulser_tpu.exceptions.base import (
    PulserError,
    PulserNotImplementedError,
    PulserTypeError,
    PulserValueError,
)

__all__ = [
    "PulserError",
    "PulserValueError",
    "PulserTypeError",
    "PulserNotImplementedError",
]
