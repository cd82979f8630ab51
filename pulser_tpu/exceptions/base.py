"""Base exception types for pulser_tpu.

API parity with reference ``pulser-core/pulser/exceptions/base.py``.
"""

from __future__ import annotations


class PulserError(Exception):
    """Base class for errors raised by pulser_tpu."""


class PulserValueError(ValueError, PulserError):
    """A ValueError raised by pulser_tpu."""


class PulserTypeError(TypeError, PulserError):
    """A TypeError raised by pulser_tpu."""


class PulserNotImplementedError(NotImplementedError, PulserError):
    """A NotImplementedError raised by pulser_tpu."""
