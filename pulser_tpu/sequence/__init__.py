"""The Sequence class and its support structures."""

from pulser_tpu.sequence.sequence import Sequence

__all__ = ["Sequence"]
