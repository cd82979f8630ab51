"""The various hardware channel types."""

from pulser_tpu.channels.channels import Microwave, Raman, Rydberg
from pulser_tpu.channels.dmm import DMM

__all__ = ["Microwave", "Raman", "Rydberg", "DMM"]
