"""Module for sequence sampling."""

from pulser_tpu.sampler.sampler import sample

__all__ = ["sample"]
