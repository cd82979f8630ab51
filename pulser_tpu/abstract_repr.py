"""Convenience aliases for abstract-representation deserialization.

Mirrors the reference's top-level shim
(``pulser-core/pulser/abstract_repr.py:16-37``): short public names for the
deserializers that live in :mod:`pulser_tpu.json.abstract_repr.deserializer`,
so ``from pulser_tpu.abstract_repr import deserialize_device`` works the same
way it does upstream.
"""

from __future__ import annotations

from pulser_tpu.json.abstract_repr.deserializer import (
    deserialize_abstract_layout as deserialize_layout,
    deserialize_abstract_noise_model as deserialize_noise_model,
    deserialize_abstract_register as deserialize_register,
    deserialize_abstract_sequence as deserialize_sequence,
    deserialize_device,
)

__all__ = [
    "deserialize_layout",
    "deserialize_noise_model",
    "deserialize_register",
    "deserialize_sequence",
    "deserialize_device",
]
