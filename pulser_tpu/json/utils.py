"""Utility functions for JSON serializations.

API parity with reference ``pulser-core/pulser/json/utils.py``.
"""

from __future__ import annotations

import json
import warnings
from dataclasses import MISSING, Field
from typing import TYPE_CHECKING, Any, Literal, Optional, Sequence

import numpy as np

from pulser_tpu.exceptions.serialization import AbstractReprError

if TYPE_CHECKING:
    from pulser_tpu.register.base_register import QubitId


def get_dataclass_defaults(fields: tuple[Field, ...]) -> dict[str, Any]:
    """Gets the defaults for the fields that have them."""
    defaults = {}
    for field in fields:
        if field.default is not MISSING:
            defaults[field.name] = field.default
        elif field.default_factory is not MISSING:
            defaults[field.name] = field.default_factory()
    return defaults


def obj_to_dict(
    obj: object,
    *args: Any,
    _build: bool = True,
    _module: Optional[str] = None,
    _name: Optional[str] = None,
    _submodule: Optional[str] = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """Encodes an object in a dictionary for (legacy) serialization.

    Args:
        obj: The object to encode in the dictionary.

    Other Parameters:
        _build: Whether the object is to be built on deserialization.
        _module: Custom name for the module containing the object.
        _name: Custom name of the object.
        _submodule: Name of a submodule (e.g. the class holding a
            classmethod). Only used when defined.
        args: If the object is to be built, the arguments to give on creation.
        kwargs: If the object is to be built, the keyword arguments to give
            on creation.

    Returns:
        The dictionary encoding the object.
    """
    d = {
        "_build": _build,
        "__module__": _module if _module else obj.__class__.__module__,
        "__name__": _name if _name else obj.__class__.__name__,
    }
    if _build:
        d["__args__"] = args
        d["__kwargs__"] = kwargs
    if _submodule:
        d["__submodule__"] = _submodule

    from pulser_tpu.json.supported import validate_serialization

    validate_serialization(d)
    return d


def make_json_compatible(obj: Any) -> Any:
    """Makes an object compatible with JSON serialization."""

    class NumpyEncoder(json.JSONEncoder):
        def default(self, o: Any) -> Any:
            if isinstance(o, np.ndarray):
                return o.tolist()
            return json.JSONEncoder.default(self, o)

    return json.loads(json.dumps(obj, cls=NumpyEncoder))


def stringify_qubit_ids(qubit_ids: Sequence[QubitId]) -> list[str]:
    """Converts all qubit IDs into strings and looks for conflicts."""
    not_str = [id for id in qubit_ids if not isinstance(id, str)]
    names = [str(id) for id in qubit_ids]
    if not_str:
        warnings.warn(
            "Register serialization to an abstract representation "
            "irreversibly converts all qubit ID's to strings.",
            stacklevel=2,
        )
        if len(set(names)) < len(names):
            collisions = [id for id in not_str if str(id) in qubit_ids]
            raise AbstractReprError(
                "Name collisions encountered when converting qubit IDs to "
                f"strings for IDs: {[(id, str(id)) for id in collisions]}"
            )
    return names


ObjectType = Literal[
    "sequence",
    "device",
    "layout",
    "register",
    "noise",
    "results",
    "config",
]


def get_filename(object_type: ObjectType) -> str:
    """Return the schema filename for a given object type."""
    return f"{object_type}-schema.json"
