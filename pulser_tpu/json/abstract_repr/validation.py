"""Validation of the abstract representation (wire format).

Counterpart of reference
``pulser-core/pulser/json/abstract_repr/validation.py:98``.  Validates a
serialized payload against the JSON schema for its object type when a
schema file is available under ``schemas/``; otherwise performs structural
sanity checks so round-trips stay guarded.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Any

from pulser_tpu.exceptions.serialization import (
    AbstractReprError,
    SchemaValidationError,
)
from pulser_tpu.json.utils import ObjectType, get_filename

SCHEMAS_PATH = Path(__file__).parent / "schemas"

# Minimal required top-level keys per object type, used when no JSON
# schema file is available for that type.
_REQUIRED_KEYS: dict[str, tuple[str, ...]] = {
    "sequence": ("device", "register", "channels", "operations"),
    "device": ("name", "dimensions", "rydberg_level", "channels"),
    "register": ("register",),
    "layout": ("coordinates",),
    "noise": (),
    "results": (),
    "config": (),
}


@functools.lru_cache
def _get_schema(object_type: ObjectType) -> dict | None:
    schema_file = SCHEMAS_PATH / get_filename(object_type)
    if not schema_file.is_file():
        return None
    with open(schema_file, "r", encoding="utf-8") as f:
        return json.load(f)  # type: ignore[no-any-return]


def _load_schema_copy(filename: str) -> Any:
    """Loads a sibling schema by filename (for local $ref handling).

    fastjsonschema mutates the '$ref's of schemas it compiles, so a
    fresh copy is returned every time.
    """
    with open(SCHEMAS_PATH / filename, "r", encoding="utf-8") as f:
        return json.load(f)


@functools.lru_cache
def _get_validator(object_type: ObjectType) -> Any:
    schema = _get_schema(object_type)
    if schema is None:
        return None
    try:
        import fastjsonschema

        # Sibling files are referenced with bare filenames (the ""
        # URI scheme)
        return fastjsonschema.compile(
            schema, handlers={"": _load_schema_copy}
        )
    except ImportError:  # pragma: no cover
        import jsonschema
        from referencing import Registry, Resource

        registry = Registry(
            [
                (p.name, Resource.from_contents(_load_schema_copy(p.name)))
                for p in SCHEMAS_PATH.glob("*-schema.json")
            ]
        )
        validator = jsonschema.Draft7Validator(
            schema, registry=registry
        )
        return validator.validate


def validate_abstract_repr(obj_str: str, name: ObjectType) -> None:
    """Validate the abstract representation of an object.

    Args:
        obj_str: The JSON string to validate.
        name: The type of object to validate against.
    """
    try:
        obj = json.loads(obj_str)
    except json.JSONDecodeError as e:
        raise AbstractReprError(
            f"The serialized {name} is not a valid JSON string."
        ) from e

    validator = _get_validator(name)
    if validator is not None:
        try:
            validator(obj)
        except Exception as e:
            raise SchemaValidationError(
                f"The serialized {name} does not respect its JSON schema: "
                f"{e}"
            ) from e
        return

    # Fallback structural check
    required = _REQUIRED_KEYS.get(name, ())
    if isinstance(obj, dict):
        missing = [k for k in required if k not in obj]
        if missing:
            raise AbstractReprError(
                f"The serialized {name} is missing the required keys: "
                f"{missing}."
            )
