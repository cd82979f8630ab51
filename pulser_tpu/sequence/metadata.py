"""Setting and getting the serialized Sequence metadata.

Parity with reference ``pulser-core/pulser/sequence/metadata.py``.
"""

from __future__ import annotations

import contextvars
from typing import Any

_package_versions: contextvars.ContextVar[dict[str, str]] = (
    contextvars.ContextVar("_package_versions", default={})
)

_extra: contextvars.ContextVar[dict[str, Any]] = contextvars.ContextVar(
    "_extra", default={}
)


def _get_metadata() -> dict[str, dict[str, Any]]:
    """Gets all the existing Sequence metadata."""
    package_versions = _package_versions.get()
    extra = _extra.get()
    if package_versions or extra:
        return {
            "package_versions": package_versions,
            "extra": extra,
        }
    return {}


def _reset_metadata() -> None:
    """Deletes all existing metadata."""
    _package_versions.set({})
    _extra.set({})


def store_package_version_metadata(
    package_name: str, package_version: str
) -> None:
    """Store a package name and version in the Sequence metadata."""
    _package_versions.set(
        _package_versions.get() | {package_name: package_version}
    )


def store_extra_metadata(extra_metadata: dict) -> None:
    """Store any extra metadata in the Sequence metadata."""
    _extra.set(_extra.get() | extra_metadata)
