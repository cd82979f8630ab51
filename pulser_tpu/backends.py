"""A module gathering all available backends.

Behavioral parity with reference
``pulser-core/pulser/backends.py`` — a single-point, lazily-imported
access to backends spread across packages::

    import pulser_tpu.backends as backends

    backends.QPUBackend    # Same as pulser_tpu.QPUBackend
    backends.TpuBackendV2  # Same as pulser_tpu.emulator.TpuBackendV2

Attributes:
    QPUBackend: See :py:class:`pulser_tpu.backend.QPUBackend`.
    TpuBackend: See :py:class:`pulser_tpu.emulator.TpuBackend`.
    TpuBackendV2: See :py:class:`pulser_tpu.emulator.TpuBackendV2`.
    QutipBackend: Alias of ``TpuBackend`` (reference name).
    QutipBackendV2: Alias of ``TpuBackendV2`` (reference name).
"""

from __future__ import annotations

import importlib
import warnings
from typing import TYPE_CHECKING, Type

if TYPE_CHECKING:
    from pulser_tpu.backend.abc import Backend
    from pulser_tpu.backend.qpu import QPUBackend as QPUBackend
    from pulser_tpu.emulator import TpuBackendV2 as TpuBackendV2


_BACKENDS = {
    "QPUBackend": "pulser_tpu.backend",
    "QutipBackend": "pulser_tpu.emulator",
    "QutipBackendV2": "pulser_tpu.emulator",
    "TpuBackend": "pulser_tpu.emulator",
    "TpuBackendV2": "pulser_tpu.emulator",
    "RemoteEmuFreeBackend": "pasqal_cloud",
    "RemoteMPSBackend": "pasqal_cloud",
    "RemoteSVBackend": "pasqal_cloud",
    "MPSBackend": "emu_mps",
    "SVBackend": "emu_sv",
}

_DEPRECATED_REMOVED_BACKENDS = ["EmuFreeBackend", "EmuTNBackend"]
_RENAMED_BACKENDS = {
    "EmuFreeBackendV2": "RemoteEmuFreeBackend",
    "EmuMPSBackend": "RemoteMPSBackend",
    "EmuSVBackend": "RemoteSVBackend",
}


# Prevents * imports from attempting to import unavailable backends
__all__: list[str] = []


def __getattr__(name: str) -> Type[Backend]:
    if name in _DEPRECATED_REMOVED_BACKENDS:
        raise AttributeError(
            f"{name!r} was deprecated and is now removed "
            f"from module {__name__!r}"
        )
    if name not in _BACKENDS and name not in _RENAMED_BACKENDS:
        raise AttributeError(
            f"Module {__name__!r} has no attribute {name!r}."
        )
    try:
        if name in _RENAMED_BACKENDS:
            new_name = _RENAMED_BACKENDS[name]
            warnings.warn(
                f"{name!r} was renamed to {new_name!r}. "
                f"Please use {new_name!r} from now on.",
                DeprecationWarning,
                stacklevel=2,
            )
            name = new_name
        return getattr(  # type: ignore
            importlib.import_module(_BACKENDS[name]),
            name,
        )
    except ModuleNotFoundError:
        raise AttributeError(
            f"{name!r} requires the {_BACKENDS[name]!r} package. To"
            f" install it, run `pip install {_BACKENDS[name]}`."
        )
