"""Backend registry (lazy single-point access) tests.

Mirrors the reference's ``tests/test_backends.py`` (78 LoC):
missing-package errors, unknown names, successful lazy imports,
removed backends, and renamed-backend deprecations (reference
``pulser-core/pulser/backends.py``).
"""

from __future__ import annotations

import sys

import pytest

import pulser_tpu.backends
from pulser_tpu.backend.abc import Backend
from pulser_tpu.backends import _REGISTRY


@pytest.mark.parametrize(
    "backend, missing_package",
    [
        (name, entry.module)
        for name, entry in _REGISTRY.items()
        if entry.module is not None
        and not entry.module.startswith("pulser_tpu")
    ],
)
def test_missing_package(monkeypatch, backend, missing_package):
    monkeypatch.setitem(sys.modules, missing_package, None)
    with pytest.raises(
        AttributeError,
        match=f"{backend!r} requires the {missing_package!r} package."
        f" To install it, run `pip install {missing_package}`",
    ):
        getattr(pulser_tpu.backends, backend)


def test_missing_backend():
    with pytest.raises(
        AttributeError,
        match="Module 'pulser_tpu.backends' has no attribute"
        " 'SpecialBackend'",
    ):
        pulser_tpu.backends.SpecialBackend


@pytest.mark.parametrize(
    "backend_name",
    [
        "QPUBackend",
        "QutipBackend",
        "QutipBackendV2",
        "TpuBackend",
        "TpuBackendV2",
    ],
)
def test_successful_imports(backend_name):
    backend = getattr(pulser_tpu.backends, backend_name)
    assert issubclass(backend, Backend)


@pytest.mark.parametrize(
    "backend_name", ["EmuFreeBackend", "EmuTNBackend"]
)
def test_removed_deprecated_backends(backend_name):
    with pytest.raises(
        AttributeError,
        match=f"{backend_name!r} was deprecated and is now removed",
    ):
        getattr(pulser_tpu.backends, backend_name)


@pytest.mark.parametrize(
    "backend_name",
    ["EmuFreeBackendV2", "EmuMPSBackend", "EmuSVBackend"],
)
def test_renamed_backends(backend_name):
    # The rename warning fires even though the cloud package that
    # provides the target is not installed in this image
    with pytest.raises(
        AttributeError, match="To install it, run `pip install"
    ), pytest.warns(
        DeprecationWarning,
        match=f"{backend_name!r} was renamed to ",
    ):
        getattr(pulser_tpu.backends, backend_name)
