"""Persistent XLA compilation caching.

Cold compiles of the big solver scans run for minutes; a persistent
cache loads them back in seconds on later runs or in fresh processes
(the reference has no analogue — QuTiP has no compile step). Opt in
either by calling :func:`enable_compilation_cache` before the first
solve, or by setting the environment variable
``PULSER_TPU_COMPILATION_CACHE`` to a directory (or to ``1`` for the
default location) before importing :mod:`pulser_tpu`.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "maybe_enable_default"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pulser_tpu_xla"
)


def enable_compilation_cache(
    cache_dir: str | None = None,
    min_compile_time_secs: float = 0.0,
) -> str:
    """Turns on JAX's persistent compilation cache.

    Args:
        cache_dir: Directory for the cache; created if missing.
            Defaults to ``~/.cache/pulser_tpu_xla``.
        min_compile_time_secs: Persist compilations at least this
            slow. Defaults to 0 (persist everything): on tunneled TPU
            backends every tiny utility jit costs a ~0.4 s round trip
            to compile, and dozens of them — not the flagship kernel —
            dominate a warm start's residual overhead.

    Returns:
        The cache directory in use.
    """
    import jax

    path = cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        min_compile_time_secs,
    )
    # Source locations leak into the serialized Pallas (Mosaic)
    # payloads, so an unrelated edit shifting a call site by one line
    # would change the cache key and force a recompile. Dropping the
    # traceback locations makes keys stable across such edits (at the
    # cost of less precise locations in compiler errors).
    jax.config.update(
        "jax_include_full_tracebacks_in_locations", False
    )
    jax.config.update("jax_traceback_in_locations_limit", 0)
    return path


_default_attempted = False


def maybe_enable_default() -> str | None:
    """Enables the persistent cache once, by default, on TPU backends.

    Called lazily from the emulator's first solve. A fresh process
    then reloads the flagship kernels in well under a second instead
    of recompiling (measured: 0.26 s compile vs 3.5 s cold, and it
    also sidesteps the tunneled backend's intermittent ~60 s
    server-side lazy first-execution compile). Opt out with
    ``PULSER_TPU_COMPILATION_CACHE=0``; CPU runs (tests) are left
    alone so they keep JAX's defaults.

    Returns the cache directory when enabled, else None.
    """
    global _default_attempted
    if _default_attempted:
        return None
    _default_attempted = True
    value = os.environ.get("PULSER_TPU_COMPILATION_CACHE", "")
    if value.lower() in ("0", "false", "no", "off"):
        return None
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return None  # the user already configured one
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return None
        if value.lower() in ("", "1", "true", "yes"):
            value = ""
        return enable_compilation_cache(value or None)
    except Exception:  # pragma: no cover - cache is best-effort
        return None


def _maybe_enable_from_env() -> None:
    """Honors the env configuration at import time.

    - ``PULSER_TPU_COMPILATION_CACHE``: a cache directory (or ``1``
      for the default) enables the persistent compilation cache.
    - ``PULSER_TPU_PLATFORM``: forces the JAX platform (e.g. ``cpu``).
      Needed because TPU plugins may override the standard
      ``JAX_PLATFORMS`` environment variable.
    """
    platform = os.environ.get("PULSER_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    value = os.environ.get("PULSER_TPU_COMPILATION_CACHE")
    if not value or value.lower() in ("0", "false", "no", "off"):
        # "0" & co. opt OUT (maybe_enable_default honors them too);
        # they must never be taken as a directory name.
        return
    enable_compilation_cache(
        None if value.lower() in ("1", "true", "yes") else value
    )
