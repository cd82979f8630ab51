"""Ahead-of-time (AOT) executable cache for warm process starts.

JAX's persistent compilation cache only skips the XLA compile step;
tracing and Mosaic (Pallas) lowering still run on every fresh process
and dominate the flagship solver's warmup. This layer caches the
*serialized executable* (via ``jax.experimental.serialize_executable``)
keyed by the kernel source, argument avals, statics, and device
topology, so a warm process skips tracing, lowering and compilation
entirely and goes straight to execution.

The reference has no analogue — QuTiP pays no compile cost
(``/root/reference/pulser-simulation/pulser_simulation/simulation.py:689``
enters ``sesolve`` directly) — so this is what keeps the TPU build's
cold-start story competitive.

Two layers:

- **In-memory memo** (always on, on TPU backends): the first call per
  fingerprint compiles through the AOT API (``lower().compile()`` —
  which consults JAX's persistent compilation cache, so a warm
  process pays only tracing + lowering + a cache load) and later
  calls invoke the memoized executable directly, skipping jit
  dispatch.
- **Disk layer** (``PULSER_TPU_AOT_DISK=1``, off by default): stores
  the serialized executable for a zero-compile cross-process start.
  Off by default because tunneled PJRT backends (axon) recompile
  deserialized executables server-side on first execution — far
  slower than the persistent-cache path. Enable on directly-attached
  TPU hardware.

Control with ``PULSER_TPU_AOT_CACHE`` (``0`` disables the whole
layer, a path overrides the default disk directory
``~/.cache/pulser_tpu_aot``). Set ``PULSER_TPU_AOT_FORCE=1`` to
enable on CPU as well (used by tests). Any load/serialize failure
silently falls back to the normal jit path — the cache can never
break a solve.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
import threading
from typing import Any, Callable

_logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pulser_tpu_aot"
)

#: Loaded/compiled executables for this process, keyed by fingerprint.
_loaded: dict[str, Callable] = {}
_lock = threading.Lock()

#: Hit/miss counters (inspected by tests and telemetry), plus the
#: wall-clock of the most recent trace+lower and compile (bench.py
#: reports these in its warmup breakdown).
stats = {
    "hits": 0,
    "disk_hits": 0,
    "misses": 0,
    "errors": 0,
    "last_lower_s": 0.0,
    "last_compile_s": 0.0,
}

_src_digest_cache: str | None = None


def cache_dir() -> str | None:
    """The AOT cache directory, or None when disabled."""
    value = os.environ.get("PULSER_TPU_AOT_CACHE", "1")
    if value.lower() in ("0", "false", "no", "off", ""):
        return None
    if value.lower() in ("1", "true", "yes", "on"):
        return _DEFAULT_DIR
    return value


def _backend_eligible() -> bool:
    import jax

    try:
        # Single-device only: an AOT-compiled executable expects its
        # inputs replicated across every addressable device, which the
        # plain-jit dispatch handles but a direct call does not. The
        # kernels routed through this layer are single-chip programs
        # (multi-chip paths go through shard_map, not this cache).
        if jax.local_device_count() != 1:
            return False
        if os.environ.get("PULSER_TPU_AOT_FORCE"):
            return True
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _source_digest() -> str:
    """Digest of the compute-kernel sources (invalidates on edits)."""
    global _src_digest_cache
    if _src_digest_cache is None:
        h = hashlib.sha256()
        root = os.path.dirname(os.path.abspath(__file__))
        for rel in ("ops/pallas_kernels.py",):
            try:
                with open(os.path.join(root, rel), "rb") as f:
                    h.update(f.read())
            except OSError:  # pragma: no cover
                h.update(rel.encode())
        _src_digest_cache = h.hexdigest()[:16]
    return _src_digest_cache


def _fingerprint(
    tag: str, args: tuple, statics: dict[str, Any]
) -> str:
    import jax
    import jaxlib

    dev = jax.devices()[0]
    parts = [
        tag,
        jax.__version__,
        jaxlib.__version__,
        dev.platform,
        str(getattr(dev, "device_kind", "")),
        str(jax.device_count()),
        _source_digest(),
    ]
    parts.extend(f"{k}={statics[k]!r}" for k in sorted(statics))
    parts.extend(
        f"{tuple(a.shape)}:{a.dtype}"
        for a in jax.tree_util.tree_leaves(args)
    )
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()
    return f"{tag}-{digest[:32]}"


def _try_load(path: str) -> Callable | None:
    from jax.experimental import serialize_executable

    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree
        )
    except Exception as err:
        stats["errors"] += 1
        _logger.warning("AOT cache load failed (%s); recompiling.", err)
        return None


def _try_store(path: str, compiled: Any) -> None:
    from jax.experimental import serialize_executable

    try:
        payload, in_tree, out_tree = serialize_executable.serialize(
            compiled
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception as err:  # pragma: no cover
        stats["errors"] += 1
        _logger.warning("AOT cache store failed (%s).", err)


def _is_tunneled_backend() -> bool:
    """True when the TPU is reached through a remote tunnel (axon).

    The tunnel reports platform 'tpu' like directly-attached
    hardware; the plugin identifies itself in the PJRT platform
    version string instead.
    """
    import jax

    try:
        version = getattr(
            jax.devices()[0].client, "platform_version", ""
        )
    except Exception:  # pragma: no cover
        return False
    return "axon" in (version or "")


def call(
    jitted: Callable, tag: str, args: tuple, statics: dict[str, Any]
) -> Any:
    """Invokes ``jitted(*args, **statics)`` through the AOT cache.

    ``args`` must be positional JAX arrays; ``statics`` the jitted
    function's static keyword arguments. On a cache hit the stored
    executable runs directly (no tracing/lowering/compiling).
    """
    directory = cache_dir()
    if directory is None or not _backend_eligible():
        return jitted(*args, **statics)

    key = _fingerprint(tag, args, statics)
    with _lock:
        runner = _loaded.get(key)
    if runner is not None:
        stats["hits"] += 1
        return runner(*args)

    use_disk = bool(os.environ.get("PULSER_TPU_AOT_DISK"))
    path = os.path.join(directory, key + ".aot")
    runner = (
        _try_load(path)
        if use_disk and os.path.exists(path)
        else None
    )
    if runner is not None:
        stats["disk_hits"] += 1
    else:
        stats["misses"] += 1
        try:
            import time

            import jax

            # On TUNNELED backends (axon), reloading a big solver
            # executable from the persistent compilation cache
            # triggers a pathological server-side rebuild on first
            # execution — measured 67-670 s for the flagship kernel,
            # vs ~3 s compile + ~21 s first-exec when compiled
            # properly. Bypass the persistent cache for aot_cache-
            # routed kernels there (the cache stays on for the dozens
            # of small utility jits, where it saves ~0.4 s each and
            # reloads cleanly).
            bypass = (
                _is_tunneled_backend()
                and jax.config.jax_compilation_cache_dir is not None
                and not os.environ.get("PULSER_TPU_AOT_USE_XLA_CACHE")
            )
            prev_dir = jax.config.jax_compilation_cache_dir
            if bypass:
                jax.config.update("jax_compilation_cache_dir", None)
            try:
                t0 = time.perf_counter()
                lowered = jitted.lower(*args, **statics)
                t1 = time.perf_counter()
                compiled = lowered.compile()
                stats["last_lower_s"] = t1 - t0
                stats["last_compile_s"] = time.perf_counter() - t1
            finally:
                if bypass:
                    jax.config.update(
                        "jax_compilation_cache_dir", prev_dir
                    )
        except Exception as err:
            stats["errors"] += 1
            _logger.warning(
                "AOT lower/compile failed (%s); using plain jit.", err
            )
            return jitted(*args, **statics)
        if use_disk:
            _try_store(path, compiled)
        runner = compiled
    with _lock:
        _loaded[key] = runner
    try:
        return runner(*args)
    except Exception as err:
        stats["errors"] += 1
        _logger.warning(
            "AOT executable call failed (%s); using plain jit.", err
        )
        with _lock:
            _loaded.pop(key, None)
        return jitted(*args, **statics)
