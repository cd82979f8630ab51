"""AOT executable cache: fingerprint stability and warm reload.

The warm-start contract (VERDICT r2 #1): a fresh process must be able
to reuse previous compilation work. The cross-process test below runs
the same solve in two subprocesses sharing one cache directory and
asserts the second one reloads from disk (``disk_hits``) with an
identical result — proving the fingerprint is stable across processes
and the stored executable is usable.

These subprocesses run single-device CPU (the in-suite virtual mesh
makes the parent ineligible by design — AOT-compiled executables are
single-chip programs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

import jax

from pulser_tpu import aot_cache

_CHILD = r"""
import json, os, sys
import numpy as np
import functools
import jax, jax.numpy as jnp
from pulser_tpu import aot_cache

@functools.partial(jax.jit, static_argnames=("steps",))
def evolve(psi, h, *, steps):
    def body(p, _):
        p = p - 0.01j * (h @ p)
        return p / jnp.linalg.norm(p), None
    out, _ = jax.lax.scan(body, psi, None, length=steps)
    return out

dim = 64
rng = np.random.default_rng(3)
m = rng.normal(size=(dim, dim))
h = jnp.asarray((m + m.T) / 2, jnp.complex64)
psi = jnp.asarray(np.eye(dim, dtype=np.complex64)[0])
out = aot_cache.call(evolve, "test_evolve", (psi, h), {"steps": 50})
print(json.dumps({
    "stats": aot_cache.stats,
    "checksum": float(np.abs(np.asarray(out)).sum()),
}))
"""


def _run_child(cache_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PULSER_TPU_PLATFORM="cpu",
        PULSER_TPU_AOT_FORCE="1",
        PULSER_TPU_AOT_DISK="1",
        PULSER_TPU_AOT_CACHE=cache_dir,
        XLA_FLAGS="",  # single device (no virtual mesh)
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_warm_reload_across_processes(tmp_path):
    """Second process must reload the stored executable (no compile)."""
    cache_dir = str(tmp_path / "aot")
    cold = _run_child(cache_dir)
    assert cold["stats"]["misses"] == 1
    assert cold["stats"]["disk_hits"] == 0
    assert len(os.listdir(cache_dir)) == 1

    warm = _run_child(cache_dir)
    assert warm["stats"]["disk_hits"] == 1
    assert warm["stats"]["misses"] == 0
    np.testing.assert_allclose(
        warm["checksum"], cold["checksum"], rtol=1e-6
    )


def test_ineligible_on_virtual_mesh():
    """Inside the 8-device suite the layer must pass through to jit."""
    assert jax.local_device_count() == 8

    called = {}

    def fake(*args, **kwargs):
        called["yes"] = True
        return args[0]

    fake_jitted = type(
        "J", (), {"__call__": staticmethod(fake), "lower": None}
    )()
    before = dict(aot_cache.stats)
    out = aot_cache.call(
        fake, "test_passthrough", (np.ones(3),), {}
    )
    assert called["yes"]
    np.testing.assert_array_equal(out, np.ones(3))
    assert aot_cache.stats == before  # untouched: plain-jit path
    del fake_jitted


def test_env_disable(monkeypatch):
    """PULSER_TPU_AOT_CACHE=0 disables the layer entirely."""
    monkeypatch.setenv("PULSER_TPU_AOT_CACHE", "0")
    assert aot_cache.cache_dir() is None

    def fake(*args, **kwargs):
        return "plain"

    assert aot_cache.call(fake, "t", (), {}) == "plain"


def test_fingerprint_separates_shapes_and_statics():
    a8 = np.zeros(8, np.float32)
    a16 = np.zeros(16, np.float32)
    k1 = aot_cache._fingerprint("t", (a8,), {"k": 1})
    assert k1 == aot_cache._fingerprint("t", (a8,), {"k": 1})
    assert k1 != aot_cache._fingerprint("t", (a16,), {"k": 1})
    assert k1 != aot_cache._fingerprint("t", (a8,), {"k": 2})
    assert k1 != aot_cache._fingerprint("u", (a8,), {"k": 1})
