"""Resident solve daemon: protocol, round trips, warm serving.

The daemon (pulser_tpu/serving.py) is the tunneled-backend cold-start
answer: one resident process holds the compiled programs, fresh
client processes solve over a unix socket with no JAX of their own.
"""

from __future__ import annotations

import os
import tempfile
import threading

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu import serving
from pulser_tpu.emulator import TpuEmulator


def _small_seq():
    reg = tpu.Register.rectangle(1, 3, spacing=8.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(500, np.pi), -2.0, 0.0
        ),
        "ryd",
    )
    return seq


@pytest.fixture()
def daemon():
    path = os.path.join(
        tempfile.mkdtemp(), "serve_test.sock"
    )
    ready = threading.Event()
    th = threading.Thread(
        target=serving.serve,
        args=(path,),
        kwargs={"ready_event": ready},
        daemon=True,
    )
    th.start()
    assert ready.wait(30), "daemon did not come up"
    client = serving.SolveClient(path)
    yield client
    client.shutdown()
    th.join(timeout=10)


def test_ping_and_unknown_kind(daemon):
    assert daemon.ping()
    resp = daemon._request({"kind": "nonsense"})
    assert not resp["ok"]
    assert "unknown kind" in resp["error"]


def test_run_sequence_matches_direct(daemon):
    seq = _small_seq()
    out = daemon.run(seq, evaluation_times="Full")
    direct = TpuEmulator.from_sequence(
        seq, evaluation_times="Full"
    ).run()
    ref = np.stack([s.full()[:, 0] for s in direct.states])
    assert out["states"].shape == ref.shape
    np.testing.assert_allclose(out["states"], ref, atol=1e-7)
    assert len(out["eval_times"]) == ref.shape[0]


def test_run_accepts_preserialized_and_eval_list(daemon):
    seq = _small_seq()
    times = [0.0, 0.25, 0.5]
    out = daemon.run(
        seq.to_abstract_repr(), evaluation_times=times
    )
    assert out["states"].shape[0] == 3
    norms = np.linalg.norm(out["states"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_run_noisy_sampling(daemon):
    seq = _small_seq()
    noise = tpu.NoiseModel(
        dephasing_rate=0.02,
        amp_sigma=0.01,
        runs=5,
        samples_per_run=2,
    )
    out = daemon.run(
        seq,
        noise_model=noise,
        evaluation_times="Minimal",
        seed=11,
        n_samples=200,
    )
    counts = out["counts"]
    assert sum(counts.values()) == 200
    assert all(len(k) == 3 for k in counts)


def test_bad_sequence_returns_error(daemon):
    with pytest.raises(RuntimeError, match="daemon error"):
        daemon.run("{not json")


def test_client_ping_without_server():
    client = serving.SolveClient("/tmp/definitely_absent.sock")
    assert not client.ping()
