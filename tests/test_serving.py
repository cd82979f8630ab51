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


def test_run_backend_observables_roundtrip(daemon):
    """The backend-v2 pipeline — expectation values, correlation
    matrix, occupation, bitstrings — flows through the daemon and
    round-trips via the Results abstract repr."""
    from pulser_tpu.backend import (
        BitStrings,
        CorrelationMatrix,
        Expectation,
        Occupation,
    )
    from pulser_tpu.emulator import TpuBackendV2
    from pulser_tpu.emulator.tpu_config import TpuConfig
    from pulser_tpu.emulator.tpu_op import TpuOperator

    seq = _small_seq()
    n = len(seq.register.qubit_ids)
    zop = TpuOperator.from_operator_repr(
        eigenstates=("r", "g"),
        n_qudits=n,
        operations=[(1.0, [({"rr": 1.0}, [0])])],
    )
    config = TpuConfig(
        observables=[
            Occupation(evaluation_times=[1.0]),
            CorrelationMatrix(evaluation_times=[1.0]),
            Expectation(zop, evaluation_times=[1.0]),
            BitStrings(evaluation_times=[1.0], num_shots=111),
        ]
    )
    results = daemon.run_backend(seq, config=config, seed=5)
    occ = results.occupation[-1]
    assert np.asarray(occ).shape == (n,)
    corr = np.asarray(results.correlation_matrix[-1])
    assert corr.shape == (n, n)
    exp = results.expectation[-1]
    assert np.isfinite(complex(np.asarray(exp)).real)
    shots = results.bitstrings[-1]
    assert sum(shots.values()) == 111

    # Direct (in-process) reference: identical seeded pipeline
    np.random.seed(5)
    direct = TpuBackendV2(seq, config=config).run()
    np.testing.assert_allclose(
        np.asarray(occ),
        np.asarray(direct.occupation[-1]),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        corr,
        np.asarray(direct.correlation_matrix[-1]),
        atol=1e-7,
    )

    # Raw-string mode needs no deserialization support client-side
    raw = daemon.run_backend(
        seq, config=config, deserialize=False
    )
    assert isinstance(raw, str) and '"occupation"' in raw


def test_concurrent_clients_no_interleaving(daemon):
    """Two clients hammering one daemon concurrently each get their
    own correct, uncorrupted responses (requests serialize at
    connection granularity)."""
    seq_a = _small_seq()
    reg_b = tpu.Register.rectangle(1, 2, spacing=8.0, prefix="q")
    seq_b = tpu.Sequence(reg_b, tpu.MockDevice)
    seq_b.declare_channel("ryd", "rydberg_global")
    seq_b.add(
        tpu.Pulse.ConstantPulse(300, 1.0, 0.0, 0.0), "ryd"
    )
    results: dict[str, list] = {"a": [], "b": []}
    errors: list = []

    def worker(tag, seq, dim):
        client = serving.SolveClient(daemon.socket_path)
        try:
            for _ in range(4):
                out = client.run(
                    seq, evaluation_times="Minimal", final_only=True
                )
                assert out["states"].shape == (1, dim)
                np.testing.assert_allclose(
                    np.linalg.norm(out["states"][0]), 1.0, atol=1e-6
                )
                results[tag].append(out["states"][0])
        except Exception as err:  # noqa: BLE001
            errors.append((tag, err))

    threads = [
        threading.Thread(target=worker, args=("a", seq_a, 8)),
        threading.Thread(target=worker, args=("b", seq_b, 4)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results["a"]) == len(results["b"]) == 4
    # Every repeat of the same request returns the same state
    for tag in ("a", "b"):
        for st in results[tag][1:]:
            np.testing.assert_allclose(
                st, results[tag][0], atol=1e-7
            )
