"""Remote/QPU backend protocol tests with an in-process connection."""

from __future__ import annotations

import pytest

import pulser_tpu as tpu
from pulser_tpu.backend.remote import (
    BatchStatus,
    JobStatus,
    RemoteBackend,
    RemoteConnection,
    RemoteResults,
)
from pulser_tpu.backend.results import Results


class FakeConn(RemoteConnection):
    """A synchronous in-process stand-in for a remote connection."""

    def __init__(self):
        self.batches: dict[str, list[Results]] = {}

    def submit(
        self,
        sequence,
        wait=False,
        open=False,
        batch_id=None,
        **kwargs,
    ):
        bid = batch_id or f"b{len(self.batches)}"
        jp = kwargs.get("job_params") or [{}]
        res = [
            Results(
                atom_order=tuple(sequence.register.qubit_ids),
                total_duration=sequence.get_duration(),
            )
            for _ in jp
        ]
        self.batches.setdefault(bid, []).extend(res)
        return RemoteResults(bid, self)

    def _fetch_result(self, batch_id, job_ids):
        return tuple(self.batches[batch_id])

    def _query_job_progress(self, batch_id):
        return {
            f"j{i}": (JobStatus.DONE, r)
            for i, r in enumerate(self.batches[batch_id])
        }

    def _get_batch_status(self, batch_id):
        return BatchStatus.DONE

    def _get_job_ids(self, batch_id):
        return [f"j{i}" for i in range(len(self.batches[batch_id]))]

    def supports_open_batch(self):
        return True

    def _close_batch(self, batch_id):
        pass

    def fetch_available_devices(self):
        return {"AnalogDevice": tpu.AnalogDevice}


@pytest.fixture
def qpu_seq():
    layout = tpu.AnalogDevice.pre_calibrated_layouts[0]
    reg = layout.define_register(0, 1, qubit_ids=["q0", "q1"])
    seq = tpu.Sequence(reg, tpu.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, 0.0, 0.0), "ryd")
    seq.measure("ground-rydberg")
    return seq


def test_qpu_backend_run(qpu_seq):
    conn = FakeConn()
    qpu = tpu.QPUBackend(
        qpu_seq,
        conn,
        config=tpu.backend.BackendConfig(default_num_shots=100),
    )
    rr = qpu.run()
    assert rr.get_batch_status() == BatchStatus.DONE
    assert rr.job_ids == ["j0"]
    assert len(rr.results) == 1
    assert list(rr.get_available_results()) == ["j0"]


def test_qpu_backend_requires_runs(qpu_seq):
    conn = FakeConn()
    qpu = tpu.QPUBackend(qpu_seq, conn)
    with pytest.raises(ValueError, match="must specify 'runs'"):
        qpu.run(job_params=[{"variables": {}}])


def test_qpu_validation_rejects_layoutless_register():
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, 0.0, 0.0), "ryd")
    with pytest.raises(ValueError, match="RegisterLayout"):
        tpu.QPUBackend(seq, FakeConn())


def test_open_batch_context(qpu_seq):
    conn = FakeConn()
    backend = RemoteBackend(qpu_seq, conn)
    with backend.open_batch():
        assert backend._batch_id is not None
    assert backend._batch_id is None


def test_backends_registry():
    import pulser_tpu.backends as backends

    assert backends.QPUBackend is tpu.QPUBackend
    from pulser_tpu.emulator import TpuBackendV2

    assert backends.QutipBackendV2 is TpuBackendV2
    with pytest.raises(AttributeError, match="pasqal_cloud"):
        backends.RemoteSVBackend
