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
    RemoteResultsError,
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


class FlakyConn(FakeConn):
    """Fails the first result fetch, then succeeds (reference
    tests/test_backend.py:140-190 error-path seam)."""

    def __init__(self):
        super().__init__()
        self.fetch_attempts = 0

    def _fetch_result(self, batch_id, job_ids):
        self.fetch_attempts += 1
        if self.fetch_attempts == 1:
            raise RemoteResultsError("results not ready")
        return super()._fetch_result(batch_id, job_ids)


class PendingConn(FakeConn):
    """Reports one running job for partial-results testing."""

    def _query_job_progress(self, batch_id):
        out = {}
        for i, r in enumerate(self.batches[batch_id]):
            if i == 0:
                out[f"j{i}"] = (JobStatus.RUNNING, None)
            else:
                out[f"j{i}"] = (JobStatus.DONE, r)
        return out

    def _get_batch_status(self, batch_id):
        return BatchStatus.RUNNING


def test_remote_results_lazy_retry(qpu_seq):
    """A failed fetch surfaces as RemoteResultsError but a later
    access retries and succeeds (lazy-fetch semantics)."""
    conn = FlakyConn()
    rr = conn.submit(qpu_seq, job_params=[{"runs": 10}])
    with pytest.raises(
        RemoteResultsError, match="not available for all jobs"
    ):
        rr.results
    assert len(rr.results) == 1  # retried and fetched


def test_partial_results_while_running(qpu_seq):
    conn = PendingConn()
    rr = conn.submit(
        qpu_seq, job_params=[{"runs": 10}, {"runs": 10}]
    )
    assert rr.get_batch_status() == BatchStatus.RUNNING
    avail = rr.get_available_results()
    assert list(avail) == ["j1"]  # only the DONE job


def test_remote_results_job_ids_and_batch_id(qpu_seq):
    conn = FakeConn()
    rr = conn.submit(qpu_seq, job_params=[{"runs": 5}, {"runs": 5}])
    assert rr.batch_id.startswith("b")
    assert rr.job_ids == ["j0", "j1"]
    assert rr.get_batch_status() == BatchStatus.DONE
    assert len(rr.results) == 2


def test_update_sequence_device_retargets(qpu_seq):
    """A sequence on a stale same-named device is re-targeted onto
    the connection's current device specs."""
    import dataclasses
    import warnings

    conn = FakeConn()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        stale = qpu_seq.with_new_device(
            dataclasses.replace(tpu.AnalogDevice, max_runs=123)
        )
    updated = conn.update_sequence_device(stale)
    assert updated.device is tpu.AnalogDevice
    # A sequence already on the served device passes through
    assert conn.update_sequence_device(qpu_seq).device is (
        tpu.AnalogDevice
    )


def test_update_sequence_device_unknown_device(qpu_seq):
    conn = FakeConn()
    seq = tpu.Sequence(
        tpu.Register.square(2, spacing=6.0, prefix="q"),
        tpu.MockDevice,
    )
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(
        ValueError, match="does not match any of the devices"
    ):
        conn.update_sequence_device(seq)


def test_measurement_added_automatically():
    """Sequences without a measurement get one appended."""
    layout = tpu.AnalogDevice.pre_calibrated_layouts[0]
    reg = layout.define_register(0, 1, qubit_ids=["q0", "q1"])
    seq = tpu.Sequence(reg, tpu.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 2.0, 0.0, 0.0), "ryd")
    assert not seq.is_measured()
    fixed = RemoteConnection._add_measurement_to_sequence(seq)
    assert fixed.is_measured()
    # Already-measured sequences pass through unchanged
    assert RemoteConnection._add_measurement_to_sequence(fixed)


def test_validate_job_params():
    from pulser_tpu.backend.remote import RemoteBackend

    with pytest.raises(TypeError, match="must be a list"):
        RemoteBackend.validate_job_params({"runs": 1}, None)
    with pytest.raises(TypeError, match="must be"):
        RemoteBackend.validate_job_params(["runs"], None)
