"""Resident solve server: warm TPU emulation for fresh processes.

On tunneled TPU backends the FIRST execution of a large solver
program stalls for minutes server-side (measured: identical 2.5 MB
executable, client compile ≤ 5 s, first execution 95–487 s depending
on time of day, while a trivial program's first execution is
instant — see ``docs/NUMERICS.md``, "Cold-start anatomy"). The cost
is per process, so the production answer is the same as every
serving stack's: keep ONE process resident with the compiled
programs loaded, and let fresh client processes submit work to it.

The daemon listens on a unix socket and solves sequences shipped in
the package's own abstract representation (the same wire format the
reference uses for its cloud backends,
``pulser-core/pulser/backend/remote.py``); results return as
compressed npz payloads. A thin client —
:class:`SolveClient` — needs no JAX at all, so a fresh process pays
only the solve plus IPC (~0.3 s for the 16-atom flagship sweep
versus minutes through a cold backend).

Protocol: length-prefixed JSON frames over ``AF_UNIX`` (local,
same-user trust domain; no pickle anywhere). Requests::

    {"kind": "ping"}
    {"kind": "run_sequence", "sequence": <abstract-repr str>,
     "noise_model": <abstract-repr str | null>,
     "evaluation_times": [..] | str | null,
     "with_modulation": bool, "seed": int | null,
     "n_samples": int | null}   # sample instead of returning states
    {"kind": "run_backend", "sequence": <abstract-repr str>,
     "config": <EmulationConfig abstract-repr str | null>,
     "mimic_qpu": bool, "seed": int | null}
    {"kind": "shutdown"}

``run_backend`` runs the full backend-v2 pipeline —
:class:`pulser_tpu.emulator.TpuBackendV2` with the shipped
``EmulationConfig`` (observables, callbacks' results, evaluation
times, noise) — and returns the :class:`pulser_tpu.backend.Results`
in ITS abstract representation, so expectation values, correlation
matrices, occupations, energies and sampled bitstrings all flow
through the warm daemon, not just raw states. Connections are served
one request at a time; clients open one connection per request
(:meth:`SolveClient._request`), so concurrent clients interleave at
request granularity with no shared mutable state between them.

Start a daemon with ``python -m pulser_tpu.serving --socket PATH``
or programmatically via :func:`serve`; or let
:func:`SolveClient.ensure_server` spawn one on demand (the spawned
daemon pays the cold start once; every later process is warm).
"""

from __future__ import annotations

import base64
import io
import json
import os
import socket
import struct
import subprocess
import sys
import tempfile
import threading
import time
from typing import Any

__all__ = ["serve", "SolveClient", "default_socket_path"]

_LEN = struct.Struct(">Q")
_MAX_FRAME = 1 << 31  # 2 GiB: above any sane states payload


def default_socket_path() -> str:
    """The default daemon socket (per-user, in the temp dir)."""
    return os.environ.get(
        "PULSER_TPU_SERVE_SOCKET",
        os.path.join(
            tempfile.gettempdir(),
            f"pulser_tpu_serve_{os.getuid()}.sock",
        ),
    )


def _send_frame(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(_LEN.pack(len(payload)) + payload)


def _recv_exact(conn: socket.socket, count: int) -> bytes:
    parts = []
    while count:
        chunk = conn.recv(min(count, 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        parts.append(chunk)
        count -= len(chunk)
    return b"".join(parts)


def _recv_frame(conn: socket.socket) -> bytes:
    (length,) = _LEN.unpack(_recv_exact(conn, _LEN.size))
    if length > _MAX_FRAME:
        raise ValueError(f"frame too large: {length}")
    return _recv_exact(conn, length)


def _npz_b64(**arrays: Any) -> str:
    import numpy as np

    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _b64_npz(blob: str) -> dict[str, Any]:
    import numpy as np

    data = np.load(io.BytesIO(base64.b64decode(blob)))
    return {k: data[k] for k in data.files}


def _handle_run(req: dict[str, Any]) -> dict[str, Any]:
    """Executes one run_sequence request in the resident process.

    Warnings raised by the solve are captured and shipped to the
    client in the response (a daemon's stderr is nobody's console).
    """
    import warnings

    import numpy as np

    from pulser_tpu import NoiseModel, Sequence
    from pulser_tpu.emulator import TpuEmulator

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = _run_inner(req, np, NoiseModel, Sequence, TpuEmulator)
    if caught:
        out["warnings"] = [str(w.message) for w in caught]
    return out


def _run_inner(req, np, NoiseModel, Sequence, TpuEmulator):

    seq = Sequence.from_abstract_repr(req["sequence"])
    noise = (
        NoiseModel.from_abstract_repr(req["noise_model"])
        if req.get("noise_model")
        else None
    )
    eval_times = req.get("evaluation_times")
    if isinstance(eval_times, list):
        eval_times = np.asarray(eval_times)
    kwargs: dict[str, Any] = {}
    if eval_times is not None:
        kwargs["evaluation_times"] = eval_times
    if noise is not None:
        kwargs["noise_model"] = noise
    if req.get("seed") is not None:
        np.random.seed(int(req["seed"]))
    sim = TpuEmulator.from_sequence(
        seq,
        with_modulation=bool(req.get("with_modulation", False)),
        **kwargs,
    )
    res = sim.run()
    out: dict[str, Any] = {"ok": True}
    n_samples = req.get("n_samples")
    if n_samples:
        counts = res.sample_final_state(int(n_samples))
        out["counts"] = dict(counts)
    else:
        wanted = (
            res.states[-1:]
            if req.get("final_only")
            else res.states
        )
        states = np.stack(
            [s.full()[:, 0] for s in wanted]
        )  # (n_eval, dim)
        out["states_npz"] = _npz_b64(
            states=states,
            eval_times=np.asarray(sim.evaluation_times)[
                -1 if req.get("final_only") else 0 :
            ],
        )
    return out


def _handle_backend(req: dict[str, Any]) -> dict[str, Any]:
    """Executes one backend-v2 run in the resident process.

    The full Observable/Callback pipeline runs daemon-side — the
    shipped ``EmulationConfig`` carries the observables (expectation
    values, correlation matrices, occupation, energies, bitstrings,
    fidelities, state snapshots) — and the resulting
    :class:`~pulser_tpu.backend.Results` returns in its abstract
    representation, the same wire format the reference's cloud
    backends exchange (``pulser-core/pulser/backend/results.py``
    round trip).
    """
    import warnings

    import numpy as np

    from pulser_tpu import Sequence
    from pulser_tpu.emulator import TpuBackendV2
    from pulser_tpu.emulator.tpu_config import TpuConfig

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        seq = Sequence.from_abstract_repr(req["sequence"])
        config = (
            TpuConfig.from_abstract_repr(req["config"])
            if req.get("config")
            else None
        )
        if req.get("seed") is not None:
            np.random.seed(int(req["seed"]))
        results = TpuBackendV2(
            seq,
            config=config,
            mimic_qpu=bool(req.get("mimic_qpu", False)),
        ).run()
    out: dict[str, Any] = {
        "ok": True,
        "results_repr": results.to_abstract_repr(),
    }
    if caught:
        out["warnings"] = [str(w.message) for w in caught]
    return out


def _handle(req: dict[str, Any]) -> tuple[dict[str, Any], bool]:
    """Returns (response, keep_serving)."""
    kind = req.get("kind")
    if kind == "ping":
        return {"ok": True, "pid": os.getpid()}, True
    if kind == "shutdown":
        return {"ok": True}, False
    if kind in ("run_sequence", "run_backend"):
        handler = (
            _handle_run if kind == "run_sequence" else _handle_backend
        )
        try:
            return handler(req), True
        except Exception as err:  # noqa: BLE001 — shipped to client
            return (
                {"ok": False, "error": f"{type(err).__name__}: {err}"},
                True,
            )
    return {"ok": False, "error": f"unknown kind: {kind!r}"}, True


def serve(
    socket_path: str | None = None,
    *,
    warm_request: dict[str, Any] | None = None,
    ready_event: threading.Event | None = None,
) -> None:
    """Runs the solve daemon until a shutdown request arrives.

    Args:
        socket_path: Unix-socket path (default
            :func:`default_socket_path`). A stale socket file is
            replaced.
        warm_request: Optional ``run_sequence`` request executed
            before accepting clients, so the first client gets a warm
            solve (the daemon pays the backend's one-time program
            load here).
        ready_event: Set once the socket is listening (and the warm
            request, if any, has completed) — for in-process servers
            in tests and benchmarks.
    """
    path = socket_path or default_socket_path()
    try:
        os.unlink(path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(4)
    if warm_request is not None:
        _handle(dict(warm_request, kind="run_sequence"))
    if ready_event is not None:
        ready_event.set()
    serving = True
    try:
        while serving:
            conn, _ = srv.accept()
            with conn:
                try:
                    while True:
                        req = json.loads(_recv_frame(conn).decode())
                        resp, serving = _handle(req)
                        _send_frame(
                            conn, json.dumps(resp).encode()
                        )
                        if not serving:
                            break
                except (ConnectionError, json.JSONDecodeError):
                    continue
    finally:
        srv.close()
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class SolveClient:
    """Thin client for the resident solve daemon (no JAX imports)."""

    def __init__(self, socket_path: str | None = None):
        self.socket_path = socket_path or default_socket_path()

    def _request(
        self, req: dict[str, Any], timeout: float = 600.0
    ) -> dict[str, Any]:
        with socket.socket(
            socket.AF_UNIX, socket.SOCK_STREAM
        ) as conn:
            conn.settimeout(timeout)
            conn.connect(self.socket_path)
            _send_frame(conn, json.dumps(req).encode())
            return json.loads(_recv_frame(conn).decode())

    def ping(self, timeout: float = 5.0) -> bool:
        try:
            return bool(
                self._request({"kind": "ping"}, timeout)["ok"]
            )
        except OSError:
            return False

    def shutdown(self) -> None:
        try:
            self._request({"kind": "shutdown"}, timeout=10.0)
        except OSError:
            pass

    def run(
        self,
        sequence: Any,
        *,
        noise_model: Any = None,
        evaluation_times: Any = None,
        with_modulation: bool = False,
        seed: int | None = None,
        n_samples: int | None = None,
        final_only: bool = False,
        timeout: float = 600.0,
    ) -> dict[str, Any]:
        """Solves a sequence on the daemon.

        ``sequence``/``noise_model`` may be objects (serialized via
        their ``to_abstract_repr``) or already-serialized strings, so
        thin clients never import JAX.

        Returns ``{"states": (n_eval, dim) complex, "eval_times":
        (n_eval,)}``, or ``{"counts": {bitstring: n}}`` when
        ``n_samples`` is given.
        """
        if hasattr(sequence, "to_abstract_repr"):
            sequence = sequence.to_abstract_repr()
        if noise_model is not None and hasattr(
            noise_model, "to_abstract_repr"
        ):
            noise_model = noise_model.to_abstract_repr()
        if hasattr(evaluation_times, "tolist"):
            evaluation_times = evaluation_times.tolist()
        resp = self._request(
            {
                "kind": "run_sequence",
                "sequence": sequence,
                "noise_model": noise_model,
                "evaluation_times": evaluation_times,
                "with_modulation": with_modulation,
                "seed": seed,
                "n_samples": n_samples,
                "final_only": final_only,
            },
            timeout,
        )
        if not resp.get("ok"):
            raise RuntimeError(
                f"daemon error: {resp.get('error', 'unknown')}"
            )
        if "counts" in resp:
            return {"counts": resp["counts"]}
        arrays = _b64_npz(resp["states_npz"])
        return {
            "states": arrays["states"],
            "eval_times": arrays["eval_times"],
        }

    def run_backend(
        self,
        sequence: Any,
        *,
        config: Any = None,
        mimic_qpu: bool = False,
        seed: int | None = None,
        deserialize: bool = True,
        timeout: float = 600.0,
    ) -> Any:
        """Runs the backend-v2 Observable/Results pipeline on the
        daemon.

        ``sequence``/``config`` may be objects (serialized via their
        ``to_abstract_repr``) or already-serialized strings.

        Returns a :class:`pulser_tpu.backend.Results` (expectation
        values, correlation matrices, bitstrings, ... keyed by
        observable tag), or — with ``deserialize=False`` — its raw
        abstract-repr JSON string, which needs no pulser_tpu import
        on the client side.
        """
        if hasattr(sequence, "to_abstract_repr"):
            sequence = sequence.to_abstract_repr()
        if config is not None and hasattr(
            config, "to_abstract_repr"
        ):
            config = config.to_abstract_repr()
        resp = self._request(
            {
                "kind": "run_backend",
                "sequence": sequence,
                "config": config,
                "mimic_qpu": mimic_qpu,
                "seed": seed,
            },
            timeout,
        )
        if not resp.get("ok"):
            raise RuntimeError(
                f"daemon error: {resp.get('error', 'unknown')}"
            )
        if not deserialize:
            return resp["results_repr"]
        from pulser_tpu.backend.results import Results

        return Results.from_abstract_repr(resp["results_repr"])

    def ensure_server(
        self,
        spawn_timeout: float = 1800.0,
        env: dict[str, str] | None = None,
    ) -> bool:
        """Pings the daemon, spawning one if absent.

        The spawned daemon pays the backend's cold start once;
        returns True when a server is reachable. The child is fully
        detached (survives this process).
        """
        if self.ping():
            return True
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "pulser_tpu.serving",
                "--socket",
                self.socket_path,
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,
            env=env or os.environ.copy(),
        )
        deadline = time.monotonic() + spawn_timeout
        while time.monotonic() < deadline:
            if self.ping():
                return True
            time.sleep(0.5)
        return False


def _main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="pulser_tpu resident solve daemon"
    )
    parser.add_argument("--socket", default=None)
    args = parser.parse_args()
    serve(args.socket)


if __name__ == "__main__":
    _main()
