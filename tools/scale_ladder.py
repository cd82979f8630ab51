"""Beyond-flagship scale ladder: warm per-solve timing at 24-26 atoms.

The r4 scale artifact recorded only "solve (incl. compile)", which on
a tunneled TPU is dominated by the server-side first-execution stall
(a heavy-tailed lottery, 10-670 s measured, uncorrelated with size).
This ladder separates the three costs per size:

- build: host Sequence -> emulator construction;
- cold solve: first run() incl. trace/lower/compile AND the stall;
- warm solves: repeated run() + device-sync barrier (median of 3),
  with steps/s and the solver's achieved-FLOP/s telemetry.

Norm sanity comes from an on-device reduction (fetching a 2^26 state
through the tunnel would cost more than the solve).

Usage:  python tools/scale_ladder.py [sizes...]   (default 24 25 26)
"""

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

# Single-chip ladder: keep the (single-device) mesh-sharded solver
# out of the way so the lazy device-resident batch path engages and
# .sync() gives a clean device-time barrier.
os.environ.setdefault("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "99")


def run_size(n_atoms: int) -> dict:
    import jax.numpy as jnp

    import bench
    import pulser_tpu as tpu
    from pulser_tpu.emulator import TpuEmulator

    rows = int(np.floor(np.sqrt(n_atoms)))
    cols = -(-n_atoms // rows)
    coords = [
        (7.0 * c, 7.0 * r)
        for r in range(rows)
        for c in range(cols)
    ][:n_atoms]
    reg = tpu.Register.from_coordinates(coords, prefix="q")
    seq = tpu.Sequence(reg, tpu.devices.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(52, 2 * np.pi, 1.0, 0.0), "ryd")

    t0 = time.perf_counter()
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    build_s = time.perf_counter() - t0
    print(f"  build: {build_s:.2f}s", flush=True)

    t0 = time.perf_counter()
    res = sim.run()  # noqa: F841 — keeps the device batch alive
    sim._last_device_batch.sync()
    cold_s = time.perf_counter() - t0
    print(f"  cold solve (compile + stall): {cold_s:.2f}s", flush=True)

    warm = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = sim.run()  # noqa: F841
        sim._last_device_batch.sync()
        warm.append(time.perf_counter() - t0)
    warm_s = statistics.median(warm)
    from pulser_tpu.ops import solver

    info = dict(solver.last_solve_info)
    n_steps = int(info.get("n_steps", 0))
    tele = bench.solve_telemetry(warm_s)
    # Norm sanity via an on-device reduction (4-byte fetch)
    dev = sim._last_device_batch._dev
    norm = float(jnp.sqrt(jnp.sum(jnp.square(dev[-1]))))
    print(
        f"  warm solves: {[f'{t:.3f}' for t in warm]} ->"
        f" median {warm_s:.3f}s"
        f"  ({n_steps / warm_s:.0f} steps/s, kind"
        f" {info.get('kind')})",
        flush=True,
    )
    print(f"  telemetry: {tele}", flush=True)
    print(f"  final-state norm (on-device): {norm:.8f}", flush=True)
    assert abs(norm - 1.0) < 1e-4, "norm drifted"
    return {
        "n_atoms": n_atoms,
        "build_s": round(build_s, 2),
        "cold_solve_s": round(cold_s, 2),
        "warm_solve_s": [round(t, 4) for t in warm],
        "warm_median_s": round(warm_s, 4),
        "n_steps": n_steps,
        "steps_per_s": round(n_steps / warm_s, 1),
        "telemetry": tele,
        "norm": round(norm, 8),
        "solver_kind": info.get("kind"),
    }


def main() -> None:
    import jax

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [
        24,
        25,
        26,
    ]
    print(
        f"devices: {len(jax.devices())}"
        f" ({jax.devices()[0].platform})",
        flush=True,
    )
    out = []
    for n in sizes:
        print(f"=== {n} atoms (dim 2^{n} = {2**n:,}) ===", flush=True)
        out.append(run_size(n))
    import json

    print("JSON:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
