"""Demo: a 24-atom (dim 2^24 = 16.8M) solve with the statevector
sharded across a device mesh.

One chip's HBM caps out around N ≈ 26 qubits; beyond that the 2^N axis
must split across chips. This demo runs the full public pipeline
(Register → Sequence → TpuEmulator) with the distributed-statevector
solver engaged, on either real multi-chip hardware or a virtual
8-device CPU mesh (the default here, so it runs anywhere).

Usage:
    python examples/distributed_statevector_demo.py [n_atoms]

Note: on the virtual CPU mesh all 8 "chips" share one host CPU, so a
24-atom run takes tens of minutes (22 atoms ≈ 7 min); on a real TPU
pod slice each chip works on its own 2^N/8 block over ICI.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Virtual 8-device mesh when real multi-chip hardware is absent.
if "--real-devices" not in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if "--real-devices" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

# Engage state sharding at this demo's sizes (default threshold: 22)
os.environ.setdefault("PULSER_TPU_STATE_SHARD_MIN_QUBITS", "20")

import time

import numpy as np

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator

n_atoms = next(
    (int(a) for a in sys.argv[1:] if a.isdigit()), 24
)
rows = int(np.floor(np.sqrt(n_atoms)))
cols = -(-n_atoms // rows)
print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
print(f"atoms: {n_atoms}  (register {rows}x{cols}, truncated)")
print(f"Hilbert-space dim: 2^{n_atoms} = {2**n_atoms:,}")

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
t1 = time.perf_counter()
print(f"Hamiltonian build: {t1 - t0:.2f}s")

res = sim.run()
final = res.get_final_state(ignore_global_phase=False)
t2 = time.perf_counter()
norm = float(np.linalg.norm(final.full()))
print(f"solve (incl. compile): {t2 - t1:.2f}s")
print(f"final-state norm: {norm:.8f}")
assert abs(norm - 1.0) < 1e-5, "norm drifted — solver bug"
print("OK: distributed statevector solve completed")
