"""SLM mask and detuning-map modulation (DMM) walkthrough.

The TPU-native rendition of the reference's "SLM mask" and "DMM"
tutorials (BASELINE config #4 — SLM + DMM + digital local raman):

1. A ``DetuningMap`` assigns per-trap weights; a DMM channel plays a
   (negative) detuning waveform scaled by each qubit's weight.
2. An SLM mask shields chosen qubits from the first global pulse —
   in Ising mode it lowers them by a large DMM detuning instead of
   physically removing them.
3. A local raman (digital basis) pulse addresses a single qubit.

Run:  python examples/slm_mask_dmm.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.sampler import sample

# --- register + detuning map ---------------------------------------
reg = tpu.Register.square(2, spacing=8.0, prefix="q")
qubit_ids = list(reg.qubit_ids)

# Weight the detuning: q0 gets the full effect, q1 half, rest none.
weights = {"q0": 1.0, "q1": 0.5, "q2": 0.0, "q3": 0.0}
detuning_map = reg.define_detuning_map(weights)

seq = tpu.Sequence(reg, tpu.MockDevice)
seq.declare_channel("ryd", "rydberg_global")
seq.declare_channel("raman", "raman_local", initial_target="q0")
seq.config_detuning_map(detuning_map, "dmm_0")

# --- SLM mask: shield q2/q3 from the first global pulse ------------
seq.config_slm_mask(["q2", "q3"])

# The masked (first) global pulse: only q0/q1 respond.
seq.add(tpu.Pulse.ConstantPulse(400, 2 * np.pi, 0.0, 0.0), "ryd")

# DMM detuning: -4 rad/us, weighted per qubit by the detuning map.
seq.add_dmm_detuning(tpu.ConstantWaveform(400, -4.0), "dmm_0")

# Local digital pulse on q0 (raman channel, 'digital' basis).
seq.add(
    tpu.Pulse.ConstantDetuning(
        tpu.BlackmanWaveform(500, np.pi), 0.0, 0.0
    ),
    "raman",
)

print(f"sequence duration: {seq.get_duration()} ns")
print(f"declared channels: {sorted(seq.declared_channels)}")

# --- inspect the lowered samples -----------------------------------
samples = sample(seq)
nested = samples.to_nested_dict()
slm_window = samples._slm_mask.end
print(f"SLM mask window: 0-{slm_window} ns over {samples._slm_mask.targets}")

# During the mask window the masked qubits carry the -10*amp detuning
masked_det = np.asarray(
    nested["Local"]["ground-rydberg"]["q2"]["det"]
)[:slm_window]
assert masked_det.min() < -10, "SLM mask detuning not applied"

# The DMM detuning lands weighted: q0 full, q1 half. It plays in
# parallel with the global pulse ("no-delay" for DMMs), and the
# global pulse itself carries zero detuning, so the whole detuning
# series on q0/q1 is the weighted DMM waveform.
det_q0 = np.asarray(nested["Local"]["ground-rydberg"]["q0"]["det"])
det_q1 = np.asarray(nested["Local"]["ground-rydberg"]["q1"]["det"])
assert det_q0.sum() < 0, "DMM detuning missing on q0"
ratio = det_q1.sum() / det_q0.sum()
print(f"q1/q0 DMM detuning ratio: {ratio:.3f} (weights 0.5/1.0)")
assert abs(ratio - 0.5) < 1e-9

# --- emulate -------------------------------------------------------
sim = TpuEmulator.from_sequence(seq)
res = sim.run()
final = res.get_final_state()
counts = res.sample_final_state(1000)
top = counts.most_common(3)
print(f"top outcomes: {top}")
norm = float(np.linalg.norm(np.asarray(final.full())))
print(f"final-state norm: {norm:.6f}")
assert abs(norm - 1) < 1e-5
print("OK slm+dmm walkthrough complete")
