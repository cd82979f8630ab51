"""Solving a QUBO with the Quantum Adiabatic Algorithm (QAA).

TPU-native rendition of the reference's "QAA to solve a QUBO problem"
application tutorial (reference: tutorials/applications/QAA to solve a
QUBO problem.ipynb), with a JAX twist: the register *embedding* — atom
positions whose Rydberg interactions reproduce the QUBO couplings — is
found by gradient descent straight through the C6/r^6 interaction law,
instead of a derivative-free optimizer.

Pipeline: QUBO matrix -> differentiable embedding -> adiabatic
amplitude/detuning schedule -> sampled bitstrings -> argmin(QUBO).

Run:  python examples/qubo_qaa.py
"""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

import pulser_tpu as tpu
from pulser_tpu.devices import DigitalAnalogDevice
from pulser_tpu.emulator import TpuEmulator

# --- the problem: a 5-variable QUBO ---------------------------------
# cost(z) = z^T Q z over z in {0,1}^5.  Every diagonal entry rewards
# turning its bit on; strong off-diagonal penalties (20) forbid most
# pairs, except the cheap (0, 4) pairing (3).
n = 5
Q = np.full((n, n), 20.0)
Q[np.diag_indices(n)] = -8.0
Q[0, 4] = Q[4, 0] = 3.0

bitstrings = ["".join(b) for b in itertools.product("01", repeat=n)]
costs = {
    b: float(
        np.array(list(b), dtype=float)
        @ Q
        @ np.array(list(b), dtype=float)
    )
    for b in bitstrings
}
optimum = min(costs, key=costs.__getitem__)
print(f"brute-force optimum: {optimum} (cost {costs[optimum]:.1f})")
assert optimum == "10001"  # bits 0 and 4: 2*(-8) + 2*3 = -10

# --- differentiable embedding: positions from the QUBO --------------
# The Ising energy of a sampled configuration is
#   E(z) = -delta_f * sum z_i + sum_{i<j} (C6 / r_ij^6) z_i z_j
# so matching C6/r^6 to 2*Q_ij (the QUBO counts each pair twice) and
# delta_f to -Q_ii aligns the two landscapes exactly.
C6 = DigitalAnalogDevice.interaction_coeff
target = 2.0 * np.asarray(Q)


def interactions(flat_xy: jnp.ndarray) -> jnp.ndarray:
    xy = flat_xy.reshape(n, 2)
    diff = xy[:, None, :] - xy[None, :, :]
    r2 = (diff**2).sum(-1) + jnp.eye(n)  # keep the diagonal finite
    return C6 / r2**3


def embedding_loss(flat_xy: jnp.ndarray) -> jnp.ndarray:
    """Hinge-matched embedding objective.

    Forbidden pairs only need to be *blockaded* (u >= 40 — any excess
    just strengthens the constraint), while the cheap (0, 4) pair must
    realize its penalty exactly; a soft floor keeps every distance
    above the device's 4 um minimum.
    """
    u = interactions(flat_xy)
    xy = flat_xy.reshape(n, 2)
    diff = xy[:, None, :] - xy[None, :, :]
    r = jnp.sqrt((diff**2).sum(-1) + jnp.eye(n))
    strong_mask = jnp.asarray((target == 40.0)) * (1.0 - jnp.eye(n))
    hinge = (jax.nn.relu(40.0 - u) ** 2 * strong_mask).sum()
    exact = (u[0, 4] - 6.0) ** 2 + (u[4, 0] - 6.0) ** 2
    too_close = (
        jax.nn.relu(4.5 - r) ** 2 * (1.0 - jnp.eye(n))
    ).sum()
    return hinge + exact + 100.0 * too_close


# Adam, jitted end-to-end through C6/r^6 (the raw gradient spans many
# orders of magnitude near r -> 0, so a normalizing optimizer is the
# right tool).
import optax

opt = optax.adam(0.05)
xy = jax.random.normal(jax.random.PRNGKey(0), (2 * n,)) * 5.0
opt_state = opt.init(xy)


@jax.jit
def gd_step(xy, opt_state):
    loss, g = jax.value_and_grad(embedding_loss)(xy)
    updates, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(xy, updates), opt_state, loss


for step in range(3000):
    xy, opt_state, loss = gd_step(xy, opt_state)
print(f"embedding loss after Adam: {float(loss):.2f}")

coords = np.array(xy).reshape(n, 2)
coords -= coords.mean(0)
reg = tpu.Register.from_coordinates(coords, prefix="q")

# The realized couplings must rank like the penalties: the one cheap
# pair ends up much farther apart than the forbidden ones.
U = np.asarray(interactions(xy))
mask = ~np.eye(n, dtype=bool)
strong = U[(target == 40.0) & mask].min()
weak = U[0, 4]
print(f"realized couplings: strong >= {strong:.1f}, weak {weak:.1f}")
assert strong > 35.0, strong  # every forbidden pair blockaded
assert abs(weak - 6.0) < 1.5, weak  # the cheap pair matched

# --- the adiabatic schedule -----------------------------------------
# Ramp Omega on and off while sweeping the detuning from far-negative
# (all atoms ground) to +8 = -diag(Q); the instantaneous ground state
# morphs from |00000> into argmin(QUBO).
omega_max = 10.0  # between the weak (6) and strong (40) couplings
delta_f = 8.0
T = 6000  # ns

amp = tpu.InterpolatedWaveform(T, [1e-9, omega_max, 1e-9])
det = tpu.InterpolatedWaveform(T, [-delta_f, 0.0, delta_f])
seq = tpu.Sequence(reg, DigitalAnalogDevice)
seq.declare_channel("ising", "rydberg_global")
seq.add(tpu.Pulse(amp, det, 0.0), "ising")
seq.measure("ground-rydberg")

counts = (
    TpuEmulator.from_sequence(seq)
    .run()
    .sample_final_state(N_samples=2000)
)
top = counts.most_common(4)
print("most sampled:", top)

best_sampled = top[0][0]
assert best_sampled == optimum, (best_sampled, optimum)
# The optimum should dominate the distribution, not just edge it out.
assert top[0][1] > 2000 * 0.3, top
print(
    f"QAA found {best_sampled} with probability "
    f"{top[0][1] / 2000:.2f}"
)
print("OK qubo-qaa walkthrough complete")
