"""2D (trajectory × state) mesh: both parallel axes at once.

Large noisy runs need BOTH of this framework's parallel axes
(SURVEY §2.3): Monte-Carlo noise trajectories are the data-parallel
axis (:mod:`pulser_tpu.parallel.trajectories`), the ``2^N``
statevector is the model-parallel one
(:mod:`pulser_tpu.parallel.state_sharding`). A 20+-atom noisy run
has too large a state for trajectory-only sharding and too many
trajectories for state-only sharding to use a pod slice well — so
the mesh gets two axes:

- ``traj``: each trajectory group holds a full copy of ITS
  trajectories' states; no communication (embarrassingly parallel),
- ``state``: within a group, the ``2^N`` axis splits over the
  hypercube; drives on sharded qubits exchange XOR-partner blocks
  over ICI (``ppermute``), exactly as in the 1D state sharding —
  the per-device body is literally the same function
  (:func:`state_sharding._make_ip_local_work`), vmapped over the
  local trajectory block.

Collectives therefore stay WITHIN the state axis; the trajectory
axis contributes none (aggregation happens host-side on the sampled
counts, as in the 1D trajectory path).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pulser_tpu.ops.solver import _real_dtype
from pulser_tpu.parallel.state_sharding import _make_ip_local_work

__all__ = ["default_2d_mesh", "sesolve_ip_2d_sharded"]


def default_2d_mesh(
    n: int,
    n_traj: int,
    traj_axis: str = "traj",
    state_axis: str = "state",
) -> "Mesh | None":
    """A (traj, state) mesh over the local devices, or None.

    Policy: engage only when the state is big enough to need
    sharding (``state_shard_min_qubits``), there are at least two
    trajectories, and at least 4 devices are attached (2×2). The
    state axis takes the power-of-two split that brings the local
    block back under the single-chip threshold; remaining devices
    (largest power of two) go to trajectories.
    """
    import os

    from pulser_tpu.parallel.state_sharding import (
        state_shard_min_qubits,
    )

    if os.environ.get("PULSER_TPU_DISABLE_SHARDING"):
        return None
    forced = os.environ.get("PULSER_TPU_TRAJ_STATE_MESH")
    try:
        devices = jax.devices()
    except Exception:  # pragma: no cover
        return None
    if forced:
        t_dev, s_dev = (int(x) for x in forced.lower().split("x"))
        if t_dev * s_dev > len(devices):
            return None
        return Mesh(
            np.array(devices[: t_dev * s_dev]).reshape(
                t_dev, s_dev
            ),
            axis_names=(traj_axis, state_axis),
        )
    thresh = state_shard_min_qubits()
    if n < thresh or n_traj < 2 or len(devices) < 4:
        return None
    # Shard the state until the local block is below threshold, but
    # never past half the devices (trajectories need an axis too).
    k_total = len(devices).bit_length() - 1
    k_state = min(n - thresh + 1, k_total - 1)
    if k_state < 1:
        return None
    s_dev = 2**k_state
    t_dev = 2 ** (k_total - k_state)
    return Mesh(
        np.array(devices[: t_dev * s_dev]).reshape(t_dev, s_dev),
        axis_names=(traj_axis, state_axis),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "pairs",
        "n",
        "k",
        "traj_axis",
        "state_axis",
    ),
)
def _sesolve_ip_2d_jit(
    psi2_0: jax.Array,
    amp_re_b: jax.Array,
    amp_im_b: jax.Array,
    cum_b: jax.Array,
    t_stage: jax.Array,
    dts: jax.Array,
    eval_t: jax.Array,
    ev_cum_b: jax.Array,
    diag_b: jax.Array,
    *,
    mesh: Mesh,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    k: int,
    traj_axis: str,
    state_axis: str,
) -> jax.Array:
    """The compiled 2D-sharded batch (cached across calls)."""
    local_work = _make_ip_local_work(
        pairs, n, k, state_axis, psi2_0.dtype
    )

    def local_batch(
        ar_l, ai_l, cm_l, ec_l, dg_l, psi2_loc, t_st, dt_s, ev_t
    ):
        # vmap the single-trajectory sharded body over the local
        # trajectory block; the ppermutes inside batch cleanly (one
        # exchange carries the whole block's partner slabs).
        return jax.vmap(
            lambda ar, ai, cm, ec, dg: local_work(
                psi2_loc, ar, ai, cm, t_st, dt_s, ev_t, ec, dg
            )
        )(ar_l, ai_l, cm_l, ec_l, dg_l)

    sharded = shard_map(
        local_batch,
        mesh=mesh,
        in_specs=(
            P(traj_axis),  # amp_re (B, ...)
            P(traj_axis),  # amp_im
            P(traj_axis),  # det cum
            P(traj_axis),  # eval cum
            P(traj_axis, state_axis),  # diags (B, dim)
            P(None, state_axis),  # psi2_0 (2, dim)
            P(),  # t_stage
            P(),  # dts
            P(),  # eval_t
        ),
        out_specs=P(traj_axis, None, None, state_axis),
        check_rep=False,
    )
    return sharded(
        amp_re_b,
        amp_im_b,
        cum_b,
        ev_cum_b,
        diag_b,
        psi2_0,
        t_stage,
        dts,
        eval_t,
    )


def sesolve_ip_2d_sharded(
    psi0: np.ndarray,
    plans: Any,
    static_diags: np.ndarray,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    mesh: Mesh,
    dtype: Any = None,
    traj_axis: str = "traj",
    state_axis: str = "state",
) -> np.ndarray:
    """Batched IP sesolve on a (trajectory × state) device mesh.

    Numerically identical to
    :func:`pulser_tpu.ops.solver.sesolve_rk4_batched` (same RK4
    stages, same segmented plan); only the data placement differs:
    trajectories shard over ``traj_axis``, each trajectory's
    ``2^n`` state over ``state_axis``.

    Args:
        psi0: ``(2**n,)`` shared complex initial state.
        plans: A :class:`~pulser_tpu.ops.solver.BatchedPlan` (shared
            grid; per-trajectory coefficient values).
        static_diags: ``(B, 2**n)`` per-trajectory interaction
            diagonals.
        pairs, n: Static structure (qubits only, ``d = 2``).
        mesh: 2D mesh with ``traj_axis`` and ``state_axis``; the
            state axis must be a power of two below ``2**n``, and
            the trajectory count must divide over the traj axis
            (callers pad — see
            :func:`trajectories.pad_to_multiple`).
        dtype: Complex dtype of the evolution.

    Returns:
        ``(B, n_eval, 2**n)`` complex states.
    """
    s_dev = int(mesh.shape[state_axis])
    k = s_dev.bit_length() - 1
    if 2**k != s_dev:
        raise ValueError(
            f"state axis must be a power of two, got {s_dev}"
        )
    if k >= n:
        raise ValueError(
            f"cannot shard {n} qubits over {s_dev} devices"
        )
    for i, j, _ in pairs:
        if {i, j} != {0, 1}:
            raise ValueError(
                "state sharding requires qubit (d=2) drive pairs"
            )
    cdtype = dtype or np.asarray(psi0).dtype
    rdtype = _real_dtype(cdtype)
    psi0_np = np.asarray(psi0, dtype=cdtype)
    psi2_0 = jnp.asarray(
        np.stack([psi0_np.real, psi0_np.imag]), dtype=rdtype
    )
    two_pi = 2 * np.pi
    base = plans.plan
    amp_np = plans.seg_stage_b("amp")  # (B, n_seg, L, 3, nb, n)
    cum_np = (-plans.seg_stage_b("det_cum")) % two_pi
    ev_cum_np = (-plans.eval_det_cum_b) % two_pi
    n_traj = amp_np.shape[0]
    t_dev = int(mesh.shape[traj_axis])
    if n_traj % t_dev:
        raise ValueError(
            f"trajectory count ({n_traj}) must divide over the"
            f" '{traj_axis}' axis ({t_dev})"
        )
    out = _sesolve_ip_2d_jit(
        psi2_0,
        jnp.asarray(amp_np.real, dtype=rdtype),
        jnp.asarray(amp_np.imag, dtype=rdtype),
        jnp.asarray(cum_np, dtype=rdtype),
        jnp.asarray(base.seg_stage("t_stage"), dtype=rdtype),
        jnp.asarray(base.seg_dts, dtype=rdtype),
        jnp.asarray(
            base.eval_times - base.grid[0], dtype=rdtype
        ),
        jnp.asarray(ev_cum_np, dtype=rdtype),
        jnp.asarray(
            np.asarray(static_diags).real, dtype=rdtype
        ),
        mesh=mesh,
        pairs=pairs,
        n=n,
        k=k,
        traj_axis=traj_axis,
        state_axis=state_axis,
    )
    out_np = np.asarray(out)[:, base.eval_map]
    return (out_np[:, :, 0] + 1j * out_np[:, :, 1]).astype(cdtype)
