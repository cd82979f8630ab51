"""Multi-chip Monte-Carlo trajectory parallelism over a device mesh.

The reference executes its noise-trajectory loop serially
(``pulser-simulation/pulser_simulation/simulation.py:848-861``).  Here
trajectories are a first-class parallel axis: per-trajectory coefficient
arrays are stacked, ``vmap``-ped through the jitted sesolve scan, and
sharded across chips over ICI with ``shard_map``; the only collective is
the ``psum`` of the per-trajectory probability histograms at the end —
exactly the ``Results.aggregate`` semantics.

States are carried in real-pair form (``(2, dim)``; TPU backends have
no complex dtype support) — see :mod:`pulser_tpu.ops.apply`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pulser_tpu.ops.apply import _hpsi, neg_i


def default_mesh(
    axis_name: str = "traj", min_devices: int = 2
) -> Mesh | None:
    """A 1D mesh over all local devices, or None when not beneficial.

    This is the emulator's default data-parallel layout: noise
    trajectories shard over every attached chip via ICI.  Returns None
    on single-device hosts and when ``PULSER_TPU_DISABLE_SHARDING`` is
    set (used by tests to compare sharded vs serial execution).
    """
    import os

    if os.environ.get("PULSER_TPU_DISABLE_SHARDING"):
        return None
    try:
        devices = jax.devices()
    except Exception:  # pragma: no cover
        return None
    if len(devices) < min_devices:
        return None
    return Mesh(np.array(devices), axis_names=(axis_name,))


def pad_to_multiple(
    arrays: tuple[np.ndarray, ...], multiple: int
) -> tuple[tuple[np.ndarray, ...], int]:
    """Pads each array's leading (trajectory) axis up to a multiple.

    Padding repeats the last entry; callers slice the outputs back to
    the true trajectory count. Returns the padded arrays and the pad
    amount.
    """
    n_traj = arrays[0].shape[0]
    pad = (-n_traj) % multiple
    if pad == 0:
        return arrays, 0
    padded = tuple(
        np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        for a in arrays
    )
    return padded, pad


def sesolve_ip_states_sharded(
    mesh: Mesh,
    psi2_0: jax.Array,
    amp_re: jax.Array,
    amp_im: jax.Array,
    det_cum_mod: jax.Array,
    t_stage: jax.Array,
    dts: jax.Array,
    eval_t: jax.Array,
    eval_cum_mod: jax.Array,
    diags: jax.Array,
    *,
    pairs: tuple[tuple[int, int, int], ...],
    d: int,
    n: int,
    axis_name: str = "traj",
) -> jax.Array:
    """Trajectory-sharded batched interaction-picture sesolve.

    The per-trajectory stage arrays (leading axis) split over the
    mesh's ``axis_name``; each chip vmaps the jitted IP scan over its
    local shard. The evolution is embarrassingly parallel — states come
    back sharded over the same axis with **zero collectives** in the
    hot loop; the gather to host happens once at the end.

    Args:
        mesh: 1D device mesh over ``axis_name``.
        psi2_0, t_stage, dts, eval_t: Replicated (shared) inputs.
        amp_re, amp_im, det_cum_mod, eval_cum_mod, diags: Per-trajectory
            inputs, leading axis divisible by the mesh size.
        pairs, d, n: Static Hamiltonian structure.

    Returns:
        ``(n_traj, n_seg, 2, dim)`` lab-frame states at the eval times.
    """
    from pulser_tpu.ops.solver import _sesolve_scan_ip

    n_traj = amp_re.shape[0]
    n_dev = mesh.shape[axis_name]
    assert n_traj % n_dev == 0, (
        f"trajectory count ({n_traj}) must divide evenly over the"
        f" '{axis_name}' mesh axis ({n_dev})"
    )

    def local_work(ar, ai, cm, ec, dg):
        return jax.vmap(
            lambda ar1, ai1, cm1, ec1, dg1: _sesolve_scan_ip(
                psi2_0,
                ar1,
                ai1,
                cm1,
                t_stage,
                dts,
                eval_t,
                ec1,
                dg1,
                pairs=pairs,
                d=d,
                n=n,
            )
        )(ar, ai, cm, ec, dg)

    sharded = shard_map(
        local_work,
        mesh=mesh,
        in_specs=(P(axis_name),) * 5,
        out_specs=P(axis_name),
        check_rep=False,
    )
    return jax.jit(sharded)(
        amp_re, amp_im, det_cum_mod, eval_cum_mod, diags
    )


def trajectory_sharded(
    mesh: Mesh,
    local_fn,
    per_traj: tuple[jax.Array, ...],
    axis_name: str = "traj",
) -> jax.Array:
    """Runs a batched solver with its trajectory axis mesh-sharded.

    Generic wrapper used by the dissipative batches (mesolve/MCWF):
    each array in ``per_traj`` splits its leading (trajectory) axis
    over the mesh's ``axis_name``; ``local_fn`` — which may close over
    replicated arrays (initial state, step grid, collapse algebra) —
    runs on every chip over its local shard, and the stacked states
    come back sharded over the same axis with zero collectives in the
    hot loop (the evolution is embarrassingly parallel).

    Args:
        mesh: 1D device mesh over ``axis_name``.
        local_fn: Callable taking ``len(per_traj)`` local shards and
            returning a leading-axis-batched result.
        per_traj: Per-trajectory arrays; leading axes must all be
            divisible by the mesh size.

    Returns:
        The batched result, gathered over the trajectory axis.
    """
    n_traj = per_traj[0].shape[0]
    n_dev = mesh.shape[axis_name]
    assert n_traj % n_dev == 0, (
        f"trajectory count ({n_traj}) must divide evenly over the"
        f" '{axis_name}' mesh axis ({n_dev})"
    )
    sharded = shard_map(
        lambda *shards: local_fn(*shards),
        mesh=mesh,
        in_specs=(P(axis_name),) * len(per_traj),
        out_specs=P(axis_name),
        check_rep=False,
    )
    return jax.jit(sharded)(*per_traj)


def _sesolve_scan_batched(
    psi2_0: jax.Array,
    amp_re_stages: jax.Array,
    amp_im_stages: jax.Array,
    det_stages: jax.Array,
    dts: jax.Array,
    static_diag: jax.Array,
    pairs: tuple[tuple[int, int, int], ...],
    d: int,
    n: int,
) -> jax.Array:
    """RK4 evolution of one trajectory, returning the final state.

    Args:
        psi2_0: ``(2, dim)`` real-pair initial state.
        amp_re_stages: ``(n_steps, 3, n_bases, n)`` real stage coeffs.
        amp_im_stages: ``(n_steps, 3, n_bases, n)`` imaginary parts.
        det_stages: ``(n_steps, 3, n_bases, n)`` real stage coeffs.
        dts: ``(n_steps,)`` step sizes (µs).
        static_diag: ``(dim,)`` interaction diagonal.
        pairs: static drive index triples.
        d, n: qudit dimension and count.
    """

    def deriv(psi2, ar_s, ai_s, det_s):
        return neg_i(
            _hpsi(
                psi2, static_diag, ar_s, ai_s, det_s,
                pairs, d, n, None, None,
            )
        )

    def step(psi, xs):
        ar_st, ai_st, det_st, h = xs
        k1 = deriv(psi, ar_st[0], ai_st[0], det_st[0])
        k2 = deriv(psi + 0.5 * h * k1, ar_st[1], ai_st[1], det_st[1])
        k3 = deriv(psi + 0.5 * h * k2, ar_st[1], ai_st[1], det_st[1])
        k4 = deriv(psi + h * k3, ar_st[2], ai_st[2], det_st[2])
        return psi + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    psi_f, _ = jax.lax.scan(
        step, psi2_0, (amp_re_stages, amp_im_stages, det_stages, dts)
    )
    return psi_f


def run_trajectories_sharded(
    mesh: Mesh,
    psi0: np.ndarray,
    amp_stages: np.ndarray,
    det_stages: np.ndarray,
    dts: np.ndarray,
    static_diag: np.ndarray,
    pairs: tuple[tuple[int, int, int], ...],
    d: int,
    n: int,
    axis_name: str = "traj",
) -> jax.Array:
    """Evolves a batch of noise trajectories sharded across a mesh.

    The trajectory batch (leading axis of the stage-coefficient arrays)
    is split over the mesh's ``axis_name`` axis; each chip integrates
    its shard locally (vmap over its local trajectories) and the final
    probability histograms are summed over ICI with ``psum``.

    Args:
        mesh: The device mesh (1D over ``axis_name``).
        psi0: ``(dim,)`` shared complex initial state (host numpy).
        amp_stages: ``(n_traj, n_steps, 3, n_bases, n)`` complex.
        det_stages: ``(n_traj, n_steps, 3, n_bases, n)`` real.
        dts: ``(n_steps,)`` shared step sizes.
        static_diag: ``(dim,)`` shared interaction diagonal.
        pairs, d, n: static Hamiltonian structure.
        axis_name: The mesh axis to shard trajectories over.

    Returns:
        ``(dim,)`` summed probability histogram over all trajectories.
    """
    n_traj = amp_stages.shape[0]
    n_dev = mesh.shape[axis_name]
    assert n_traj % n_dev == 0, (
        f"trajectory count ({n_traj}) must divide evenly over the"
        f" '{axis_name}' mesh axis ({n_dev})"
    )

    solve_one = functools.partial(
        _sesolve_scan_batched,
        static_diag=jnp.asarray(np.asarray(static_diag).real),
        pairs=pairs,
        d=d,
        n=n,
    )

    def local_work(ar_sh, ai_sh, det_sh, psi0_rep, dts_rep):
        # vmap over this chip's local trajectories
        finals = jax.vmap(
            lambda ar, ai, de: solve_one(psi0_rep, ar, ai, de, dts_rep)
        )(ar_sh, ai_sh, det_sh)
        # |psi|^2 = re^2 + im^2 in real-pair form
        local_hist = jnp.sum(
            finals[:, 0] ** 2 + finals[:, 1] ** 2, axis=0
        )
        # Single ICI collective: histogram reduction
        return jax.lax.psum(local_hist, axis_name)

    sharded = shard_map(
        local_work,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    amp_np = np.asarray(amp_stages)
    psi0_np = np.asarray(psi0)
    rdtype = np.asarray(det_stages).dtype
    return jax.jit(sharded)(
        jnp.asarray(amp_np.real, dtype=rdtype),
        jnp.asarray(amp_np.imag, dtype=rdtype),
        jnp.asarray(det_stages),
        jnp.asarray(
            np.stack([psi0_np.real, psi0_np.imag]), dtype=rdtype
        ),
        jnp.asarray(dts),
    )
