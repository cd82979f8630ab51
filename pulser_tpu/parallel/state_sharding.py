"""Distributed statevector evolution: sharding the 2^N axis over chips.

The reference scales Hilbert-space dimension only through CSR sparsity
inside QuTiP (``pulser-simulation/pulser_simulation/hamiltonian.py:437-439``)
and is limited to one host's memory.  Here the ``2^N`` statevector axis
itself shards across the device mesh, so systems beyond one chip's HBM
(N ≳ 26) evolve with each chip holding a contiguous block of
amplitudes:

- the **leading k qubits** (``2^k = n_devices``) become the mesh axis:
  chip ``s`` holds the amplitudes whose first ``k`` bits spell ``s``;
- the Ising **interaction diagonal** and the **detuning phases** (this
  is the interaction-picture solver: the full diagonal is rotated away
  exactly) are elementwise → embarrassingly local;
- drives on **local qubits** use the same grouped-matmul machinery as
  the single-chip solver (:mod:`pulser_tpu.ops.apply`), on the local
  block;
- a drive on a **sharded qubit** ``q`` couples each amplitude to the
  one whose ``q``-th bit is flipped — which lives on exactly one other
  chip.  One ``jax.lax.ppermute`` with the XOR-partner permutation
  moves the partner block over ICI, and the coupling reduces to a
  complex-scalar multiply (the interaction picture keeps drive
  matrices purely off-diagonal, so no local term remains).

Cost per RK4 stage: ``k`` ppermutes of the local block — bandwidth
``k·dim/P`` per chip over ICI, overlapping with the local contractions.
This is the neutral-atom emulator's "tensor parallelism": the model
(the state) is too big for one chip and splits across the mesh, where
:mod:`pulser_tpu.parallel.trajectories` is its data parallelism.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pulser_tpu.ops.apply import (
    _group_matrix,
    apply_axis_r,
    apply_block_c,
    build_drive_matrices,
    group_sizes,
    neg_i,
)
from pulser_tpu.ops.solver import _cmul, _real_dtype

#: Minimum qubit count for the emulator to prefer state sharding over
#: single-chip evolution (overridable for tests via the environment).
STATE_SHARD_MIN_QUBITS = 22


def state_shard_min_qubits() -> int:
    """The active state-sharding threshold (env-overridable)."""
    import os

    return int(
        os.environ.get(
            "PULSER_TPU_STATE_SHARD_MIN_QUBITS",
            STATE_SHARD_MIN_QUBITS,
        )
    )


#: Density matrices cost 4^N, so their single-chip ceiling is about
#: half the statevector's qubit count.
RHO_SHARD_MIN_QUBITS = 13


def rho_shard_min_qubits() -> int:
    """The density-matrix row-sharding threshold (env-overridable)."""
    import os

    return int(
        os.environ.get(
            "PULSER_TPU_RHO_SHARD_MIN_QUBITS",
            RHO_SHARD_MIN_QUBITS,
        )
    )


def default_state_mesh(
    n: int, axis_name: str = "state"
) -> Mesh | None:
    """A power-of-two 1D mesh for sharding an ``n``-qubit state.

    Uses the largest power-of-two subset of the attached devices (the
    XOR-partner exchange needs a hypercube). Returns None on
    single-device hosts, when sharding is disabled via
    ``PULSER_TPU_DISABLE_SHARDING``, or when ``n`` is too small to
    split.
    """
    import os

    if os.environ.get("PULSER_TPU_DISABLE_SHARDING"):
        return None
    try:
        devices = jax.devices()
    except Exception:  # pragma: no cover
        return None
    k = len(devices).bit_length() - 1
    if k < 1 or k >= n:
        return None
    return Mesh(np.array(devices[: 2**k]), axis_names=(axis_name,))


def _xor_perm(n_dev: int, bit: int) -> list[tuple[int, int]]:
    """The XOR-partner permutation for one sharded-qubit bit."""
    return [(s, s ^ (1 << bit)) for s in range(n_dev)]


def sesolve_ip_statevector_sharded(
    psi0: np.ndarray,
    plan: Any,
    static_diag: np.ndarray,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    mesh: Mesh,
    dtype: Any = None,
    axis_name: str = "state",
) -> np.ndarray:
    """Interaction-picture sesolve with the statevector sharded.

    Matches :func:`pulser_tpu.ops.solver.sesolve_rk4`'s IP path
    numerically (same RK4 stages, same segmented plan layout); only
    the data placement differs.

    Args:
        psi0: ``(2**n,)`` complex initial state (host numpy).
        plan: The :func:`pulser_tpu.ops.solver.build_plan` result; its
            stage arrays must include ``amp`` and ``det_cum``.
        static_diag: ``(2**n,)`` interaction diagonal.
        pairs: Per-basis ``(i, j, k)`` drive triples. Qubits only
            (``d = 2``), so ``{i, j} == {0, 1}`` for every basis.
        n: The qubit count.
        mesh: 1D mesh over ``axis_name``; its size must be a power of
            two not exceeding ``2**(n-1)``.
        dtype: Complex dtype of the evolution (defaults to psi0's).

    Returns:
        ``(n_eval, 2**n)`` complex states at the evaluation times.
    """
    n_dev = int(np.prod(list(mesh.shape.values())))
    k = int(n_dev).bit_length() - 1
    if 2**k != n_dev:
        raise ValueError(
            f"mesh size must be a power of two, got {n_dev}"
        )
    if k >= n:
        raise ValueError(
            f"cannot shard {n} qubits over {n_dev} devices"
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
    amp_np = plan.seg_stage("amp")
    amp_re = jnp.asarray(amp_np.real, dtype=rdtype)
    amp_im = jnp.asarray(amp_np.imag, dtype=rdtype)
    det_cum_mod = jnp.asarray(
        (-plan.seg_stage("det_cum")) % two_pi, dtype=rdtype
    )
    t_stage = jnp.asarray(plan.seg_stage("t_stage"), dtype=rdtype)
    dts = jnp.asarray(plan.seg_dts, dtype=rdtype)
    eval_t = jnp.asarray(
        plan.eval_times - plan.grid[0], dtype=rdtype
    )
    eval_cum_mod = jnp.asarray(
        (-plan.eval_det_cum) % two_pi, dtype=rdtype
    )
    diag = jnp.asarray(np.asarray(static_diag).real, dtype=rdtype)

    out = _sesolve_ip_statevector_sharded_jit(
        psi2_0,
        amp_re,
        amp_im,
        det_cum_mod,
        t_stage,
        dts,
        eval_t,
        eval_cum_mod,
        diag,
        mesh=mesh,
        pairs=pairs,
        n=n,
        k=k,
        axis_name=axis_name,
    )
    out_np = np.asarray(out)[plan.eval_map]
    return (out_np[:, 0] + 1j * out_np[:, 1]).astype(cdtype)


def _make_ip_local_work(
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    k: int,
    axis_name: str,
    rdtype: Any,
):
    """Builds the per-device IP sesolve body for a sharded state.

    Shared by the 1D statevector sharding
    (:func:`_sesolve_ip_statevector_sharded_jit`) and the 2D
    trajectory×state mesh (:mod:`pulser_tpu.parallel.mesh2d`), which
    vmaps this body over its local trajectory block.
    """
    d = 2
    n_dev = 2**k
    n_local = n - k
    dim_local = d**n_local
    groups = group_sizes(d, n_local)
    nb = len(pairs)

    def local_work(
        psi2_loc,  # (2, dim_local)
        amp_re,  # (n_seg, L, 3, nb, n) replicated
        amp_im,
        det_cum_mod,  # (n_seg, L, 3, nb, n)
        t_stage,  # (n_seg, L, 3)
        dts,  # (n_seg, L)
        eval_t,  # (n_seg,)
        eval_cum_mod,  # (n_seg, nb, n)
        diag_loc,  # (dim_local,)
    ):
        dev = jax.lax.axis_index(axis_name)
        two_pi = jnp.asarray(2 * np.pi, dtype=rdtype)

        # Per-basis projector occupancies on the local block: global
        # index = dev·dim_local + iota, digit q = bit (n-1-q).  For
        # sharded qubits (q < k) the digit is constant per device.
        iota = jax.lax.iota(jnp.int32, dim_local)
        glob_hi = dev.astype(jnp.int32)  # the k leading bits
        occ_rows = []
        for b, (_, _, kp) in enumerate(pairs):
            for q in range(n):
                if q < k:
                    bit = (glob_hi >> (k - 1 - q)) & 1
                    occ_rows.append(
                        jnp.broadcast_to(
                            (bit == kp).astype(rdtype), (dim_local,)
                        )
                    )
                else:
                    bit = (iota >> (n - 1 - q)) & 1
                    occ_rows.append((bit == kp).astype(rdtype))
        # (nb, n, dim_local)
        occ_loc = jnp.stack(occ_rows).reshape(nb, n, dim_local)

        # Per-device digits of the sharded qubits, as rdtype signs
        digits = [
            ((glob_hi >> (k - 1 - q)) & 1).astype(rdtype)
            for q in range(k)
        ]

        def phase_at(t_s, cum_s):
            phi = jnp.mod(diag_loc * t_s, two_pi)
            phi = phi + jnp.einsum(
                "bq,bqD->D",
                cum_s,
                occ_loc,
                preferred_element_type=rdtype,
                precision="highest",
            )
            return phi

        def amp_apply(w, ar_s, ai_s):
            # (a) local-qubit drives: grouped matmuls on the block
            zero_det = jnp.zeros((nb, n_local), dtype=rdtype)
            m_re, m_im = build_drive_matrices(
                ar_s[:, k:], ai_s[:, k:], zero_det, pairs, d, n_local
            )
            out = jnp.zeros_like(w)
            q0 = 0
            for g in groups:
                g_re, g_im = _group_matrix(m_re, m_im, q0, q0 + g, d)
                out = out + apply_block_c(
                    g_re,
                    g_im,
                    w,
                    d**q0,
                    d**g,
                    d ** (n_local - q0 - g),
                )
                q0 += g
            # (b) sharded-qubit drives: one ppermute per qubit; the
            # coupling is m[a, 1-a] = amp (digit a == i) or amp*
            # (digit a == j) — a complex scalar times the partner
            # block. One exchange serves every basis.
            for q in range(k):
                w_p = jax.lax.ppermute(
                    w, axis_name, _xor_perm(n_dev, k - 1 - q)
                )
                cr = jnp.zeros((), dtype=rdtype)
                ci = jnp.zeros((), dtype=rdtype)
                a_dig = digits[q]
                for b, (i, _, _) in enumerate(pairs):
                    # sign of the imaginary part: + when digit == i
                    sgn = jnp.where(
                        a_dig == jnp.asarray(i, dtype=rdtype),
                        jnp.asarray(1.0, dtype=rdtype),
                        jnp.asarray(-1.0, dtype=rdtype),
                    )
                    cr = cr + ar_s[b, q]
                    ci = ci + sgn * ai_s[b, q]
                out = out + jnp.stack(
                    [
                        cr * w_p[0] - ci * w_p[1],
                        ci * w_p[0] + cr * w_p[1],
                    ]
                )
            return out

        rk_stage = jnp.asarray([0, 1, 1, 2])
        rk_a = jnp.asarray([0.0, 0.5, 0.5, 1.0], dtype=rdtype)
        rk_b = jnp.asarray(
            [1 / 6, 1 / 3, 1 / 3, 1 / 6], dtype=rdtype
        )

        def step(phi_state, xs):
            ar_st, ai_st, cum_st, t_st, h = xs

            def stage_body(stage_carry, i):
                k_prev, acc = stage_carry
                s = rk_stage[i]
                ph = phase_at(t_st[s], cum_st[s])
                c = jnp.cos(ph)
                sn = jnp.sin(ph)
                p = phi_state + (h * rk_a[i]) * k_prev
                w = _cmul(c, -sn, p)
                y = amp_apply(w, ar_st[s], ai_st[s])
                kk = neg_i(_cmul(c, sn, y))
                return (kk, acc + rk_b[i] * kk), None

            zeros = jnp.zeros_like(phi_state)
            (_, acc), _ = jax.lax.scan(
                stage_body, (zeros, zeros), jnp.arange(4)
            )
            return phi_state + h * acc, None

        def segment(phi_state, seg_xs):
            ar_sg, ai_sg, cum_sg, t_sg, h_sg, te, ce = seg_xs
            phi_state, _ = jax.lax.scan(
                step, phi_state, (ar_sg, ai_sg, cum_sg, t_sg, h_sg)
            )
            ph = phase_at(te, ce)
            psi_lab = _cmul(jnp.cos(ph), -jnp.sin(ph), phi_state)
            return phi_state, psi_lab

        _, ys = jax.lax.scan(
            segment,
            psi2_loc,
            (
                amp_re,
                amp_im,
                det_cum_mod,
                t_stage,
                dts,
                eval_t,
                eval_cum_mod,
            ),
        )
        return ys  # (n_seg, 2, dim_local)

    return local_work


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "pairs", "n", "k", "axis_name"),
)
def _sesolve_ip_statevector_sharded_jit(
    psi2_0: jax.Array,
    amp_re: jax.Array,
    amp_im: jax.Array,
    det_cum_mod: jax.Array,
    t_stage: jax.Array,
    dts: jax.Array,
    eval_t: jax.Array,
    eval_cum_mod: jax.Array,
    diag: jax.Array,
    *,
    mesh: Mesh,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    k: int,
    axis_name: str,
) -> jax.Array:
    """The compiled sharded-state IP scan (cached across calls)."""
    local_work = _make_ip_local_work(
        pairs, n, k, axis_name, psi2_0.dtype
    )
    sharded = shard_map(
        local_work,
        mesh=mesh,
        in_specs=(
            P(None, axis_name),  # psi2_0
            P(),  # amp_re
            P(),  # amp_im
            P(),  # det_cum_mod
            P(),  # t_stage
            P(),  # dts
            P(),  # eval_t
            P(),  # eval_cum_mod
            P(axis_name),  # diag
        ),
        out_specs=P(None, None, axis_name),
        check_rep=False,
    )
    return sharded(
        psi2_0,
        amp_re,
        amp_im,
        det_cum_mod,
        t_stage,
        dts,
        eval_t,
        eval_cum_mod,
        diag,
    )


def xy_sesolve_statevector_sharded(
    psi0: np.ndarray,
    plan: Any,
    static_diag: np.ndarray,
    xy_mat: np.ndarray,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    mesh: Mesh,
    xy_indices: tuple[int, int],
    dtype: Any = None,
    axis_name: str = "state",
) -> np.ndarray:
    """XY-mode sesolve with the statevector sharded over the mesh.

    Extends the sharded evolution beyond the interaction picture to
    the XY (dipole-dipole) Hamiltonian (reference
    ``hamiltonian.py:276-331``): the static ``(N, N)`` flip-flop
    coupling is applied with the lower-mix-raise strategy of
    :func:`pulser_tpu.ops.apply.apply_flip_flop_r`, where lowering or
    raising a SHARDED qubit becomes one XOR-partner ``ppermute`` of
    the local block plus a per-device digit mask. Matches
    ``_sesolve_scan``'s direct (non-interaction-picture) RK4
    numerically.

    Args:
        psi0: ``(2**n,)`` complex initial state (host numpy).
        plan: :func:`build_plan` result with ``amp`` and ``det``
            stage arrays.
        static_diag: ``(2**n,)`` static diagonal (the XY mode's
            Rydberg-stacking term).
        xy_mat: ``(n, n)`` real symmetric flip-flop couplings.
        pairs: Per-basis ``(i, j, k)`` drive triples (qubits only).
        n: The qubit count.
        mesh: 1D power-of-two mesh over ``axis_name``.
        xy_indices: ``(up_idx, down_idx)`` eigenbasis indices.

    Returns:
        ``(n_eval, 2**n)`` complex states at the evaluation times.
    """
    n_dev = int(np.prod(list(mesh.shape.values())))
    k = int(n_dev).bit_length() - 1
    if 2**k != n_dev:
        raise ValueError(
            f"mesh size must be a power of two, got {n_dev}"
        )
    if k >= n:
        raise ValueError(
            f"cannot shard {n} qubits over {n_dev} devices"
        )

    cdtype = dtype or np.asarray(psi0).dtype
    rdtype = _real_dtype(cdtype)
    psi0_np = np.asarray(psi0, dtype=cdtype)

    def dev(host_np: np.ndarray) -> jax.Array:
        return jnp.asarray(np.asarray(host_np, dtype=rdtype))

    amp_np = plan.seg_stage("amp")
    out = _xy_sesolve_statevector_sharded_jit(
        dev(np.stack([psi0_np.real, psi0_np.imag])),
        dev(amp_np.real),
        dev(amp_np.imag),
        dev(plan.seg_stage("det").real),
        dev(plan.seg_dts),
        dev(np.asarray(static_diag).real),
        dev(np.asarray(xy_mat).real),
        mesh=mesh,
        pairs=pairs,
        n=n,
        k=k,
        xy_indices=xy_indices,
        axis_name=axis_name,
    )
    out_np = np.asarray(out)[plan.eval_map]
    return (out_np[:, 0] + 1j * out_np[:, 1]).astype(cdtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "pairs",
        "n",
        "k",
        "xy_indices",
        "axis_name",
    ),
)
def _xy_sesolve_statevector_sharded_jit(
    psi2_0: jax.Array,
    amp_re: jax.Array,
    amp_im: jax.Array,
    det: jax.Array,
    dts: jax.Array,
    diag: jax.Array,
    xy_mat: jax.Array,
    *,
    mesh: Mesh,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    k: int,
    xy_indices: tuple[int, int],
    axis_name: str,
) -> jax.Array:
    """The compiled sharded XY scan (cached across calls)."""
    d = 2
    n_dev = 2**k
    n_local = n - k
    rdtype = psi2_0.dtype
    groups = group_sizes(d, n_local)
    nb = len(pairs)
    up_idx, down_idx = xy_indices

    def local_work(
        psi2_loc,  # (2, dim_local)
        amp_re,  # (n_seg, L, 3, nb, n) replicated
        amp_im,
        det,  # (n_seg, L, 3, nb, n)
        dts,  # (n_seg, L)
        diag_loc,  # (dim_local,)
    ):
        s_dev = jax.lax.axis_index(axis_name)
        glob_hi = s_dev.astype(jnp.int32)
        digits = [
            ((glob_hi >> (k - 1 - q)) & 1).astype(rdtype)
            for q in range(k)
        ]

        sigma_du = (
            jnp.zeros((d, d), dtype=rdtype)
            .at[down_idx, up_idx]
            .set(1.0)
        )
        sigma_ud = (
            jnp.zeros((d, d), dtype=rdtype)
            .at[up_idx, down_idx]
            .set(1.0)
        )

        def flip_flop(psi2):
            # lower every qubit, mix with U on the MXU, raise back.
            # Sharded qubits lower/raise through one XOR ppermute plus
            # a digit mask (sigma_du moves the partner block onto the
            # 'down' devices; sigma_ud back onto the 'up' devices).
            out_c = []
            for c in range(2):
                rows = []
                for q in range(k):
                    w_p = jax.lax.ppermute(
                        psi2[c], axis_name, _xor_perm(n_dev, k - 1 - q)
                    )
                    mask = (
                        digits[q] == jnp.asarray(down_idx, rdtype)
                    ).astype(rdtype)
                    rows.append(mask * w_p)
                for q in range(n_local):
                    rows.append(
                        apply_axis_r(
                            sigma_du, psi2[c], q, d, n_local
                        )
                    )
                low = jnp.stack(rows)  # (n, dim_local)
                mixed = jnp.einsum(
                    "ij,jD->iD",
                    xy_mat,
                    low,
                    preferred_element_type=rdtype,
                    precision="highest",
                )
                acc = jnp.zeros_like(psi2[c])
                for q in range(k):
                    v_p = jax.lax.ppermute(
                        mixed[q],
                        axis_name,
                        _xor_perm(n_dev, k - 1 - q),
                    )
                    mask = (
                        digits[q] == jnp.asarray(up_idx, rdtype)
                    ).astype(rdtype)
                    acc = acc + mask * v_p
                for q in range(n_local):
                    acc = acc + apply_axis_r(
                        sigma_ud, mixed[k + q], q, d, n_local
                    )
                out_c.append(acc)
            return jnp.stack(out_c)

        def h_apply(psi2, ar_s, ai_s, det_s):
            out = diag_loc * psi2
            # (a) local-qubit drives (incl. their detuning diagonal)
            m_re, m_im = build_drive_matrices(
                ar_s[:, k:],
                ai_s[:, k:],
                det_s[:, k:],
                pairs,
                d,
                n_local,
            )
            q0 = 0
            for g in groups:
                g_re, g_im = _group_matrix(m_re, m_im, q0, q0 + g, d)
                out = out + apply_block_c(
                    g_re,
                    g_im,
                    psi2,
                    d**q0,
                    d**g,
                    d ** (n_local - q0 - g),
                )
                q0 += g
            # (b) sharded-qubit drives: off-diagonal via ppermute,
            # detuning projector via the device digit
            for q in range(k):
                w_p = jax.lax.ppermute(
                    psi2, axis_name, _xor_perm(n_dev, k - 1 - q)
                )
                cr = jnp.zeros((), dtype=rdtype)
                ci = jnp.zeros((), dtype=rdtype)
                det_diag = jnp.zeros((), dtype=rdtype)
                for b, (i, _, kp) in enumerate(pairs):
                    sgn = jnp.where(
                        digits[q] == jnp.asarray(i, dtype=rdtype),
                        jnp.asarray(1.0, dtype=rdtype),
                        jnp.asarray(-1.0, dtype=rdtype),
                    )
                    cr = cr + ar_s[b, q]
                    ci = ci + sgn * ai_s[b, q]
                    occ = (
                        digits[q] == jnp.asarray(kp, dtype=rdtype)
                    ).astype(rdtype)
                    det_diag = det_diag - det_s[b, q] * occ
                out = out + jnp.stack(
                    [
                        cr * w_p[0] - ci * w_p[1],
                        ci * w_p[0] + cr * w_p[1],
                    ]
                )
                out = out + det_diag * psi2
            # (c) the XY flip-flop coupling
            out = out + flip_flop(psi2)
            return out

        rk_stage = jnp.asarray([0, 1, 1, 2])
        rk_a = jnp.asarray([0.0, 0.5, 0.5, 1.0], dtype=rdtype)
        rk_b = jnp.asarray(
            [1 / 6, 1 / 3, 1 / 3, 1 / 6], dtype=rdtype
        )

        def step(psi, xs):
            ar_st, ai_st, det_st, h = xs

            def stage_body(stage_carry, i):
                k_prev, acc = stage_carry
                s = rk_stage[i]
                kk = neg_i(
                    h_apply(
                        psi + (h * rk_a[i]) * k_prev,
                        ar_st[s],
                        ai_st[s],
                        det_st[s],
                    )
                )
                return (kk, acc + rk_b[i] * kk), None

            zeros = jnp.zeros_like(psi)
            (_, acc), _ = jax.lax.scan(
                stage_body, (zeros, zeros), jnp.arange(4)
            )
            return psi + h * acc, None

        def segment(psi, seg_xs):
            psi, _ = jax.lax.scan(step, psi, seg_xs)
            return psi, psi

        _, ys = jax.lax.scan(
            segment, psi2_loc, (amp_re, amp_im, det, dts)
        )
        return ys  # (n_seg, 2, dim_local)

    sharded = shard_map(
        local_work,
        mesh=mesh,
        in_specs=(
            P(None, axis_name),  # psi2_0
            P(),  # amp_re
            P(),  # amp_im
            P(),  # det
            P(),  # dts
            P(axis_name),  # diag
        ),
        out_specs=P(None, None, axis_name),
        check_rep=False,
    )
    return sharded(psi2_0, amp_re, amp_im, det, dts, diag)


def qudit_embed_indices(n: int, d: int) -> np.ndarray:
    """Flat indices of the ``(d,)**n`` tensor inside ``(4,)**n``.

    TPU-native qudit sharding works on power-of-two digit fields (two
    bits per qudit), so a qutrit register embeds into the d=4 tensor:
    amplitude ``(a_1..a_n)`` lands at ``Σ a_q · 4^(n-1-q)``.  No drive
    pair ever couples level 3, so the padded amplitudes stay exactly
    zero through the evolution.
    """
    idx = np.arange(d**n, dtype=np.int64)
    g4 = np.zeros_like(idx)
    rem = idx
    for q in range(n):
        p = d ** (n - 1 - q)
        g4 = g4 * 4 + rem // p
        rem = rem % p
    return g4


def qudit_sesolve_ip_statevector_sharded(
    psi0: np.ndarray,
    plan: Any,
    static_diag: np.ndarray,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    mesh: Mesh,
    d: int,
    dtype: Any = None,
    axis_name: str = "state",
) -> np.ndarray:
    """Sharded interaction-picture sesolve for d ∈ {3, 4} qudits.

    The d=2 fast path (:func:`sesolve_ip_statevector_sharded`) shards
    qubit bits; here each qudit is a two-bit digit of the flat
    ``4^n = 2^(2n)`` index and the mesh takes the leading ``k`` bits.
    A drive pair ``(i, j)`` on a digit with sharded bits is an XOR by
    ``i^j`` on that digit's bit field — the sharded-bit part is ONE
    ``ppermute`` (a device-index XOR is a permutation of the mesh),
    the local-bit part an axis reversal — masked by the digit
    occupancies ``digit==i`` / ``digit==j`` (unlike d=2, a level pair
    does not cover the whole digit space).  Fully-local digits use
    the same grouped-matmul machinery as the single-chip solver.

    Qutrits (d=3) embed into the d=4 tensor
    (:func:`qudit_embed_indices`): the memory overhead is
    ``(4/3)^n`` (≈10x at n=8), the trade for power-of-two blocks
    that tile TPU lanes and shard evenly — the native ``3^n`` axis
    admits no even power-of-two split.  Reference semantics:
    qutrit/leakage bases per
    ``pulser-core/pulser/_hamiltonian_data`` eigenbasis order.
    """
    n_dev = int(np.prod(list(mesh.shape.values())))
    k = int(n_dev).bit_length() - 1
    if 2**k != n_dev:
        raise ValueError(
            f"mesh size must be a power of two, got {n_dev}"
        )
    if d not in (3, 4):
        raise ValueError(f"qudit sharding supports d in (3, 4), not {d}")
    if k > 2 * (n - 1):
        raise ValueError(
            f"cannot shard {n} qudits over {n_dev} devices"
        )
    for i, j, kp in pairs:
        if max(i, j, kp) >= d:
            raise ValueError(f"pair {(i, j, kp)} outside d={d}")

    cdtype = dtype or np.asarray(psi0).dtype
    rdtype = _real_dtype(cdtype)
    psi0_np = np.asarray(psi0, dtype=cdtype)
    diag_np = np.asarray(static_diag).real.astype(rdtype)
    if d == 3:
        g4 = qudit_embed_indices(n, 3)
        psi4 = np.zeros(4**n, dtype=cdtype)
        psi4[g4] = psi0_np
        diag4 = np.zeros(4**n, dtype=rdtype)
        diag4[g4] = diag_np
        psi0_np, diag_np = psi4, diag4
    else:
        g4 = None

    psi2_0 = jnp.asarray(
        np.stack([psi0_np.real, psi0_np.imag]), dtype=rdtype
    )
    two_pi = 2 * np.pi
    amp_np = plan.seg_stage("amp")
    amp_re = jnp.asarray(amp_np.real, dtype=rdtype)
    amp_im = jnp.asarray(amp_np.imag, dtype=rdtype)
    det_cum_mod = jnp.asarray(
        (-plan.seg_stage("det_cum")) % two_pi, dtype=rdtype
    )
    t_stage = jnp.asarray(plan.seg_stage("t_stage"), dtype=rdtype)
    dts = jnp.asarray(plan.seg_dts, dtype=rdtype)
    eval_t = jnp.asarray(
        plan.eval_times - plan.grid[0], dtype=rdtype
    )
    eval_cum_mod = jnp.asarray(
        (-plan.eval_det_cum) % two_pi, dtype=rdtype
    )
    diag = jnp.asarray(diag_np, dtype=rdtype)

    out = _qudit_sesolve_ip_sharded_jit(
        psi2_0,
        amp_re,
        amp_im,
        det_cum_mod,
        t_stage,
        dts,
        eval_t,
        eval_cum_mod,
        diag,
        mesh=mesh,
        pairs=pairs,
        n=n,
        k=k,
        axis_name=axis_name,
    )
    out_np = np.asarray(out)[plan.eval_map]
    if g4 is not None:
        out_np = out_np[:, :, g4]
    return (out_np[:, 0] + 1j * out_np[:, 1]).astype(cdtype)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "pairs", "n", "k", "axis_name"),
)
def _qudit_sesolve_ip_sharded_jit(
    psi2_0: jax.Array,
    amp_re: jax.Array,
    amp_im: jax.Array,
    det_cum_mod: jax.Array,
    t_stage: jax.Array,
    dts: jax.Array,
    eval_t: jax.Array,
    eval_cum_mod: jax.Array,
    diag: jax.Array,
    *,
    mesh: Mesh,
    pairs: tuple[tuple[int, int, int], ...],
    n: int,
    k: int,
    axis_name: str,
) -> jax.Array:
    """The compiled d=4 sharded-state IP scan (cached across calls)."""
    d = 4
    n_dev = 2**k
    n_bits = 2 * n
    dim_local = 2 ** (n_bits - k)
    # digits 0..q_loc-1 have at least one sharded bit
    q_loc = -(-k // 2)
    n_loc4 = n - q_loc  # fully-local digits
    pre = dim_local // d**n_loc4  # 1, or 2 when k is odd
    rdtype = psi2_0.dtype
    groups = group_sizes(d, n_loc4)
    nb = len(pairs)

    def local_work(
        psi2_loc,  # (2, dim_local)
        amp_re,  # (n_seg, L, 3, nb, n) replicated
        amp_im,
        det_cum_mod,  # (n_seg, L, 3, nb, n)
        t_stage,  # (n_seg, L, 3)
        dts,  # (n_seg, L)
        eval_t,  # (n_seg,)
        eval_cum_mod,  # (n_seg, nb, n)
        diag_loc,  # (dim_local,)
    ):
        dev = jax.lax.axis_index(axis_name).astype(jnp.int32)
        two_pi = jnp.asarray(2 * np.pi, dtype=rdtype)

        iota = jax.lax.iota(jnp.int32, dim_local)
        glob = dev * jnp.asarray(dim_local, jnp.int32) + iota

        def digit(q):
            return (glob >> (2 * (n - 1 - q))) & 3

        occ_rows = [
            (digit(q) == kp).astype(rdtype)
            for _, _, kp in pairs
            for q in range(n)
        ]
        occ_loc = jnp.stack(occ_rows).reshape(nb, n, dim_local)

        def phase_at(t_s, cum_s):
            phi = jnp.mod(diag_loc * t_s, two_pi)
            phi = phi + jnp.einsum(
                "bq,bqD->D",
                cum_s,
                occ_loc,
                preferred_element_type=rdtype,
                precision="highest",
            )
            return phi

        def bitflip_local(w, local_mask):
            """XOR the local flat index by a constant mask."""
            for p in range(n_bits - k):
                if (local_mask >> p) & 1:
                    shape = (2, dim_local // 2 ** (p + 1), 2, 2**p)
                    w = jnp.flip(w.reshape(shape), axis=2).reshape(
                        2, dim_local
                    )
            return w

        def amp_apply(w, ar_s, ai_s):
            # (a) fully-local digits: grouped matmuls on the block
            zero_det = jnp.zeros((nb, n_loc4), dtype=rdtype)
            m_re, m_im = build_drive_matrices(
                ar_s[:, q_loc:],
                ai_s[:, q_loc:],
                zero_det,
                pairs,
                d,
                n_loc4,
            )
            out = jnp.zeros_like(w)
            q0 = 0
            for g in groups:
                g_re, g_im = _group_matrix(m_re, m_im, q0, q0 + g, d)
                out = out + apply_block_c(
                    g_re,
                    g_im,
                    w,
                    pre * d**q0,
                    d**g,
                    d ** (n_loc4 - q0 - g),
                )
                q0 += g
            # (b) digits with sharded bits: per (digit, basis) the
            # level exchange i<->j is an XOR by i^j on the digit's
            # bit field, masked by the digit occupancies.
            for q in range(q_loc):
                dig = digit(q).astype(rdtype)
                for b, (i, j, _) in enumerate(pairs):
                    if i == j:
                        # inert/diagonal pair: a sigma_ii + a* sigma_ii
                        m_i = (
                            dig == jnp.asarray(i, dtype=rdtype)
                        ).astype(rdtype)
                        cr = (2.0 * ar_s[b, q]) * m_i
                        out = out + jnp.stack(
                            [cr * w[0], cr * w[1]]
                        )
                        continue
                    mask = (i ^ j) << (2 * (n - 1 - q))
                    dev_mask = mask >> (n_bits - k)
                    local_mask = mask & (dim_local - 1)
                    w_p = w
                    if dev_mask:
                        w_p = jax.lax.ppermute(
                            w_p,
                            axis_name,
                            [
                                (s, s ^ dev_mask)
                                for s in range(n_dev)
                            ],
                        )
                    if local_mask:
                        w_p = bitflip_local(w_p, local_mask)
                    m_i = (
                        dig == jnp.asarray(i, dtype=rdtype)
                    ).astype(rdtype)
                    m_j = (
                        dig == jnp.asarray(j, dtype=rdtype)
                    ).astype(rdtype)
                    cr = ar_s[b, q] * (m_i + m_j)
                    ci = ai_s[b, q] * (m_i - m_j)
                    out = out + jnp.stack(
                        [
                            cr * w_p[0] - ci * w_p[1],
                            ci * w_p[0] + cr * w_p[1],
                        ]
                    )
            return out

        rk_stage = jnp.asarray([0, 1, 1, 2])
        rk_a = jnp.asarray([0.0, 0.5, 0.5, 1.0], dtype=rdtype)
        rk_b = jnp.asarray(
            [1 / 6, 1 / 3, 1 / 3, 1 / 6], dtype=rdtype
        )

        def step(phi_state, xs):
            ar_st, ai_st, cum_st, t_st, h = xs

            def stage_body(stage_carry, i):
                k_prev, acc = stage_carry
                s = rk_stage[i]
                ph = phase_at(t_st[s], cum_st[s])
                c = jnp.cos(ph)
                sn = jnp.sin(ph)
                p = phi_state + (h * rk_a[i]) * k_prev
                w = _cmul(c, -sn, p)
                y = amp_apply(w, ar_st[s], ai_st[s])
                kk = neg_i(_cmul(c, sn, y))
                return (kk, acc + rk_b[i] * kk), None

            zeros = jnp.zeros_like(phi_state)
            (_, acc), _ = jax.lax.scan(
                stage_body, (zeros, zeros), jnp.arange(4)
            )
            return phi_state + h * acc, None

        def segment(phi_state, seg_xs):
            ar_sg, ai_sg, cum_sg, t_sg, h_sg, te, ce = seg_xs
            phi_state, _ = jax.lax.scan(
                step, phi_state, (ar_sg, ai_sg, cum_sg, t_sg, h_sg)
            )
            ph = phase_at(te, ce)
            psi_lab = _cmul(jnp.cos(ph), -jnp.sin(ph), phi_state)
            return phi_state, psi_lab

        _, ys = jax.lax.scan(
            segment,
            psi2_loc,
            (
                amp_re,
                amp_im,
                det_cum_mod,
                t_stage,
                dts,
                eval_t,
                eval_cum_mod,
            ),
        )
        return ys  # (n_seg, 2, dim_local)

    sharded = shard_map(
        local_work,
        mesh=mesh,
        in_specs=(
            P(None, axis_name),  # psi2_0
            P(),  # amp_re
            P(),  # amp_im
            P(),  # det_cum_mod
            P(),  # t_stage
            P(),  # dts
            P(),  # eval_t
            P(),  # eval_cum_mod
            P(axis_name),  # diag
        ),
        out_specs=P(None, None, axis_name),
        check_rep=False,
    )
    return sharded(
        psi2_0,
        amp_re,
        amp_im,
        det_cum_mod,
        t_stage,
        dts,
        eval_t,
        eval_cum_mod,
        diag,
    )
