"""Fused Pallas TPU kernel for the interaction-picture sesolve.

The XLA scan solver (``ops/solver.py``) dispatches ~30 fused regions
per RK4 stage; on the TPU each region carries fixed overhead that
dwarfs the actual arithmetic at statevector sizes. This kernel fuses
an entire evaluation segment — every RK4 step, the interaction-picture
rotors, the drive application and the lab-frame emission — into one
Pallas program with the state resident in VMEM.

Structure (flagship ground-rydberg case: ``d=2``, one drive basis):

- The statevector lives as two ``(R, C)`` f32 VMEM scratch buffers
  (real/imag), with the row index carrying qubits ``0..n_row-1`` and
  the column index the rest — both axes lane/sublane aligned.
- The interaction-picture phase ``Φ(t) = (diag·t mod 2π) + Σ_q c_q
  bit_q`` is built from broadcasted iota bit masks (no ``(dim,)``
  occupancy tables).
- The amplitude term ``Σ_q a_q σ_gr^{(q)} + h.c.`` splits into one
  kron-summed matrix per axis group, synthesized in-kernel from XOR
  masks (``G[r, c] ≠ 0 ⟺ r ^ c == 2^bit``) and applied as four MXU
  matmuls per side.

Falls back to the XLA path for every other configuration
(see ``sesolve_rk4``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - platform specific
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None  # type: ignore[assignment]

_TWO_PI = 2 * np.pi


def _rk_stage_coeffs(j):
    """RK4 tableau entries for traced stage index ``j`` in 0..3.

    Returns ``(sidx, a_w, b_w)`` — the stage-sample index into the
    3-sample coefficient arrays (``[0, 1, 1, 2]``), the increment
    weight (``[0, 1/2, 1/2, 1]``) and the accumulation weight
    (``[1/6, 1/3, 1/3, 1/6]``) — as scalar arithmetic on ``j``, so a
    single traced stage body serves all four stages (a 4-branch
    ``lax.switch`` would quadruple the kernel graph Mosaic compiles).
    """
    sidx = (j + 1) >> 1
    a_w = 0.5 * sidx.astype(jnp.float32)
    mid = jnp.logical_or(j == 1, j == 2)
    b_w = jnp.where(mid, jnp.float32(1 / 3), jnp.float32(1 / 6))
    return sidx, a_w, b_w


def _bit_masks(size: int, n_bits: int, axis: int):
    """Per-bit 0/1 masks of an axis iota, broadcast-ready."""
    shape = (size, 1) if axis == 0 else (1, size)
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return [
        ((iota >> (n_bits - 1 - q)) & 1).astype(jnp.float32)
        for q in range(n_bits)
    ]


def _xor_iotas(size: int):
    """The XOR and row-iota int32 tensors for mask synthesis."""
    r = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return r ^ c, r


def _group_mats(a_re, a_im, xor, r_iota, n_bits):
    """Kron-summed off-diagonal drive matrix for one axis group.

    Matches ``build_drive_matrices`` with pairs ``(i=1, j=0)``:
    ``M_q = a_q |1><0| + ā_q |0><1|`` per qubit — the real part lands
    symmetrically on the XOR mask, the imaginary part carries ``+a_im``
    where the row bit is 1 and ``−a_im`` where it is 0. Masks are
    synthesized per qubit and die immediately (VMEM is the limit).
    """
    g_re = jnp.zeros(xor.shape, jnp.float32)
    g_im = jnp.zeros(xor.shape, jnp.float32)
    for q in range(n_bits):
        bit = 1 << (n_bits - 1 - q)
        m = (xor == bit).astype(jnp.float32)
        g_re = g_re + m * a_re[q]
        sign = (
            ((r_iota >> (n_bits - 1 - q)) & 1).astype(jnp.float32)
            * 2.0
            - 1.0
        )
        g_im = g_im + m * (a_im[q] * sign)
    return g_re, g_im


def _mm(a, b):
    return jnp.dot(
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ip_sesolve_kernel(
    a_re_ref,
    a_im_ref,
    cum_ref,
    t_ref,
    dt_ref,
    eval_t_ref,
    eval_cum_ref,
    diag_ref,
    psi0_re_ref,
    psi0_im_ref,
    out_ref,
    psi_re,
    psi_im,
    *,
    n_row: int,
    n_col: int,
    seg_len: int,
    segs_per_traj: int,
):
    """One grid step = one evaluation segment (state persists in VMEM).

    The grid flattens (trajectory, segment): the state scratch resets
    from ``psi0`` at each trajectory's first segment.
    """
    rows, cols = 1 << n_row, 1 << n_col
    s = pl.program_id(0)

    @pl.when(s % segs_per_traj == 0)
    def _():
        psi_re[:] = psi0_re_ref[:]
        psi_im[:] = psi0_im_ref[:]

    row_bits = _bit_masks(rows, n_row, 0)
    col_bits = _bit_masks(cols, n_col, 1)
    xor_a, riota_a = _xor_iotas(rows)
    xor_b, riota_b = _xor_iotas(cols)
    diag = diag_ref[0]

    def phase(t, cum):
        # The detuning projector sits on eigenbasis index 0 (σ_rr in
        # the r-first convention): its occupancy is ``1 − bit_q``, so
        # the phase carries the summed integral minus the bit-weighted
        # terms
        ph = jnp.mod(diag * t, _TWO_PI) + jnp.sum(cum)
        for q in range(n_row):
            ph = ph - cum[q] * row_bits[q]
        for q in range(n_col):
            ph = ph - cum[n_row + q] * col_bits[q]
        return ph

    def step_body(i, carry):
        pr, pi = carry
        h = dt_ref[0, i, 0]

        # One traced body serves all four RK4 stages (stage data is
        # indexed, coefficients computed from j — see
        # ``_rk_stage_coeffs``); a 4-iteration loop also keeps only
        # ONE stage's intermediates live on Mosaic's (conservatively
        # sized) VMEM stack — a Python unroll quadruples it and
        # overflows for dim 65536
        def stage_fn(j, op):
            k_r, k_i, acc_r, acc_i = op
            sidx, a_w, b_w = _rk_stage_coeffs(j)
            i3 = i * 3 + sidx
            xr = pr + (h * a_w) * k_r
            xi = pi + (h * a_w) * k_i
            ph = phase(t_ref[0, i3, 0], cum_ref[0, i3, :])
            c = jnp.cos(ph)
            sn = jnp.sin(ph)
            # w = e^{-iΦ} x = (c - i s)(xr + i xi)
            wr = c * xr + sn * xi
            wi = c * xi - sn * xr
            ga_re, ga_im = _group_mats(
                a_re_ref[0, i3, :n_row],
                a_im_ref[0, i3, :n_row],
                xor_a,
                riota_a,
                n_row,
            )
            gb_re, gb_im = _group_mats(
                a_re_ref[0, i3, n_row:],
                a_im_ref[0, i3, n_row:],
                xor_b,
                riota_b,
                n_col,
            )
            # y = G_A w (rows) + w G_Bᵀ (columns); G_B real part
            # is symmetric and imaginary part antisymmetric by
            # construction, so w @ G_Bᵀ re-uses the forward
            # matrices
            yr = (
                _mm(ga_re, wr)
                - _mm(ga_im, wi)
                + _mm(wr, gb_re)
                + _mm(wi, gb_im)
            )
            yi = (
                _mm(ga_im, wr)
                + _mm(ga_re, wi)
                + _mm(wi, gb_re)
                - _mm(wr, gb_im)
            )
            # k = -i e^{+iΦ} y
            z_r = c * yr - sn * yi
            z_i = c * yi + sn * yr
            k_r = z_i
            k_i = -z_r
            return (
                k_r,
                k_i,
                acc_r + b_w * k_r,
                acc_i + b_w * k_i,
            )

        zeros = jnp.zeros_like(pr)
        k_r, k_i, acc_r, acc_i = jax.lax.fori_loop(
            0, 4, stage_fn, (zeros, zeros, zeros, zeros)
        )
        return (pr + h * acc_r, pi + h * acc_i)

    pr, pi = jax.lax.fori_loop(
        0, seg_len, step_body, (psi_re[:], psi_im[:])
    )
    psi_re[:] = pr
    psi_im[:] = pi

    # Emit in the lab frame: ψ = e^{-iΦ(t_eval)} φ
    ph = phase(eval_t_ref[0, 0, 0], eval_cum_ref[0, 0, :])
    c = jnp.cos(ph)
    sn = jnp.sin(ph)
    out_ref[0, 0] = c * pr + sn * pi
    out_ref[0, 1] = c * pi - sn * pr


@functools.partial(
    jax.jit,
    static_argnames=("n_row", "n_col", "seg_len", "segs_per_traj", "interpret"),
)
def _ip_sesolve_jit(
    a_re,
    a_im,
    cum_mod,
    t_stage,
    seg_dts,
    eval_t,
    eval_cum_mod,
    diag2d,
    psi0_re,
    psi0_im,
    *,
    n_row: int,
    n_col: int,
    seg_len: int,
    segs_per_traj: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Runs the fused interaction-picture sesolve kernel.

    For trajectory batches, stack the per-trajectory segments on the
    leading axis (``n_seg = T·segs_per_traj``) and pass a
    ``(T, R, C)`` diagonal; the state resets from ``psi0`` at each
    trajectory boundary.

    Args:
        a_re/a_im: ``(n_seg, L, 3, n)`` drive coefficient stages.
        cum_mod: ``(n_seg, L, 3, n)`` range-reduced ``−∫det`` stages.
        t_stage: ``(n_seg, L, 3)`` absolute stage times.
        seg_dts: ``(n_seg, L)`` step sizes (0 = padding).
        eval_t: ``(n_seg,)`` evaluation times.
        eval_cum_mod: ``(n_seg, n)`` range-reduced ``−∫det`` at the
            evaluation times.
        diag2d: ``(R, C)`` static interaction diagonal.
        psi0_re/psi0_im: ``(R, C)`` initial state.
        n_row/n_col: Qubits on the row/column axis (``R=2^n_row``).
        seg_len: Steps per segment (static).
        interpret: Run in the Pallas interpreter (for CPU testing).

    Returns:
        ``(n_seg, 2, R, C)`` lab-frame states after each segment.
    """
    n_seg = a_re.shape[0]
    if segs_per_traj is None:
        segs_per_traj = n_seg
    if diag2d.ndim == 2:
        diag2d = diag2d[None]
    n = n_row + n_col
    rows, cols = 1 << n_row, 1 << n_col
    spt = segs_per_traj
    kernel = functools.partial(
        _ip_sesolve_kernel,
        n_row=n_row,
        n_col=n_col,
        seg_len=seg_len,
        segs_per_traj=spt,
    )
    scratch = [
        pltpu.VMEM((rows, cols), jnp.float32),
        pltpu.VMEM((rows, cols), jnp.float32),
    ]
    # The (step, stage-sample) axes merge into one sublane axis so
    # the kernel's single stage body can index row ``i*3 + sidx``
    # with a traced stage index (dynamic indexing stays off the lane
    # dimension). Reshapes here are free — they run inside the jit.
    L3 = seg_len * 3
    return pl.pallas_call(
        kernel,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((1, L3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, L3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, L3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, L3, 1), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, seg_len, 1), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, rows, cols), lambda s: (s // spt, 0, 0)),
            pl.BlockSpec((rows, cols), lambda s: (0, 0)),
            pl.BlockSpec((rows, cols), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, cols), lambda s: (s, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_seg, 2, rows, cols), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        jnp.reshape(a_re, (n_seg, L3, n)),
        jnp.reshape(a_im, (n_seg, L3, n)),
        jnp.reshape(cum_mod, (n_seg, L3, n)),
        jnp.reshape(t_stage, (n_seg, L3, 1)),
        seg_dts,
        eval_t,
        eval_cum_mod,
        diag2d,
        psi0_re,
        psi0_im,
    )


def ip_sesolve_pallas(
    *args,
    n_row: int,
    n_col: int,
    seg_len: int,
    segs_per_traj: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """AOT-cached entry point for :func:`_ip_sesolve_jit`.

    Same signature/semantics; routes through the ahead-of-time
    executable cache so warm processes skip tracing, Mosaic lowering
    and XLA compilation of the fused kernel entirely.
    """
    from pulser_tpu import aot_cache

    if segs_per_traj is None:
        segs_per_traj = args[0].shape[0]
    return aot_cache.call(
        _ip_sesolve_jit,
        "ip_sesolve",
        args,
        dict(
            n_row=n_row,
            n_col=n_col,
            seg_len=seg_len,
            segs_per_traj=segs_per_traj,
            interpret=interpret,
        ),
    )


def _group_mats_nh(
    lo_re, lo_im, up_re, up_im, xor, r_iota, n_bits
):
    """Kron-summed off-diagonal matrix for a NON-Hermitian axis group.

    Generalizes :func:`_group_mats`: the ``|1><0|`` entries carry
    ``lo_q`` and the ``|0><1|`` entries ``up_q`` independently (the
    MCWF effective Hamiltonian ``H - i/2 Σ L†L`` is not Hermitian).
    """
    g_re = jnp.zeros(xor.shape, jnp.float32)
    g_im = jnp.zeros(xor.shape, jnp.float32)
    for q in range(n_bits):
        bit = 1 << (n_bits - 1 - q)
        m = (xor == bit).astype(jnp.float32)
        rowbit = ((r_iota >> (n_bits - 1 - q)) & 1).astype(
            jnp.float32
        )
        g_re = g_re + m * (
            rowbit * lo_re[q] + (1.0 - rowbit) * up_re[q]
        )
        g_im = g_im + m * (
            rowbit * lo_im[q] + (1.0 - rowbit) * up_im[q]
        )
    return g_re, g_im


def _mcwf_kernel(
    a_re_ref,
    a_im_ref,
    det_ref,
    dt_ref,
    us_ref,
    r0_ref,
    diag_ref,
    psi0_re_ref,
    psi0_im_ref,
    out_ref,
    psi_re,
    psi_im,
    r_box,
    *,
    n_row: int,
    n_col: int,
    seg_len: int,
    blocks_per_traj: int,
    cops: tuple,
    g_diag: tuple,
    g_lo: tuple,
):
    """Fused quantum-jump (MCWF) trajectory kernel.

    One grid step = one fixed-size CHUNK of steps (long evaluation
    segments are split so the streamed coefficient windows fit VMEM);
    the state and the jump threshold persist in VMEM scratch across a
    trajectory's chunks, and the per-segment output block is
    revisited by every chunk of its segment (the last write is what
    flushes). Each RK4 step integrates ``dψ/dt =
    -i H_eff ψ`` with ``H_eff = H(t) - (i/2) Σ_{k,q} L_k†L_k`` and,
    when ``|ψ|² <= r``, applies the quantum jump selected by this
    step's pre-drawn uniforms — the scalar grid lets ``lax.cond``
    genuinely skip the jump work on the (vast majority of) no-jump
    steps, which a vmapped XLA solve cannot.

    Static args:
        cops: Per collapse op, the local 2x2 as 8 floats
            ``(l00r, l00i, l01r, l01i, l10r, l10i, l11r, l11i)``.
        g_diag: ``(g00, g11)`` diagonal of ``G = Σ L†L`` (real).
        g_lo: ``(re, im)`` of ``G[1, 0]``.
    """
    rows, cols = 1 << n_row, 1 << n_col
    n = n_row + n_col
    s = pl.program_id(0)

    @pl.when(s % blocks_per_traj == 0)
    def _():
        psi_re[:] = psi0_re_ref[:]
        psi_im[:] = psi0_im_ref[:]
        r_box[0, 0] = r0_ref[s // blocks_per_traj, 0]

    row_bits = _bit_masks(rows, n_row, 0)
    col_bits = _bit_masks(cols, n_col, 1)
    xor_a, riota_a = _xor_iotas(rows)
    xor_b, riota_b = _xor_iotas(cols)
    diag = diag_ref[0]

    # Imaginary diagonal of H_eff: -(1/2)(g00·#zeros + g11·#ones),
    # constant in time (computed once from the bit masks)
    pop = jnp.zeros((rows, cols), jnp.float32)
    for q in range(n_row):
        pop = pop + row_bits[q]
    for q in range(n_col):
        pop = pop + col_bits[q]
    g00, g11 = g_diag
    d_im = -0.5 * (g00 * (float(n) - pop) + g11 * pop)
    # Constant complex shifts folding G's off-diagonal into the
    # drive entries: lo += -i/2·G[1,0], up += -i/2·conj(G[1,0])
    klo_re, klo_im = 0.5 * g_lo[1], -0.5 * g_lo[0]
    kup_re, kup_im = -0.5 * g_lo[1], -0.5 * g_lo[0]

    def real_diag(i3):
        # diag + Σ_q (−det_q)·(1 − bit_q): the detuning projector
        # sits on eigenstate 0 in the r-first convention
        det = det_ref[0, i3, :]
        dr = diag - jnp.sum(det)
        for q in range(n_row):
            dr = dr + det[q] * row_bits[q]
        for q in range(n_col):
            dr = dr + det[n_row + q] * col_bits[q]
        return dr

    def eff_matvec(pr, pi, i3):
        """-i H_eff (pr + i pi) as a real pair."""
        a_re = a_re_ref[0, i3, :]
        a_im = a_im_ref[0, i3, :]
        ga_re, ga_im = _group_mats_nh(
            [a_re[q] + klo_re for q in range(n_row)],
            [a_im[q] + klo_im for q in range(n_row)],
            [a_re[q] + kup_re for q in range(n_row)],
            [-a_im[q] + kup_im for q in range(n_row)],
            xor_a,
            riota_a,
            n_row,
        )
        # Column-axis application is ψ @ Mᵀ: building the transpose
        # directly just swaps the lo/up roles
        gb_re, gb_im = _group_mats_nh(
            [a_re[n_row + q] + kup_re for q in range(n_col)],
            [-a_im[n_row + q] + kup_im for q in range(n_col)],
            [a_re[n_row + q] + klo_re for q in range(n_col)],
            [a_im[n_row + q] + klo_im for q in range(n_col)],
            xor_b,
            riota_b,
            n_col,
        )
        dr = real_diag(i3)
        acc_r = (
            dr * pr
            - d_im * pi
            + _mm(ga_re, pr)
            - _mm(ga_im, pi)
            + _mm(pr, gb_re)
            - _mm(pi, gb_im)
        )
        acc_i = (
            dr * pi
            + d_im * pr
            + _mm(ga_im, pr)
            + _mm(ga_re, pi)
            + _mm(pi, gb_re)
            + _mm(pr, gb_im)
        )
        # k = -i A ψ
        return acc_i, -acc_r

    def apply_local(lmat, pr, pi, fr, fi, q):
        """(L^{(q)} ψ) from ψ and its bit-q flip, elementwise."""
        l00r, l00i, l01r, l01i, l10r, l10i, l11r, l11i = lmat
        b = row_bits[q] if q < n_row else col_bits[q - n_row]
        keep_re = l00r * (1.0 - b) + l11r * b
        keep_im = l00i * (1.0 - b) + l11i * b
        cross_re = l01r * (1.0 - b) + l10r * b
        cross_im = l01i * (1.0 - b) + l10i * b
        cr = (
            keep_re * pr
            - keep_im * pi
            + cross_re * fr
            - cross_im * fi
        )
        ci = (
            keep_re * pi
            + keep_im * pr
            + cross_re * fi
            + cross_im * fr
        )
        return cr, ci

    def do_jump(args):
        pr, pi, r, u_sel, u_next = args
        # Bit-q flips of ψ, via permutation matmuls (shared over k)
        flips = []
        for q in range(n):
            if q < n_row:
                m = (xor_a == (1 << (n_row - 1 - q))).astype(
                    jnp.float32
                )
                flips.append((_mm(m, pr), _mm(m, pi)))
            else:
                m = (
                    xor_b == (1 << (n_col - 1 - (q - n_row)))
                ).astype(jnp.float32)
                flips.append((_mm(pr, m), _mm(pi, m)))
        # Candidate weights, (k outer, q inner) like the XLA path
        weights = []
        for lmat in cops:
            for q in range(n):
                fr, fi = flips[q]
                cr, ci = apply_local(lmat, pr, pi, fr, fi, q)
                weights.append(jnp.sum(cr * cr + ci * ci))
        total = weights[0]
        for w in weights[1:]:
            total = total + w
        u = u_sel * total
        # Masked accumulation of the selected candidate
        sel_r = jnp.zeros_like(pr)
        sel_i = jnp.zeros_like(pi)
        w_sel = jnp.float32(0.0)
        cum = jnp.float32(0.0)
        idx = 0
        for lmat in cops:
            for q in range(n):
                fr, fi = flips[q]
                cr, ci = apply_local(lmat, pr, pi, fr, fi, q)
                prev = cum
                cum = cum + weights[idx]
                hit = jnp.logical_and(u > prev, u <= cum)
                # The final candidate also absorbs u == 0 edge cases
                if idx == len(weights) - 1:
                    hit = jnp.logical_or(hit, u <= 0.0)
                hitf = hit.astype(jnp.float32)
                sel_r = sel_r + hitf * cr
                sel_i = sel_i + hitf * ci
                w_sel = w_sel + hitf * weights[idx]
                idx += 1
        inv = jax.lax.rsqrt(jnp.maximum(w_sel, 1e-30))
        return sel_r * inv, sel_i * inv, u_next

    def step_body(i, carry):
        pr, pi, r = carry
        h = dt_ref[0, i, 0]

        # Single traced RK4 stage body (see ``_rk_stage_coeffs``)
        def stage_fn(j, op):
            k_r, k_i, acc_r, acc_i = op
            sidx, a_w, b_w = _rk_stage_coeffs(j)
            xr = pr + (h * a_w) * k_r
            xi = pi + (h * a_w) * k_i
            k_r, k_i = eff_matvec(xr, xi, i * 3 + sidx)
            return (
                k_r,
                k_i,
                acc_r + b_w * k_r,
                acc_i + b_w * k_i,
            )

        zeros = jnp.zeros_like(pr)
        _, _, acc_r, acc_i = jax.lax.fori_loop(
            0, 4, stage_fn, (zeros, zeros, zeros, zeros)
        )
        pr = pr + h * acc_r
        pi = pi + h * acc_i

        norm2 = jnp.sum(pr * pr + pi * pi)
        pr, pi, r = jax.lax.cond(
            norm2 <= r,
            do_jump,
            lambda args: args[:3],
            (pr, pi, r, us_ref[0, i, 0], us_ref[0, i, 1]),
        )
        return pr, pi, r

    pr, pi, r = jax.lax.fori_loop(
        0, seg_len, step_body, (psi_re[:], psi_im[:], r_box[0, 0])
    )
    psi_re[:] = pr
    psi_im[:] = pi
    r_box[0, 0] = r

    # Emit the normalized state (QuTiP mcsolve convention)
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(pr * pr + pi * pi), 1e-30)
    )
    out_ref[0, 0] = pr * inv
    out_ref[0, 1] = pi * inv


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_row",
        "n_col",
        "seg_len",
        "segs_per_traj",
        "cops",
        "g_diag",
        "g_lo",
        "interpret",
    ),
)
def _mcwf_jit(
    a_re,
    a_im,
    det,
    seg_dts,
    us,
    r0,
    diag2d,
    psi0_re,
    psi0_im,
    *,
    n_row: int,
    n_col: int,
    seg_len: int,
    segs_per_traj: int,
    cops: tuple,
    g_diag: tuple,
    g_lo: tuple,
    interpret: bool = False,
) -> jax.Array:
    """Runs the fused MCWF kernel over a flattened (traj, seg) grid.

    Args:
        a_re/a_im: ``(n_seg, L, 3, n)`` drive stages (0.5·Ω·e^{-iφ}).
        det: ``(n_seg, L, 3, n)`` detuning stages.
        seg_dts: ``(n_seg, L, 1)`` step sizes (0 = padding).
        us: ``(n_seg, L, 2)`` per-step uniforms (selector, next r).
        r0: ``(n_traj, 1)`` initial jump thresholds (SMEM).
        diag2d: ``(n_traj, R, C)`` interaction diagonals.
        psi0_re/psi0_im: ``(R, C)`` shared initial state.
        cops/g_diag/g_lo: Static collapse algebra (see kernel).

    Returns:
        ``(n_seg, 2, R, C)`` normalized states after each segment.
    """
    n_seg = a_re.shape[0]
    n = n_row + n_col
    rows, cols = 1 << n_row, 1 << n_col
    spt = segs_per_traj

    # Long segments stream in fixed-size chunks so the coefficient
    # windows fit the scoped VMEM budget; the trailing chunk pads
    # with zero-length steps (no-ops for both dynamics and jumps)
    chunk = min(seg_len, 512)
    n_chunks = -(-seg_len // chunk)
    pad = n_chunks * chunk - seg_len

    def chunked(arr, fill=0.0):
        if pad:
            widths = [(0, 0)] * arr.ndim
            widths[1] = (0, pad)
            arr = jnp.pad(arr, widths, constant_values=fill)
        return jnp.reshape(
            arr,
            (n_seg * n_chunks, chunk) + tuple(arr.shape[2:]),
        )

    kernel = functools.partial(
        _mcwf_kernel,
        n_row=n_row,
        n_col=n_col,
        seg_len=chunk,
        blocks_per_traj=spt * n_chunks,
        cops=cops,
        g_diag=g_diag,
        g_lo=g_lo,
    )
    scratch = [
        pltpu.VMEM((rows, cols), jnp.float32),
        pltpu.VMEM((rows, cols), jnp.float32),
        pltpu.SMEM((1, 1), jnp.float32),
    ]
    tpb = spt * n_chunks
    # Merged (step, stage-sample) sublane axis — see _ip_sesolve_jit
    c3 = chunk * 3
    n_blk = n_seg * n_chunks

    def staged(arr):
        return jnp.reshape(chunked(arr), (n_blk, c3, n))

    return pl.pallas_call(
        kernel,
        grid=(n_seg * n_chunks,),
        in_specs=[
            pl.BlockSpec((1, c3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, c3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, c3, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, chunk, 1), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, chunk, 2), lambda s: (s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, cols), lambda s: (s // tpb, 0, 0)),
            pl.BlockSpec((rows, cols), lambda s: (0, 0)),
            pl.BlockSpec((rows, cols), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, cols), lambda s: (s // n_chunks, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_seg, 2, rows, cols), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        staged(a_re),
        staged(a_im),
        staged(det),
        chunked(seg_dts),
        chunked(us, fill=0.5),
        r0,
        diag2d,
        psi0_re,
        psi0_im,
    )


def mcwf_pallas(
    *args,
    n_row: int,
    n_col: int,
    seg_len: int,
    segs_per_traj: int,
    cops: tuple,
    g_diag: tuple,
    g_lo: tuple,
    interpret: bool = False,
):
    """AOT-cached entry point for :func:`_mcwf_jit`.

    Same signature/semantics; routes through the ahead-of-time
    executable cache (see :mod:`pulser_tpu.aot_cache`).
    """
    from pulser_tpu import aot_cache

    return aot_cache.call(
        _mcwf_jit,
        "mcwf",
        args,
        dict(
            n_row=n_row,
            n_col=n_col,
            seg_len=seg_len,
            segs_per_traj=segs_per_traj,
            cops=cops,
            g_diag=g_diag,
            g_lo=g_lo,
            interpret=interpret,
        ),
    )


def _mcwf_rows_kernel(
    a_re_ref,
    a_im_ref,
    cum_ref,
    t_ref,
    dt_ref,
    us_ref,
    eval_t_ref,
    eval_cum_ref,
    r0_ref,
    diag_ref,
    psi0_re_ref,
    psi0_im_ref,
    out_ref,
    psi_re,
    psi_im,
    r_box,
    *,
    n_row: int,
    n_col: int,
    seg_len: int,
    cops: tuple,
):
    """Row-batched interaction-picture MCWF kernel.

    The whole trajectory batch advances through ONE sequential grid
    (one step per evaluation-segment chunk) with the state resident in
    VMEM as ``(R, T, C)`` real-pair planes: ``R = 2^n_row`` on the
    outer axis, trajectories ``T`` on the sublane axis and ``C =
    2^n_col`` qubit-columns on the lane axis. Per-trajectory drive
    coefficients broadcast along sublanes, so trajectory parallelism
    is free VPU width — unlike :func:`_mcwf_kernel`, whose grid runs
    trajectories sequentially and therefore loses to the XLA vmap.

    Qubit flips along the lane axis apply as one shared
    ``(C, C)``-permutation matmul per column qubit (MXU); flips along
    the outer axis are static slice swaps (pure data movement).

    Restricted to DIAGONAL collapse operators (``cops`` holds
    ``(l00r, l00i, l11r, l11i)`` per op): a diagonal jump operator
    commutes with the diagonal interaction-picture rotor exactly, so
    jump detection, channel selection (the XLA path's
    ``searchsorted`` order, (k outer, q inner)) and the jump itself
    run in the rotated frame with no lab-frame round trip, fully
    elementwise with per-trajectory masks.
    """
    rows, cols = 1 << n_row, 1 << n_col
    n = n_row + n_col
    t_cnt = diag_ref.shape[1]
    # grid = (trajectory blocks, segment chunks); the state scratch
    # persists along the (inner, fastest) segment axis and resets at
    # each trajectory block's first chunk
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        # psi0 arrives as a single (R, 1, C) plane (it is shared by
        # every trajectory — shipping it per-sublane would cost tb×
        # the VMEM) and broadcasts onto the trajectory axis here.
        psi_re[:] = jnp.broadcast_to(
            psi0_re_ref[:], (rows, t_cnt, cols)
        )
        psi_im[:] = jnp.broadcast_to(
            psi0_im_ref[:], (rows, t_cnt, cols)
        )
        r_box[:] = r0_ref[:]

    # Per-qubit occupancy masks: (R, 1, 1) for outer-axis qubits,
    # (1, 1, C) for lane-axis qubits
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cols), 2)
    bits = [
        ((r_iota >> (n_row - 1 - q)) & 1).astype(jnp.float32)
        for q in range(n_row)
    ] + [
        ((c_iota >> (n_col - 1 - q)) & 1).astype(jnp.float32)
        for q in range(n_col)
    ]
    cxor = jax.lax.broadcasted_iota(
        jnp.int32, (cols, cols), 0
    ) ^ jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 1)

    # Imaginary diagonal of H_eff from G = Σ L†L (diagonal cops):
    # g(i) = g00·(n − pop(i)) + g11·pop(i)
    pop = jnp.zeros((rows, 1, cols), jnp.float32)
    for b in bits:
        pop = pop + b
    g00 = sum(l[0] * l[0] + l[1] * l[1] for l in cops)
    g11 = sum(l[2] * l[2] + l[3] * l[3] for l in cops)
    g_d = g00 * (float(n) - pop) + g11 * pop
    diag = diag_ref[:]

    def traj_col(row_t, q):
        """(T,) slice of a transposed (T, n) row as (1, T, 1).

        Stage rows live in VMEM as ``(n, T)`` (trajectories on
        lanes — see :func:`_mcwf_rows_jit`); callers transpose each
        row ONCE on load so every per-qubit slice lands on the
        sublane axis of the ``(R, T, C)`` state with no relayout.
        """
        return row_t[:, q : q + 1].reshape(1, t_cnt, 1)

    def phase(t_s, cum_row):
        # Φ = (diag·t mod 2π) + Σ_q cum_q·(1 − bit_q); the detuning
        # projector occupies eigenindex 0 in the r-first convention
        ph = jnp.mod(diag * t_s, _TWO_PI)
        for q in range(n):
            cq = traj_col(cum_row, q)
            ph = ph + cq * (1.0 - bits[q])
        return ph

    def flip(xr, xi, q):
        """The bit-q flip partner of ψ along its qubit axis."""
        if q < n_row:
            blk = 1 << (n_row - 1 - q)
            parts_r, parts_i = [], []
            for start in range(0, rows, 2 * blk):
                parts_r.append(xr[start + blk : start + 2 * blk])
                parts_r.append(xr[start : start + blk])
                parts_i.append(xi[start + blk : start + 2 * blk])
                parts_i.append(xi[start : start + blk])
            if len(parts_r) == 1:
                return parts_r[0], parts_i[0]
            return (
                jnp.concatenate(parts_r, axis=0),
                jnp.concatenate(parts_i, axis=0),
            )
        bit = 1 << (n_col - 1 - (q - n_row))
        perm = (cxor == bit).astype(jnp.float32)
        shape = xr.shape
        fr = _mm(xr.reshape(rows * t_cnt, cols), perm).reshape(shape)
        fi = _mm(xi.reshape(rows * t_cnt, cols), perm).reshape(shape)
        return fr, fi

    def step_body(i, carry):
        pr, pi, r = carry
        h = dt_ref[0, i, 0]

        # Single traced RK4 stage body (see ``_rk_stage_coeffs``)
        def stage_fn(j, op):
            k_r, k_i, acc_r, acc_i = op
            sidx, a_w, b_w = _rk_stage_coeffs(j)
            i3 = i * 3 + sidx
            xr = pr + (h * a_w) * k_r
            xi = pi + (h * a_w) * k_i
            ph = phase(t_ref[0, i3, 0], cum_ref[0, i3].T)
            c = jnp.cos(ph)
            sn = jnp.sin(ph)
            # w = e^{-iΦ} x
            wr = c * xr + sn * xi
            wi = c * xi - sn * xr
            a_row_re = a_re_ref[0, i3].T
            a_row_im = a_im_ref[0, i3].T
            yr = jnp.zeros_like(pr)
            yi = jnp.zeros_like(pi)
            for q in range(n):
                ar = traj_col(a_row_re, q)
                ai = traj_col(a_row_im, q)
                fr, fi = flip(wr, wi, q)
                sign = 2.0 * bits[q] - 1.0
                yr = yr + ar * fr - (ai * sign) * fi
                yi = yi + ar * fi + (ai * sign) * fr
            # k = -i e^{+iΦ} y − ½ g ⊙ x
            k_r = c * yi + sn * yr - 0.5 * g_d * xr
            k_i = sn * yi - c * yr - 0.5 * g_d * xi
            return (
                k_r,
                k_i,
                acc_r + b_w * k_r,
                acc_i + b_w * k_i,
            )

        zeros = jnp.zeros_like(pr)
        _, _, acc_r, acc_i = jax.lax.fori_loop(
            0, 4, stage_fn, (zeros, zeros, zeros, zeros)
        )
        pr = pr + h * acc_r
        pi = pi + h * acc_i

        # Quantum jumps, per trajectory row (diagonal cops: all
        # elementwise). Candidate order (k outer, q inner) and the
        # searchsorted-left selection replicate the XLA path exactly.
        norm2 = jnp.sum(pr * pr + pi * pi, axis=(0, 2), keepdims=True)
        u_row = us_ref[0, i].T  # (2, T) -> (T, 2)
        u0 = u_row[:, 0:1].reshape(1, t_cnt, 1)
        u_next = u_row[:, 1:2].reshape(1, t_cnt, 1)
        p2 = pr * pr + pi * pi
        weights = []
        for l00r, l00i, l11r, l11i in cops:
            m00 = l00r * l00r + l00i * l00i
            m11 = l11r * l11r + l11i * l11i
            for q in range(n):
                mag2 = m00 * (1.0 - bits[q]) + m11 * bits[q]
                weights.append(
                    jnp.sum(
                        mag2 * p2, axis=(0, 2), keepdims=True
                    )
                )
        total = weights[0]
        for w in weights[1:]:
            total = total + w
        u = u0 * total
        sel_r = jnp.zeros_like(pr)
        sel_i = jnp.zeros_like(pi)
        w_sel = jnp.zeros_like(total)
        cum = jnp.zeros_like(total)
        idx = 0
        for l00r, l00i, l11r, l11i in cops:
            for q in range(n):
                prev = cum
                cum = cum + weights[idx]
                hit = u <= cum
                if idx > 0:
                    hit = jnp.logical_and(hit, u > prev)
                hitf = hit.astype(jnp.float32)
                c_re = l00r * (1.0 - bits[q]) + l11r * bits[q]
                c_im = l00i * (1.0 - bits[q]) + l11i * bits[q]
                sel_r = sel_r + hitf * (c_re * pr - c_im * pi)
                sel_i = sel_i + hitf * (c_re * pi + c_im * pr)
                w_sel = w_sel + hitf * weights[idx]
                idx += 1
        inv = jax.lax.rsqrt(jnp.maximum(w_sel, 1e-30))
        jm = (norm2 <= r).astype(jnp.float32)
        pr = (1.0 - jm) * pr + jm * sel_r * inv
        pi = (1.0 - jm) * pi + jm * sel_i * inv
        r = (1.0 - jm) * r + jm * u_next
        return pr, pi, r

    pr, pi, r = jax.lax.fori_loop(
        0, seg_len, step_body, (psi_re[:], psi_im[:], r_box[:])
    )
    psi_re[:] = pr
    psi_im[:] = pi
    r_box[:] = r

    # Emit normalized (QuTiP mcsolve convention), rotated to the lab
    # frame: ψ = e^{-iΦ(t_eval)} φ. Mid-segment chunks also write
    # this block; the final chunk's write wins.
    inv_n = jax.lax.rsqrt(
        jnp.maximum(
            jnp.sum(pr * pr + pi * pi, axis=(0, 2), keepdims=True),
            1e-30,
        )
    )
    pr_n = pr * inv_n
    pi_n = pi * inv_n
    ph = phase(eval_t_ref[0, 0, 0], eval_cum_ref[0, 0].T)
    c = jnp.cos(ph)
    sn = jnp.sin(ph)
    out_ref[0, 0] = c * pr_n + sn * pi_n
    out_ref[0, 1] = c * pi_n - sn * pr_n


#: Scoped-VMEM budget for the row-batched MCWF kernel (the Mosaic
#: scoped limit is 16 MiB; leave headroom for compiler temporaries).
ROWS_VMEM_BUDGET = 15 * 1024 * 1024


def rows_block_ladder(
    n: int, n_traj: int
) -> "list[tuple[int, int]]":
    """Ordered (chunk, tb) candidates for the row-batched kernel.

    ``chunk`` is the step-chunk length (drive blocks scale with it);
    ``tb`` the trajectory-block width: the state/output/constant
    blocks carry it on the sublane axis, the drive/uniform blocks on
    the lane axis (padded to 128 lanes).

    Mosaic's scoped-VMEM demand for this kernel defies a closed-form
    model (measured on v5e it is non-monotone in ``tb`` and nearly
    independent of ``chunk``), so the ladder is anchored on
    measurement instead: ``rows * tb <= 832`` covers every config
    observed to fit the 16 MiB scoped limit (n=10: 8x104 at
    chunk 64; n=11: 16x32; n=12: 32x16 at chunk<=32) and excludes
    every observed OOM (16x64 at 23.6M, 32x32 at 22.8M). The
    dispatcher tries candidates in order and drops to the next on a
    scoped-VMEM compile error (`_mcsolve_pallas_rows`), so a miss
    costs one failed compile, not a wrong answer. Empty list =>
    fall back to the HBM-resident XLA vmap.

    ``PULSER_TPU_MCWF_ROWS_TB`` / ``_CHUNK`` pin a single candidate
    (tests); both flow into jit statics, so overrides are
    cache-safe.
    """
    import os

    n_col = min(7, n - 1)
    rows_ = 1 << (n - n_col)
    t8 = -(-n_traj // 8) * 8
    f_tb = os.environ.get("PULSER_TPU_MCWF_ROWS_TB")
    f_ck = os.environ.get("PULSER_TPU_MCWF_ROWS_CHUNK")
    if f_tb or f_ck:
        tb = min(t8, -(-int(f_tb or t8) // 8) * 8)
        return [(int(f_ck or 64), tb)]
    out = []
    for tb in (t8, 104, 64, 32, 16, 8):
        if tb > t8 or (out and tb >= out[-1][1]):
            continue
        if rows_ * tb > 832:
            continue
        # chunk 64 measured safe up to rows=16; 32x16 needed
        # chunk<=32 (20.3M at chunk 64)
        out.append((64 if rows_ <= 16 else 32, tb))
        if len(out) == 1 and rows_ <= 16:
            # Shrinking the step chunk halves the drive blocks while
            # keeping the FULL trajectory block — sequential
            # trajectory blocks double kernel wall, so prefer a
            # smaller chunk over a smaller tb when the widest config
            # is marginal on scoped VMEM.
            out.append((32, tb))
    if rows_ >= 32 and out:
        out.append((16, 8))
    return out


def rows_block_plan(
    n: int, n_traj: int
) -> "tuple[int, int] | None":
    """First-choice (chunk, tb) for the rows kernel, or None when no
    candidate exists (see :func:`rows_block_ladder`)."""
    lad = rows_block_ladder(n, n_traj)
    return lad[0] if lad else None


def mcwf_rows_program(
    a_re,
    a_im,
    cum_mod,
    t_stage,
    seg_dts,
    us,
    eval_t,
    eval_cum_mod,
    r0,
    diags,
    psi0_re,
    psi0_im,
    *,
    n_row: int,
    n_col: int,
    cops: tuple,
    chunk: int,
    tb: int,
    interpret: bool = False,
) -> jax.Array:
    """Runs the row-batched MCWF kernel.

    Takes the solver's device-resident batch arrays as-is and does
    ALL reshaping inside this one program — every host-issued jnp op
    is a dispatch round trip on a tunneled TPU, and the transposes
    below cost more in round trips than in device time.

    Kernel-side layout: trajectories ride the LANE axis of every
    per-trajectory input (the kernel transposes each ``(n, T)`` stage
    row once on load): with ``n ~ 10`` on lanes the f32 ``(8, 128)``
    tiling would pad the last dim 12.8x and overflow the 16MB
    scoped-VMEM budget.

    Args (B = trajectory count):
        a_re/a_im: ``(B, S, L, 3, 1, n)`` per-trajectory drive stages.
        cum_mod: ``(B, S, L, 3, 1, n)`` pre-negated ``∫det mod 2π``.
        t_stage: ``(S, L, 3)`` absolute stage times (shared).
        seg_dts: ``(S, L)`` step sizes (shared; 0 = padding).
        us: ``(B, S, L, 2)`` per-step uniforms (selector, next r).
        eval_t: ``(S,)`` evaluation times.
        eval_cum_mod: ``(B, S, 1, n)`` eval-time phase integrals.
        r0: ``(B,)`` initial jump thresholds.
        diags: ``(B, dim)`` interaction diagonals.
        psi0_re/psi0_im: ``(dim,)`` shared initial state.

    Returns:
        ``(S, 2, R, T, C)`` normalized lab-frame states per segment,
        with T = B padded up to a multiple of the trajectory block
        ``tb`` (padded trajectories carry ``r0 = 0`` so the jump test
        ``norm2 <= r`` never fires for them).

    The grid is ``(T/tb, S*L/chunk)``: trajectory blocks on the OUTER
    axis (the state scratch persists per block and resets at its
    first segment chunk), so VMEM pressure scales with ``tb``, not
    the full batch — see :func:`rows_block_plan`. Mosaic only blocks
    the LANE axis at multiples of 128, so arrays that carry
    trajectories on lanes (drives, uniforms, eval phases) are
    pre-reshaped to ``(n_tblk * lead, ..., tb)`` — the trajectory
    block rides the leading block-index axis and every block spans
    its full trailing dims.
    """
    n = n_row + n_col
    rows, cols = 1 << n_row, 1 << n_col
    n_seg, L = seg_dts.shape
    n_traj = a_re.shape[0]
    t_cnt = -(-n_traj // tb) * tb
    n_tblk = t_cnt // tb
    t_extra = t_cnt - n_traj

    def to_kernel(arr):  # (B, S, L, 3, 1, n) -> (S, L, 3, n, T)
        arr = jnp.transpose(arr[:, :, :, :, 0, :], (1, 2, 3, 4, 0))
        if t_extra:
            arr = jnp.pad(arr, [(0, 0)] * 4 + [(0, t_extra)])
        return arr

    a_re = to_kernel(a_re)
    a_im = to_kernel(a_im)
    cum_mod = to_kernel(cum_mod)
    eval_cum_mod = jnp.transpose(
        eval_cum_mod[:, :, 0, :], (1, 2, 0)
    )
    us = jnp.transpose(us, (1, 2, 3, 0))
    if t_extra:
        eval_cum_mod = jnp.pad(
            eval_cum_mod, [(0, 0), (0, 0), (0, t_extra)]
        )
        us = jnp.pad(
            us, [(0, 0), (0, 0), (0, 0), (0, t_extra)]
        )
        r0 = jnp.pad(r0, (0, t_extra), constant_values=0.0)
        diags = jnp.pad(diags, [(0, t_extra), (0, 0)])

    chunk = min(L, chunk)
    n_chunks = -(-L // chunk)
    pad = n_chunks * chunk - L

    def chunked(arr, fill=0.0):
        if pad:
            widths = [(0, 0)] * arr.ndim
            widths[1] = (0, pad)
            arr = jnp.pad(arr, widths, constant_values=fill)
        return jnp.reshape(
            arr,
            (n_seg * n_chunks, chunk) + tuple(arr.shape[2:]),
        )

    c3 = chunk * 3

    def staged(arr):  # (S, L, 3, T, n) -> (n_blk, c3, T, n)
        arr = jnp.reshape(arr, (n_seg, L * 3) + tuple(arr.shape[3:]))
        if pad:
            widths = [(0, 0)] * arr.ndim
            widths[1] = (0, 3 * pad)
            arr = jnp.pad(arr, widths)
        return jnp.reshape(
            arr, (n_seg * n_chunks, c3) + tuple(arr.shape[2:])
        )

    n_blk = n_seg * n_chunks

    def tblock(arr):
        """(lead, ..., T) -> (n_tblk * lead, ..., tb).

        Splits the trajectory lane axis into ``n_tblk`` blocks and
        merges the block index into the leading axis, so the 2D-grid
        index map ``t * lead + s`` selects a block whose trailing
        dims all equal the array's — the only lane-legal blocking
        for tb < 128.
        """
        arr = jnp.reshape(arr, arr.shape[:-1] + (n_tblk, tb))
        arr = jnp.moveaxis(arr, -2, 0)
        return jnp.reshape(
            arr, (n_tblk * arr.shape[1],) + arr.shape[2:]
        )

    kernel = functools.partial(
        _mcwf_rows_kernel,
        n_row=n_row,
        n_col=n_col,
        seg_len=chunk,
        cops=cops,
    )
    scratch = [
        pltpu.VMEM((rows, tb, cols), jnp.float32),
        pltpu.VMEM((rows, tb, cols), jnp.float32),
        pltpu.VMEM((1, tb, 1), jnp.float32),
    ]
    diag3 = jnp.transpose(
        jnp.reshape(diags, (t_cnt, rows, cols)), (1, 0, 2)
    )
    psi0_re_b = jnp.reshape(psi0_re, (rows, 1, cols))
    psi0_im_b = jnp.reshape(psi0_im, (rows, 1, cols))
    return pl.pallas_call(
        kernel,
        grid=(n_tblk, n_blk),
        in_specs=[
            pl.BlockSpec(
                (1, c3, n, tb),
                lambda t, s: (t * n_blk + s, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, c3, n, tb),
                lambda t, s: (t * n_blk + s, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, c3, n, tb),
                lambda t, s: (t * n_blk + s, 0, 0, 0),
            ),
            pl.BlockSpec((1, c3, 1), lambda t, s: (s, 0, 0)),
            pl.BlockSpec((1, chunk, 1), lambda t, s: (s, 0, 0)),
            pl.BlockSpec(
                (1, chunk, 2, tb),
                lambda t, s: (t * n_blk + s, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda t, s: (s // n_chunks, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, n, tb),
                lambda t, s: (t * n_seg + s // n_chunks, 0, 0, 0),
            ),
            pl.BlockSpec((1, tb, 1), lambda t, s: (0, t, 0)),
            pl.BlockSpec(
                (rows, tb, cols), lambda t, s: (0, t, 0)
            ),
            pl.BlockSpec(
                (rows, 1, cols), lambda t, s: (0, 0, 0)
            ),
            pl.BlockSpec(
                (rows, 1, cols), lambda t, s: (0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, tb, cols),
            lambda t, s: (s // n_chunks, 0, 0, t, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_seg, 2, rows, t_cnt, cols), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        tblock(staged(a_re)),
        tblock(staged(a_im)),
        tblock(staged(cum_mod)),
        _chunk_t_stage(t_stage, n_seg, L, pad, n_chunks, c3),
        chunked(jnp.reshape(seg_dts, (n_seg, L, 1))),
        tblock(chunked(us, fill=0.5)),
        jnp.reshape(eval_t, (n_seg, 1, 1)),
        tblock(jnp.reshape(eval_cum_mod, (n_seg, 1, n, t_cnt))),
        jnp.reshape(r0, (1, t_cnt, 1)),
        diag3,
        psi0_re_b,
        psi0_im_b,
    )


def _chunk_t_stage(t_stage, n_seg, L, pad, n_chunks, c3):
    """(S, L, 3) stage times -> (S*n_chunks, c3, 1) chunked blocks."""
    arr = jnp.reshape(t_stage, (n_seg, L * 3))
    if pad:
        arr = jnp.pad(arr, ((0, 0), (0, 3 * pad)))
    return jnp.reshape(arr, (n_seg * n_chunks, c3, 1))


_mcwf_rows_jit = jax.jit(
    mcwf_rows_program,
    static_argnames=(
        "n_row",
        "n_col",
        "cops",
        "chunk",
        "tb",
        "interpret",
    ),
)


def mcwf_rows_pallas(*args, **statics) -> jax.Array:
    """AOT-cached entry point for :func:`mcwf_rows_program`.

    The hot noisy-emulation path instead embeds the program inside
    the solver's fused staging jit (``solver._mcwf_rows_full``); this
    standalone entry serves pre-staged inputs (tests, host-staged
    plans).
    """
    from pulser_tpu import aot_cache

    return aot_cache.call(
        _mcwf_rows_jit, "mcwf_rows", args, statics
    )
