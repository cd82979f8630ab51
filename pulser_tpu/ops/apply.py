"""TPU-native application of structured neutral-atom Hamiltonians.

The reference builds a sparse ``qutip.QobjEvo`` and lets scipy's ODE
solver do sparse matvecs (``pulser-simulation/pulser_simulation/
hamiltonian.py:246-439``).  Here the same Hamiltonian is exploited
structurally instead:

- every drive/detuning term is **1-local** → per-qudit ``d×d``
  time-dependent matrices applied as axis-wise contractions;
- the Ising interaction is **diagonal** in the computational basis → one
  precomputed length-``d^N`` diagonal vector;
- the XY flip-flop term is rank-structured → a stack of "lowered"
  vectors contracted with the ``(N, N)`` coupling matrix on the MXU.

All functions are jit-compatible and shape-static; states live in HBM
as flat ``(d^N,)`` complex vectors (or ``(d^N, d^N)`` density
matrices).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def apply_axis(
    op: jax.Array, psi: jax.Array, axis: int, d: int, n: int
) -> jax.Array:
    """Applies a ``d×d`` operator to one qudit axis of a state vector.

    Args:
        op: The ``(d, d)`` operator.
        psi: The flat ``(d**n,)`` state vector.
        axis: The qudit axis (0-indexed, row-major ordering, qudit 0 is
            the most significant axis, matching the tensor-product order
            of the reference's ``qutip.tensor``).
        d: The qudit dimension.
        n: The number of qudits.

    Returns:
        The flat state vector after application.
    """
    left = d**axis
    right = d ** (n - axis - 1)
    resh = psi.reshape(left, d, right)
    out = jnp.einsum(
        "ab,ibj->iaj", op, resh, preferred_element_type=resh.dtype
    )
    return out.reshape(-1)


def sum_axis_ops(
    mats: jax.Array, psi: jax.Array, d: int, n: int
) -> jax.Array:
    """Computes ``Σ_q (M_q at axis q) @ psi`` for per-qudit matrices.

    Args:
        mats: ``(n, d, d)`` stack of per-qudit operators.
        psi: The flat ``(d**n,)`` state vector.
        d: The qudit dimension.
        n: The number of qudits.
    """
    out = jnp.zeros_like(psi)
    for q in range(n):
        out = out + apply_axis(mats[q], psi, q, d, n)
    return out


def apply_flip_flop(
    u_mat: jax.Array,
    psi: jax.Array,
    d: int,
    n: int,
    up_idx: int,
    down_idx: int,
) -> jax.Array:
    """Applies the XY flip-flop term ``Σ_{i≠j} U_ij σ_ud^i σ_du^j``.

    Strategy: lower every qudit once (``low[j] = σ_du^j ψ``), mix the
    stacked vectors with the coupling matrix on the MXU
    (``mixed = U @ low``), then raise each qudit and accumulate.

    Args:
        u_mat: ``(n, n)`` symmetric coupling matrix with zero diagonal.
        psi: The flat ``(d**n,)`` state vector.
        d: The qudit dimension.
        n: The number of qudits.
        up_idx: Index of the "up" eigenstate in the qudit basis.
        down_idx: Index of the "down" eigenstate.
    """
    sigma_du = (
        jnp.zeros((d, d), dtype=psi.dtype).at[down_idx, up_idx].set(1.0)
    )
    sigma_ud = (
        jnp.zeros((d, d), dtype=psi.dtype).at[up_idx, down_idx].set(1.0)
    )
    low = jnp.stack(
        [apply_axis(sigma_du, psi, q, d, n) for q in range(n)]
    )  # (n, d**n)
    mixed = jnp.einsum(
        "ij,jD->iD",
        u_mat.astype(psi.dtype),
        low,
        preferred_element_type=psi.dtype,
    )
    out = jnp.zeros_like(psi)
    for q in range(n):
        out = out + apply_axis(sigma_ud, mixed[q], q, d, n)
    return out


def build_drive_matrices(
    amp_c: jax.Array,
    det_c: jax.Array,
    pairs: Sequence[tuple[int, int, int]],
    d: int,
    n: int,
) -> jax.Array:
    """Builds the per-qudit ``d×d`` drive matrices at a single time.

    The Hamiltonian term per basis ``b`` and qudit ``q`` is
    ``a σ_ij + a* σ_ji − δ σ_kk`` with ``a = 0.5 Ω e^{-iφ}`` (this
    already includes the reference's ``H + H†`` doubling,
    ``hamiltonian.py:436-439``).

    Args:
        amp_c: ``(n_bases, n)`` complex drive coefficients at one time.
        det_c: ``(n_bases, n)`` real detuning coefficients at one time.
        pairs: Per basis, the static ``(i, j, k)`` index triple: the
            drive couples ``|i><j|`` and the detuning acts on ``|k><k|``.
        d: The qudit dimension.
        n: The number of qudits.

    Returns:
        ``(n, d, d)`` complex stack of per-qudit matrices.
    """
    mats = jnp.zeros((n, d, d), dtype=amp_c.dtype)
    for b, (i, j, k) in enumerate(pairs):
        a = amp_c[b]
        dv = det_c[b].astype(amp_c.dtype)
        mats = mats.at[:, i, j].add(a)
        mats = mats.at[:, j, i].add(jnp.conj(a))
        mats = mats.at[:, k, k].add(-dv)
    return mats


@functools.partial(
    jax.jit,
    static_argnames=("pairs", "d", "n", "xy_indices"),
)
def hamiltonian_matvec(
    psi: jax.Array,
    diag: jax.Array,
    amp_c: jax.Array,
    det_c: jax.Array,
    pairs: tuple[tuple[int, int, int], ...],
    d: int,
    n: int,
    xy_mat: jax.Array | None = None,
    xy_indices: tuple[int, int] | None = None,
) -> jax.Array:
    """One full ``H(t) @ psi`` (exposed mainly for testing)."""
    return _hpsi(
        psi, diag, amp_c, det_c, pairs, d, n, xy_mat, xy_indices
    )


def _hpsi(
    psi: jax.Array,
    diag: jax.Array,
    amp_c: jax.Array,
    det_c: jax.Array,
    pairs: tuple[tuple[int, int, int], ...],
    d: int,
    n: int,
    xy_mat: jax.Array | None,
    xy_indices: tuple[int, int] | None,
) -> jax.Array:
    """Internal, trace-time H @ psi."""
    out = diag.astype(psi.dtype) * psi
    mats = build_drive_matrices(amp_c, det_c, pairs, d, n)
    out = out + sum_axis_ops(mats, psi, d, n)
    if xy_mat is not None:
        assert xy_indices is not None
        out = out + apply_flip_flop(
            xy_mat, psi, d, n, xy_indices[0], xy_indices[1]
        )
    return out


def apply_row(
    op: jax.Array, rho: jax.Array, q: int, d: int, n: int
) -> jax.Array:
    """``(op at qudit q) @ rho`` — operator on the row multi-index.

    Args:
        op: The ``(d, d)`` operator.
        rho: The ``(d**n, d**n)`` density matrix.
        q: The qudit axis on the row index.
        d: The qudit dimension.
        n: The number of qudits.
    """
    dim = d**n
    left = d**q
    right = d ** (n - q - 1)
    resh = rho.reshape(left, d, right * dim)
    out = jnp.einsum(
        "ab,ibj->iaj", op, resh, preferred_element_type=resh.dtype
    )
    return out.reshape(dim, dim)


def apply_col(
    op: jax.Array, rho: jax.Array, q: int, d: int, n: int
) -> jax.Array:
    """``rho @ (op at qudit q)`` — operator on the column multi-index.

    Contracts ``out[..b..] = Σ_a rho[..a..] op[a, b]``.
    """
    dim = d**n
    left = d**q
    right = d ** (n - q - 1)
    resh = rho.reshape(dim * left, d, right)
    out = jnp.einsum(
        "ab,iaj->ibj", op, resh, preferred_element_type=resh.dtype
    )
    return out.reshape(dim, dim)
