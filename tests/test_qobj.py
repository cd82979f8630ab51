"""Qobj shim unit tests.

The minimal dense Qobj (``pulser_tpu/emulator/qobj.py``) carries the
reference's qutip.Qobj semantics through the emulator results stack;
these tests pin its algebra and kind detection.
"""

from __future__ import annotations

import numpy as np

from pulser_tpu.emulator.qobj import Qobj, basis, qeye, tensor


def test_kind_detection():
    ket = basis(2, 0)
    assert ket.isket and not ket.isbra and not ket.isoper
    bra = ket.dag()
    assert bra.isbra and not bra.isket
    op = qeye(2)
    assert op.isoper and not op.isket


def test_basis_and_tensor():
    ket = tensor([basis(2, 0), basis(2, 1)])
    assert ket.shape == (4, 1)
    full = ket.full()[:, 0]
    np.testing.assert_array_equal(full, [0, 1, 0, 0])
    assert ket.dims == [[2, 2], [1, 1]]


def test_algebra():
    x = Qobj(np.array([[0, 1], [1, 0]], dtype=complex))
    z = Qobj(np.array([[1, 0], [0, -1]], dtype=complex))
    y = (x @ z - z @ x) / 2
    np.testing.assert_allclose(
        y.full(), np.array([[0, -1], [1, 0]], dtype=complex)
    )
    assert (x + x) == 2 * x
    assert (x - x).norm() == 0
    assert (-x) == -1 * x


def test_unit_norm_trace():
    v = Qobj(np.array([[3.0], [4.0]], dtype=complex))
    assert np.isclose(v.norm(), 5.0)
    u = v.unit()
    assert np.isclose(u.norm(), 1.0)
    assert np.isclose(v.norm(), 5.0)  # not in place by default
    v.unit(inplace=True)
    assert np.isclose(v.norm(), 1.0)
    rho = u.proj()
    assert rho.isoper
    assert np.isclose(rho.tr(), 1.0)
    np.testing.assert_allclose(np.sort(rho.diag().real), [0.36, 0.64])


def test_expect_ket_and_dm():
    n_op = Qobj(np.diag([1.0, 0.0]).astype(complex))
    plus = Qobj(np.array([[1.0], [1.0]], dtype=complex)).unit()
    assert np.isclose(n_op.expect(plus), 0.5)
    assert np.isclose(n_op.expect(plus.proj()), 0.5)


def test_overlap():
    a = basis(2, 0)
    b = Qobj(np.array([[1.0], [1.0]], dtype=complex)).unit()
    assert np.isclose(abs(a.overlap(b)), 1 / np.sqrt(2))


def test_tidyup_removes_noise():
    m = Qobj(np.array([[1.0, 1e-15], [0.0, 1.0]], dtype=complex))
    cleaned = m.tidyup(atol=1e-12)
    assert cleaned.full()[0, 1] == 0


def test_numpy_interop():
    op = qeye(3)
    arr = np.asarray(op)
    np.testing.assert_array_equal(arr, np.eye(3))
