"""AbstractArray and math-dispatch behavior tests.

Coverage modeled on the reference's ``tests/test_math.py`` and
``tests/math/test_multinomial.py``, with the torch leg replaced by
JAX (the dual backend here is numpy/JAX; reference
``pulser-core/pulser/math/abstract_array.py:33-337``).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pulser_tpu.math as pm
from pulser_tpu.json.coders import PulserDecoder, PulserEncoder
from pulser_tpu.math.multinomial import multinomial, multinomial_jax

AA = pm.AbstractArray


class TestBackendPromotion:
    def test_numpy_stays_numpy(self):
        a = AA(np.arange(4.0))
        assert not a.is_tensor
        assert isinstance(a.as_array(), np.ndarray)

    def test_jax_marks_tensor(self):
        a = AA(jnp.arange(4.0))
        assert a.is_tensor

    def test_binary_op_promotes_to_jax(self):
        a = AA(np.arange(4.0))
        b = AA(jnp.arange(4.0))
        assert (a + b).is_tensor
        assert (b * a).is_tensor
        assert not (a + a).is_tensor

    def test_tracer_conversion_to_numpy(self):
        """detach=True reads the JVP primal (torch-detach analogue)
        under jax.grad; abstract jit tracers still refuse."""

        def f(x):
            a = AA(x)
            with pytest.raises(RuntimeError, match="requires grad"):
                a.as_array()
            # grad tracers carry a concrete primal -> detachable
            assert a.as_array(detach=True) == pytest.approx(1.0)
            return jnp.sum(a.as_tensor())

        assert float(jax.grad(f)(1.0)) == pytest.approx(1.0)

        def g(x):
            a = AA(x)
            with pytest.raises(RuntimeError, match="abstract JAX"):
                a.as_array(detach=True)
            return jnp.sum(a.as_tensor())

        jax.jit(g)(1.0)


class TestOperators:
    a = AA(np.array([1.0, 2.0, 3.0]))

    def test_arithmetic(self):
        np.testing.assert_allclose(
            (self.a + 1).as_array(), [2, 3, 4]
        )
        np.testing.assert_allclose(
            (1 - self.a).as_array(), [0, -1, -2]
        )
        np.testing.assert_allclose(
            (self.a * 2).as_array(), [2, 4, 6]
        )
        np.testing.assert_allclose(
            (self.a / 2).as_array(), [0.5, 1.0, 1.5]
        )
        np.testing.assert_allclose(
            (self.a**2).as_array(), [1, 4, 9]
        )
        np.testing.assert_allclose(
            (self.a % 2).as_array(), [1, 0, 1]
        )
        np.testing.assert_allclose((-self.a).as_array(), [-1, -2, -3])
        np.testing.assert_allclose(
            abs(AA(np.array([-1.0, 2.0]))).as_array(), [1, 2]
        )

    def test_matmul(self):
        m = AA(np.eye(3) * 2)
        np.testing.assert_allclose(
            (m @ self.a).as_array(), [2, 4, 6]
        )

    def test_comparisons_elementwise(self):
        mask = (self.a > 1.5).as_array()
        np.testing.assert_array_equal(mask, [False, True, True])
        np.testing.assert_array_equal(
            (self.a == 2).as_array(), [False, True, False]
        )

    def test_round_and_casts(self):
        assert float(AA(np.array(2.7))) == 2.7
        assert int(AA(np.array(2.0))) == 2
        np.testing.assert_allclose(
            round(AA(np.array([1.234, 5.678])), 1).as_array(),
            [1.2, 5.7],
        )

    def test_getitem_setitem(self):
        a = AA(np.arange(5.0))
        assert float(a[2]) == 2.0
        np.testing.assert_allclose(a[1:3].as_array(), [1, 2])
        a[0] = 10.0
        assert float(a[0]) == 10.0
        # setitem on the JAX backend is functional under the hood
        b = AA(jnp.arange(5.0))
        b[0] = 10.0
        assert float(b[0].as_array(detach=True)) == 10.0

    def test_numpy_ufunc_interception(self):
        out = np.exp(AA(np.array([0.0, 1.0])))
        assert isinstance(out, AA)
        np.testing.assert_allclose(
            out.as_array(), [1.0, np.e]
        )

    def test_len_iter_hash(self):
        a = AA(np.array([1.0, 2.0]))
        assert len(a) == 2
        assert [float(x) for x in a] == [1.0, 2.0]


@pytest.mark.parametrize(
    "fn, x, expected",
    [
        (pm.exp, [0.0, 1.0], np.exp([0.0, 1.0])),
        (pm.sqrt, [4.0, 9.0], [2.0, 3.0]),
        (pm.sin, [0.0, np.pi / 2], [0.0, 1.0]),
        (pm.cos, [0.0, np.pi], [1.0, -1.0]),
        (pm.tan, [0.0], [0.0]),
        (pm.tanh, [0.0], [0.0]),
        (pm.ceil, [1.2], [2.0]),
        (pm.floor, [1.8], [1.0]),
        (pm.log, [np.e], [1.0]),
        (pm.log2, [8.0], [3.0]),
    ],
)
def test_dispatch_parity_numpy_vs_jax(fn, x, expected):
    np.testing.assert_allclose(
        fn(np.asarray(x)).as_array(), expected, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(fn(jnp.asarray(x)).as_tensor()),
        expected,
        atol=1e-6,
    )


def test_reductions_and_shaping():
    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    assert float(pm.sum(AA(x))) == 10.0
    assert float(pm.mean(AA(x))) == 2.5
    np.testing.assert_allclose(
        pm.cumsum(AA(np.array([1.0, 2.0, 3.0]))).as_array(),
        [1, 3, 6],
    )
    np.testing.assert_allclose(
        pm.diff(AA(np.array([1.0, 4.0, 9.0]))).as_array(), [3, 5]
    )
    np.testing.assert_allclose(
        pm.clip(AA(np.array([-1.0, 0.5, 2.0])), 0, 1).as_array(),
        [0, 0.5, 1],
    )
    np.testing.assert_allclose(
        pm.flatten(AA(x)).as_array(), [1, 2, 3, 4]
    )
    assert AA(x).reshape((4,)).shape == (4,)
    assert float(pm.norm(AA(np.array([3.0, 4.0])))) == 5.0


def test_concatenate_stack():
    a, b = AA(np.array([1.0])), AA(np.array([2.0]))
    np.testing.assert_allclose(
        pm.concatenate([a, b]).as_array(), [1, 2]
    )
    np.testing.assert_allclose(
        pm.vstack([a, b]).as_array(), [[1], [2]]
    )
    np.testing.assert_allclose(
        pm.hstack([a, b]).as_array(), [1, 2]
    )


def test_pdist_and_dot():
    pts = AA(np.array([[0.0, 0.0], [3.0, 4.0]]))
    np.testing.assert_allclose(pm.pdist(pts).as_array(), [5.0])
    assert float(pm.dot(AA(np.array([1.0, 2.0])), AA(np.array([3.0, 4.0])))) == 11.0


def test_fft_roundtrip():
    x = np.random.RandomState(0).random(64)
    back = pm.ifft(pm.fft(AA(x)))
    np.testing.assert_allclose(
        np.real(back.as_array()), x, atol=1e-12
    )
    freqs = pm.fftfreq(64).as_array()
    np.testing.assert_allclose(freqs, np.fft.fftfreq(64))


def test_abstract_array_serialization():
    a = AA(np.array([1.0, 2.5]))
    s = json.dumps(a, cls=PulserEncoder)
    back = json.loads(s, cls=PulserDecoder)
    np.testing.assert_allclose(np.asarray(back), [1.0, 2.5])


def test_grad_flows_through_ops():
    def f(x):
        a = AA(x)
        return float_like(pm.sum(pm.sin(a) * a))

    def float_like(v):
        return v.as_tensor()

    g = jax.grad(lambda x: f(x).sum())(jnp.array([0.5]))
    expected = np.cos(0.5) * 0.5 + np.sin(0.5)
    np.testing.assert_allclose(np.asarray(g), [expected], rtol=1e-6)


class TestMultinomial:
    def test_seeded_host_draws(self):
        """Uses the global numpy RNG, like the reference."""
        p = np.array([0.25, 0.25, 0.5])
        np.random.seed(99)
        idx1 = multinomial(1000, p)
        np.random.seed(99)
        idx2 = multinomial(1000, p)
        np.testing.assert_array_equal(idx1, idx2)
        assert idx1.min() >= 0 and idx1.max() <= 2
        # Distribution roughly matches
        frac2 = np.mean(idx1 == 2)
        assert abs(frac2 - 0.5) < 0.06

    def test_degenerate_distribution(self):
        np.random.seed(1)
        idx = multinomial(50, np.array([0.0, 1.0, 0.0]))
        assert np.all(idx == 1)

    def test_jax_variant_matches_statistics(self):
        p = jnp.array([0.1, 0.9])
        idx = multinomial_jax(jax.random.PRNGKey(0), 2000, p)
        frac = float(jnp.mean(idx == 1))
        assert abs(frac - 0.9) < 0.03
