"""Math and array functions dispatching between numpy and JAX.

TPU-native re-design of the reference's numpy/torch dispatch module
(reference ``pulser-core/pulser/math/__init__.py:49-273``): every function
keeps concrete host values in numpy and transparently switches to
``jax.numpy`` whenever a traced/JAX value flows through, which is how
end-to-end differentiability of sequence parameters is obtained.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Protocol, TypeVar

import numpy as np
import scipy.fft
import scipy.spatial.distance

import jax.numpy as jnp

from pulser_tpu.math.abstract_array import (
    AbstractArray as AbstractArray,
    AbstractArrayLike,
)
from pulser_tpu.math.multinomial import multinomial as multinomial

T = TypeVar("T", covariant=True)


class TensorLike(Protocol[T]):
    """A type hint for a parameter that behaves like a JAX array."""

    def __array__(self, dtype: Any | None = None) -> np.ndarray: ...


def _xp(*arrs: AbstractArray):
    """Pick the backend module: jnp if any input is JAX, else numpy."""
    return jnp if any(a.is_tensor for a in arrs) else np


def _unary(np_fn, jnp_fn=None):
    def fn(a: AbstractArrayLike, /) -> AbstractArray:
        a = AbstractArray(a)
        if a.is_tensor:
            return AbstractArray((jnp_fn or np_fn)(a.as_tensor()))
        return AbstractArray(np_fn(a.as_array()))

    # The function's name is load-bearing: ParamObj serializes deferred
    # calls under cls.__name__ (e.g. {"expression": "sqrt", ...})
    fn.__name__ = np_fn.__name__
    fn.__qualname__ = np_fn.__name__
    return fn


norm_ = np.linalg.norm


def norm(a: AbstractArrayLike) -> AbstractArray:
    """Return the norm of the array."""
    a = AbstractArray(a)
    if a.is_tensor:
        return AbstractArray(jnp.linalg.norm(a.as_tensor()))
    return AbstractArray(np.linalg.norm(a.as_array()))


exp = _unary(np.exp, jnp.exp)
sqrt = _unary(np.sqrt, jnp.sqrt)
log2 = _unary(np.log2, jnp.log2)
log = _unary(np.log, jnp.log)
sin = _unary(np.sin, jnp.sin)
cos = _unary(np.cos, jnp.cos)
tan = _unary(np.tan, jnp.tan)
tanh = _unary(np.tanh, jnp.tanh)
ceil = _unary(np.ceil, jnp.ceil)
floor = _unary(np.floor, jnp.floor)


def pad(
    a: AbstractArrayLike,
    pad_width: tuple | int,
    mode: str = "constant",
    constant_values: tuple | int | float = 0,
) -> AbstractArray:
    """Pads an array (1D), supporting 'constant' and 'edge' modes."""
    a = AbstractArray(a)
    if a.is_tensor:
        t = a.as_tensor()
        kwargs = (
            dict(constant_values=constant_values) if mode == "constant" else {}
        )
        return AbstractArray(jnp.pad(t, pad_width, mode, **kwargs))
    kwargs = (
        dict(constant_values=constant_values) if mode == "constant" else {}
    )
    return AbstractArray(
        np.pad(a.as_array(), pad_width, mode, **kwargs)  # type: ignore
    )


def fft(a: AbstractArrayLike) -> AbstractArray:
    """Fast Fourier transform."""
    a = AbstractArray(a)
    if a.is_tensor:
        return AbstractArray(jnp.fft.fft(a.as_tensor()))
    return AbstractArray(scipy.fft.fft(a.as_array()))


def ifft(a: AbstractArrayLike) -> AbstractArray:
    """Inverse fast Fourier transform."""
    a = AbstractArray(a)
    if a.is_tensor:
        return AbstractArray(jnp.fft.ifft(a.as_tensor()))
    return AbstractArray(scipy.fft.ifft(a.as_array()))


def fftfreq(n: int) -> AbstractArray:
    """The FFT sample frequencies for n samples."""
    return AbstractArray(scipy.fft.fftfreq(n))


def round(a: AbstractArrayLike, decimals: int = 0) -> AbstractArray:
    """Round to the given number of decimals."""
    return AbstractArray(a).__round__(decimals)


def mean(a: AbstractArrayLike, axis: int | None = None) -> AbstractArray:
    """Arithmetic mean along the given axis."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).mean(a._array, axis=axis))


def sum(a: AbstractArrayLike) -> AbstractArray:
    """Sum of all elements."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).sum(a._array))


def cumsum(a: AbstractArrayLike, axis: int = 0) -> AbstractArray:
    """Cumulative sum along an axis."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).cumsum(a._array, axis=axis))


def diff(a: AbstractArrayLike) -> AbstractArray:
    """First discrete difference."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).diff(a._array))


def clip(a: AbstractArrayLike, a_min: float, a_max: float) -> AbstractArray:
    """Clip values to [a_min, a_max]."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).clip(a._array, a_min, a_max))


def dot(a: AbstractArrayLike, b: AbstractArrayLike) -> AbstractArray:
    """Dot product of two 1D arrays."""
    a, b = map(AbstractArray, (a, b))
    if a.is_tensor or b.is_tensor:
        return AbstractArray(jnp.dot(a.as_tensor(), b.as_tensor()))
    return AbstractArray(np.dot(a.as_array(), b.as_array()))


def pdist(a: AbstractArrayLike) -> AbstractArray:
    """Pairwise distances between the rows of a 2D array."""
    a = AbstractArray(a)
    if a.is_tensor:
        t = a.as_tensor()
        d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
        n = t.shape[0]
        iu = jnp.triu_indices(n, k=1)
        return AbstractArray(d[iu])
    return AbstractArray(scipy.spatial.distance.pdist(a.as_array()))


def concatenate(arrs: Sequence[AbstractArrayLike]) -> AbstractArray:
    """Concatenate arrays along the first axis."""
    abst_arrs = tuple(map(AbstractArray, arrs))
    if any(a.is_tensor for a in abst_arrs):
        return AbstractArray(jnp.concatenate([a.as_tensor() for a in abst_arrs]))
    return AbstractArray(np.concatenate([a.as_array() for a in abst_arrs]))


def vstack(arrs: Sequence[AbstractArrayLike]) -> AbstractArray:
    """Stack arrays vertically."""
    abst_arrs = tuple(map(AbstractArray, arrs))
    if any(a.is_tensor for a in abst_arrs):
        return AbstractArray(jnp.vstack([a.as_tensor() for a in abst_arrs]))
    return AbstractArray(np.vstack([a.as_array() for a in abst_arrs]))


def hstack(arrs: Sequence[AbstractArrayLike]) -> AbstractArray:
    """Stack arrays horizontally."""
    abst_arrs = tuple(map(AbstractArray, arrs))
    if any(a.is_tensor for a in abst_arrs):
        return AbstractArray(jnp.hstack([a.as_tensor() for a in abst_arrs]))
    return AbstractArray(np.hstack([a.as_array() for a in abst_arrs]))


def flatten(a: AbstractArrayLike) -> AbstractArray:
    """Flatten to 1D."""
    a = AbstractArray(a)
    if a.is_tensor:
        return AbstractArray(a.as_tensor().flatten())
    return AbstractArray(a.as_array().flatten())


def zeros_like(a: AbstractArrayLike) -> AbstractArray:
    """An array of zeros with the same shape/dtype."""
    a = AbstractArray(a)
    return AbstractArray(_xp(a).zeros_like(a._array))
