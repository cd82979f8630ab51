"""A dual numpy/JAX array holder enabling differentiable sequence parameters.

TPU-native re-design of the reference's numpy/torch ``AbstractArray``
(see reference ``pulser-core/pulser/math/abstract_array.py:33``): instead of
torch tensors, the differentiable backend is JAX.  Host-side sequence
construction and validation run on concrete numpy arrays; when a value
originates from a ``jax`` array (e.g. inside ``jax.grad`` of a parametrized
sequence build), it is carried through untouched so gradients flow.
"""

from __future__ import annotations

import operator
from typing import Any, Union

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["AbstractArray", "AbstractArrayLike", "TensorLike"]

#: Things accepted wherever a "tensor" (JAX array) is accepted.
TensorLike = Union["jax.Array", np.ndarray, float, int]


def _is_jax(value: Any) -> bool:
    """Whether ``value`` is a JAX array or tracer."""
    return isinstance(value, (jax.Array, jax.core.Tracer))


def _concrete_primal(tracer: Any) -> Any:
    """The concrete value behind a (possibly nested) JVP tracer.

    ``jax.grad`` builds JVP tracers whose ``primal`` holds the actual
    forward value whenever the computation runs eagerly — the JAX
    equivalent of what ``torch.detach()`` reads. Returns ``None`` for
    abstract tracers (``jit``/``vmap``/``scan``), which carry no data.
    """
    depth = 0
    while isinstance(tracer, jax.core.Tracer) and depth < 16:
        primal = getattr(tracer, "primal", None)
        if primal is None:
            return None
        tracer = primal
        depth += 1
    return None if isinstance(tracer, jax.core.Tracer) else tracer


class AbstractArray:
    """An abstract array containing either a numpy array or a JAX array.

    Args:
        array: The array to store. numpy inputs (or things castable to
            numpy arrays) stay numpy; JAX arrays/tracers stay JAX.
        dtype: The data type of the array.
        force_array: Forces the array to be at least 1D.
    """

    def __init__(
        self,
        array: AbstractArrayLike,
        dtype: Any = None,
        force_array: bool = False,
    ):
        if isinstance(array, AbstractArray):
            array = array._array
        self._array: np.ndarray | jax.Array
        if _is_jax(array):
            arr = array
            if dtype is not None:
                # Map python dtypes to jnp equivalents (float -> default f.p.)
                arr = arr.astype(jnp.dtype(dtype) if dtype is not float else jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
            if force_array and arr.ndim == 0:
                arr = arr[None]
            self._array = arr
        else:
            arr_np = np.asarray(array, dtype=dtype)
            if force_array and arr_np.ndim == 0:
                arr_np = arr_np[None]
            self._array = arr_np

    @staticmethod
    def has_torch() -> bool:
        """Kept for API compatibility; the JAX build never uses torch."""
        return False

    @property
    def is_tensor(self) -> bool:
        """Whether the stored array is a JAX array (or tracer)."""
        return _is_jax(self._array)

    @property
    def requires_grad(self) -> bool:
        """Whether the stored array participates in JAX differentiation.

        In JAX, gradient tracking is positional rather than stateful, so an
        array "requires grad" exactly when it is a tracer.
        """
        return isinstance(self._array, jax.core.Tracer)

    def astype(self, dtype: Any) -> AbstractArray:
        """Casts the data type of the array contents."""
        if self.is_tensor and dtype is float:
            target = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            return AbstractArray(self._array.astype(target))
        return AbstractArray(self._array.astype(dtype))

    def as_tensor(self) -> jax.Array:
        """Returns the contents as a JAX array."""
        if self.is_tensor:
            return self._array  # type: ignore[return-value]
        return jnp.asarray(self._array)

    def as_array(self, detach: bool = False) -> np.ndarray:
        """Returns the contents as a numpy array.

        Args:
            detach: Required to be ``True`` to convert a traced value,
                mirroring torch's detach requirement in the reference.
                Under ``jax.grad``/``jax.jvp`` the underlying JVP
                tracer carries a concrete primal, which is what a torch
                ``detach()`` would return; only fully abstract tracers
                (``jit``/``vmap``/``scan``) cannot be converted.
        """
        if self.is_tensor:
            if isinstance(self._array, jax.core.Tracer):
                if not detach:
                    raise RuntimeError(
                        "The value requires grad. Use `.as_array(detach=True)`"
                        " or keep it as a tensor with `.as_tensor()`."
                    )
                primal = _concrete_primal(self._array)
                if primal is None:
                    raise RuntimeError(
                        "Can't convert an abstract JAX tracer to a "
                        "numpy array."
                    )
                return np.asarray(primal)
            return np.asarray(self._array)
        return self._array  # type: ignore[return-value]

    def _to_dict(self) -> dict[str, Any]:
        from pulser_tpu.json.utils import obj_to_dict

        try:
            return obj_to_dict(self, self.as_array())
        except RuntimeError as e:
            raise NotImplementedError(
                "A tensor that requires grad can't be serialized"
                " without losing the computational graph information."
            ) from e

    def _to_abstract_repr(self) -> Any:
        try:
            return self.as_array().tolist()
        except RuntimeError as e:
            raise NotImplementedError(
                "A tensor that requires grad can't be serialized"
                " without losing the computational graph information."
            ) from e

    def copy(self) -> AbstractArray:
        """Returns a copy of the AbstractArray."""
        if self.is_tensor:
            return AbstractArray(self._array)  # JAX arrays are immutable
        return AbstractArray(self._array.copy())  # type: ignore[union-attr]

    def tolist(self) -> list:
        """Returns the contents as a python list."""
        return np.asarray(self.as_array(detach=True)).tolist()

    def reshape(self, shape: tuple[int, ...]) -> AbstractArray:
        """Returns a new AbstractArray with the given shape.

        Works on either backend (reference
        ``math/abstract_array.py:325``); gradients flow through on
        the JAX side.
        """
        return AbstractArray(self._array.reshape(shape))

    @property
    def size(self) -> int:
        """The number of elements."""
        return int(np.prod(self._array.shape)) if self._array.shape else 1

    @property
    def ndim(self) -> int:
        """The number of dimensions."""
        return self._array.ndim

    @property
    def shape(self) -> tuple[int, ...]:
        """The shape of the array."""
        return tuple(self._array.shape)

    @property
    def real(self) -> AbstractArray:
        """The real part of each element."""
        return AbstractArray(self._array.real)

    @property
    def dtype(self) -> Any:
        """The data type of the contents."""
        return self._array.dtype

    def detach(self) -> AbstractArray:
        """Returns a new AbstractArray detached from any trace."""
        return AbstractArray(self.as_array(detach=True))

    def __repr__(self) -> str:
        return repr(self._array)

    # ---- conversions ----
    def __int__(self) -> int:
        return int(self.as_array(detach=True))

    def __float__(self) -> float:
        return float(self.as_array(detach=True))

    def __complex__(self) -> complex:
        return complex(self.as_array(detach=True))

    def __bool__(self) -> bool:
        return bool(self._array)

    def __len__(self) -> int:
        return len(self._array)

    def __iter__(self):
        for i in range(len(self)):
            yield AbstractArray(self._array[i])

    def __hash__(self) -> int:
        return hash(tuple(np.ravel(self.as_array(detach=True)).tolist()))

    # ---- binary/unary op machinery ----
    @staticmethod
    def _lift2(a: Any, b: Any) -> tuple[Any, Any]:
        """Coerces two operands to a common backend (JAX wins)."""
        a_arr = a._array if isinstance(a, AbstractArray) else a
        b_arr = b._array if isinstance(b, AbstractArray) else b
        if _is_jax(a_arr) or _is_jax(b_arr):
            return jnp.asarray(a_arr), jnp.asarray(b_arr)
        return a_arr, b_arr

    def _binary_op(self, other: Any, op, reverse: bool = False):
        if other is NotImplemented:
            return NotImplemented
        a, b = AbstractArray._lift2(self, other)
        if reverse:
            a, b = b, a
        return AbstractArray(op(a, b))

    def __neg__(self) -> AbstractArray:
        return AbstractArray(operator.neg(self._array))

    def __abs__(self) -> AbstractArray:
        return AbstractArray(abs(self._array))

    def __round__(self, decimals: int = 0) -> AbstractArray:
        xp = jnp if self.is_tensor else np
        return AbstractArray(xp.round(self._array, decimals))

    # Comparison / arithmetic operators
    def __eq__(self, other: Any) -> AbstractArray:  # type: ignore[override]
        return self._binary_op(other, operator.eq)

    def __ne__(self, other: Any) -> AbstractArray:  # type: ignore[override]
        return self._binary_op(other, operator.ne)

    def __lt__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.lt)

    def __le__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.le)

    def __gt__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.gt)

    def __ge__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.ge)

    def __add__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.add)

    def __radd__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.add, reverse=True)

    def __sub__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.sub)

    def __rsub__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.sub, reverse=True)

    def __mul__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.mul)

    def __rmul__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.mul, reverse=True)

    def __truediv__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.truediv)

    def __rtruediv__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.truediv, reverse=True)

    def __floordiv__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.floordiv)

    def __rfloordiv__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.floordiv, reverse=True)

    def __pow__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.pow)

    def __rpow__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.pow, reverse=True)

    def __mod__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.mod)

    def __rmod__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.mod, reverse=True)

    def __matmul__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.matmul)

    def __rmatmul__(self, other: Any) -> AbstractArray:
        return self._binary_op(other, operator.matmul, reverse=True)

    # ---- numpy ufunc interception (so np.cos(AbstractArray) works) ----
    # Reductions of jnp ufunc equivalents, for np.max(jax-backed) etc.
    _JNP_REDUCTIONS = {
        "add": "sum",
        "maximum": "max",
        "minimum": "min",
        "multiply": "prod",
        "logical_or": "any",
        "logical_and": "all",
    }

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        arrays = [
            x._array if isinstance(x, AbstractArray) else x for x in inputs
        ]
        if any(_is_jax(a) for a in arrays):
            if method == "__call__":
                jfn = getattr(jnp, ufunc.__name__, None)
                if jfn is None:
                    return NotImplemented
                return AbstractArray(
                    jfn(*[jnp.asarray(a) for a in arrays])
                )
            if method == "reduce":
                red = self._JNP_REDUCTIONS.get(ufunc.__name__)
                if red is None:
                    return NotImplemented
                return AbstractArray(
                    getattr(jnp, red)(jnp.asarray(arrays[0]), **kwargs)
                )
            return NotImplemented
        result = getattr(ufunc, method)(*arrays, **kwargs)
        if isinstance(result, np.ndarray) or np.isscalar(result):
            return AbstractArray(result)
        return result

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        arr = self.as_array(detach=True)
        return np.asarray(arr, dtype=dtype)

    # ---- indexing ----
    @staticmethod
    def _unwrap_index(indices: Any) -> Any:
        if isinstance(indices, AbstractArray):
            return indices._array
        if isinstance(indices, tuple):
            return tuple(AbstractArray._unwrap_index(i) for i in indices)
        return indices

    def __getitem__(self, indices: Any) -> AbstractArray:
        return AbstractArray(self._array[self._unwrap_index(indices)])

    def __setitem__(self, indices: Any, values: Any) -> None:
        idx = self._unwrap_index(indices)
        vals = values._array if isinstance(values, AbstractArray) else values
        if self.is_tensor or _is_jax(vals):
            arr = jnp.asarray(self._array)
            self._array = arr.at[idx].set(jnp.asarray(vals))
        else:
            self._array[idx] = vals  # type: ignore[index]


AbstractArrayLike = Union[AbstractArray, TensorLike, list, tuple]
