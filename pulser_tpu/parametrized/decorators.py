"""Decorators for adding parametrization support.

API parity with reference
``pulser-core/pulser/parametrized/decorators.py:28``.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import wraps
from itertools import chain
from typing import Any, TypeVar, cast

from pulser_tpu.parametrized.paramabc import Parametrized
from pulser_tpu.parametrized.paramobj import ParamObj

F = TypeVar("F", bound=Callable)


def parametrize(func: F) -> F:
    """Makes a function support parametrized arguments.

    Note:
        Designed for use in class methods. Usage in instance or static
        methods is not supported.
    """

    @wraps(func)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        if any(
            isinstance(x, Parametrized)
            for x in chain(args, kwargs.values())
        ):
            return ParamObj(func, *args, **kwargs)
        return func(*args, **kwargs)

    return cast(F, wrapper)
