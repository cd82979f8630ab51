"""JSON serialization helpers for the abstract representation.

Wire-format parity with reference
``pulser-core/pulser/json/abstract_repr/serializer.py:39-106``.  The
full-sequence serializer (``serialize_abstract_sequence``) lives here too
and is filled in alongside the Sequence implementation.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Any, Union, cast

import numpy as np

from pulser_tpu.exceptions.serialization import AbstractReprError
from pulser_tpu.json.abstract_repr.signatures import SIGNATURES

import pulser_tpu.math as pm

if TYPE_CHECKING:
    from pulser_tpu.sequence import Sequence


class AbstractReprEncoder(json.JSONEncoder):
    """The custom encoder for abstract representation of pulser objects."""

    def default(self, o: Any) -> Union[dict[str, Any], list, int, float]:
        """Handles JSON encoding of objects not supported by default."""
        if hasattr(o, "_to_abstract_repr"):
            return cast(dict, o._to_abstract_repr())
        elif isinstance(o, pm.AbstractArray):
            return cast(list, o.tolist())
        elif isinstance(o, np.ndarray):
            return cast(list, o.tolist())
        elif isinstance(o, np.integer):
            return int(o)
        elif isinstance(o, np.floating):
            return float(o)
        elif isinstance(o, set):
            return list(o)
        elif isinstance(o, complex):
            if o.imag == 0:
                return o.real
            return dict(real=o.real, imag=o.imag)
        else:  # pragma: no cover
            return cast(dict, json.JSONEncoder.default(self, o))


def abstract_repr(name: str, *args: Any, **kwargs: Any) -> dict[str, Any]:
    """Generates the abstract repr of an object with a defined signature."""
    try:
        signature = SIGNATURES[name]
    except KeyError:
        raise ValueError(f"No signature found for '{name}'.")
    arg_as_kwarg: tuple[str, ...] = tuple()
    if len(args) < len(signature.pos):
        arg_as_kwarg = signature.pos[len(args):]
        if signature.var_pos is not None or not set(arg_as_kwarg) <= set(
            kwargs
        ):
            raise ValueError(
                f"Not enough arguments given for '{name}' (expected "
                f"{len(signature.pos)}, got {len(args)})."
            )
    res: dict[str, Any] = {}
    res.update(signature.extra)
    res.update(dict(zip(signature.all_pos_args(), args)))

    max_pos_args = len(signature.pos) + len(
        set(signature.keyword) - set(kwargs)
    )
    if signature.var_pos:
        res[signature.var_pos] = args[len(signature.pos):]
    elif len(args) > max_pos_args:
        raise ValueError(
            f"Too many positional arguments given for '{name}' (expected "
            f"{max_pos_args}, got {len(args)})."
        )
    for kw in kwargs:
        if kw in signature.keyword or kw in arg_as_kwarg:
            res[kw] = kwargs[kw]
        else:
            raise ValueError(
                f"Keyword argument '{kw}' is not in the signature of "
                f"'{name}'."
            )
    return res
