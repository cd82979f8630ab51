"""Deserializer from the abstract representation (wire format).

Counterpart of reference
``pulser-core/pulser/json/abstract_repr/deserializer.py``.  Starts with
the shared helpers; the object deserializers are filled in alongside the
serializer work.
"""

from __future__ import annotations

from typing import Any, Union


def deserialize_complex(obj: Any) -> Any:
    """Recursively deserializes complex numbers encoded as dicts.

    Complex values are serialized as {"real": x, "imag": y}; this walks
    nested lists/dicts and rebuilds them.
    """
    if isinstance(obj, dict):
        if set(obj.keys()) == {"real", "imag"}:
            return complex(obj["real"], obj["imag"])
        return {k: deserialize_complex(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [deserialize_complex(v) for v in obj]
    return obj
