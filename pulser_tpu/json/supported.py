"""Supported modules and objects for legacy JSON (de)serialization.

API parity with reference ``pulser-core/pulser/json/supported.py``,
retargeted at the ``pulser_tpu`` module tree.
"""

from __future__ import annotations

from typing import Any, Mapping

from pulser_tpu.exceptions.serialization import (
    SerializationSupportAttributeMissing,
    SerializationSupportClassMissing,
    SerializationSupportModuleMissing,
)

SUPPORTED_BUILTINS = ("float", "int", "str", "set")

SUPPORTED_OPERATORS = (
    "neg",
    "abs",
    "getitem",
    "add",
    "sub",
    "mul",
    "truediv",
    "pow",
    "mod",
)

SUPPORTED_NUMPY = (
    "array",
    "round",
    "round_",
    "ceil",
    "floor",
    "sqrt",
    "exp",
    "log2",
    "log",
    "sin",
    "cos",
    "tan",
)

SUPPORTS_SUBMODULE = (
    "Pulse",
    "BlackmanWaveform",
    "KaiserWaveform",
    "Register",
    "Register3D",
)

_DEVICE_NAMES = (
    "DigitalAnalogDevice",
    "AnalogDevice",
    "WeightedAnalogDevice",
    "MockDevice",
    "Chadoq2",
    "IroiseMVP",
)

SUPPORTED_MODULES = {
    "builtins": SUPPORTED_BUILTINS,
    "_operator": SUPPORTED_OPERATORS,
    "operator": SUPPORTED_OPERATORS,
    "numpy": SUPPORTED_NUMPY,
    "pulser_tpu.math": SUPPORTED_NUMPY,
    "pulser_tpu.math.abstract_array": ("AbstractArray",),
    "pulser_tpu.register.register": ("Register",),
    "pulser_tpu.register.register3d": ("Register3D",),
    "pulser_tpu.register.register_layout": ("RegisterLayout",),
    "pulser_tpu.register.special_layouts": (
        "RectangularLatticeLayout",
        "SquareLatticeLayout",
        "TriangularLatticeLayout",
    ),
    "pulser_tpu.register.mappable_reg": ("MappableRegister",),
    "pulser_tpu.register.weight_maps": ("DetuningMap",),
    "pulser_tpu.devices": _DEVICE_NAMES + ("VirtualDevice",),
    "pulser_tpu.channels": ("Rydberg", "Raman", "Microwave", "DMM"),
    "pulser_tpu.channels.eom": ("BaseEOM", "RydbergEOM", "RydbergBeam"),
    "pulser_tpu.pulse": ("Pulse",),
    "pulser_tpu.waveforms": (
        "CompositeWaveform",
        "CustomWaveform",
        "ConstantWaveform",
        "RampWaveform",
        "BlackmanWaveform",
        "InterpolatedWaveform",
        "KaiserWaveform",
    ),
    "pulser_tpu.sequence.sequence": ("Sequence",),
    "pulser_tpu.sequence": ("Sequence",),
    "pulser_tpu.parametrized.variable": ("Variable",),
    "pulser_tpu.parametrized.paramobj": ("ParamObj",),
}

# Accept the reference's module paths too, so its serialized payloads load.
for _mod, _names in list(SUPPORTED_MODULES.items()):
    if _mod.startswith("pulser_tpu."):
        SUPPORTED_MODULES[_mod.replace("pulser_tpu.", "pulser.", 1)] = _names


def validate_serialization(obj_dict: Mapping[str, Any]) -> None:
    """Checks if 'obj_dict' can be serialized."""
    try:
        obj_dict["_build"]
        obj_str = obj_dict["__name__"]
        module_str = obj_dict["__module__"]
    except KeyError:
        raise TypeError("Invalid 'obj_dict'.")

    if module_str not in SUPPORTED_MODULES:
        raise SerializationSupportModuleMissing(module=module_str)

    if "__submodule__" in obj_dict:
        submodule_str = obj_dict["__submodule__"]
        if submodule_str not in SUPPORTS_SUBMODULE:
            raise SerializationSupportAttributeMissing(
                module=module_str, submodule=submodule_str
            )
        return

    if obj_str not in SUPPORTED_MODULES[module_str]:
        raise SerializationSupportClassMissing(
            module=module_str, class_name=obj_str
        )
