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


def serialize_abstract_sequence(
    seq: Sequence,
    seq_name: str = "pulser-exported",
    json_dumps_options: dict[str, Any] = {},
    skip_validation: bool = False,
    metadata: dict[str, dict[str, Any]] | None = None,
    **defaults: Any,
) -> str:
    """Serializes a Sequence into the abstract JSON wire format.

    Wire-format parity with reference ``serializer.py:109-422``
    (``serialize_abstract_sequence``): every sequence-building call is
    mapped to its abstract operation dict.

    Keyword Args:
        seq_name: A name for the sequence.
        json_dumps_options: Optional parameters of ``json.dumps()``
            (cannot include "cls").
        skip_validation: Whether to skip validating the output against
            the abstract representation's JSON schema.
        metadata: Optional tool metadata, stored under "metadata".
        defaults: Default values for all declared variables (by name).
            With a MappableRegister, the qubit-to-trap mapping must also
            be given under the `qubits` keyword.

    Returns:
        The sequence encoded as an abstract JSON string.
    """
    import inspect
    from collections.abc import Collection
    from itertools import chain

    import pulser_tpu
    from pulser_tpu.json.abstract_repr.validation import (
        validate_abstract_repr,
    )
    from pulser_tpu.json.utils import stringify_qubit_ids
    from pulser_tpu.parametrized import Parametrized

    res: dict[str, Any] = {
        "version": "1",
        "name": seq_name,
        "register": [],
        "channels": {},
        "variables": {},
        "operations": [],
        "measurement": None,
        "pulser_version": pulser_tpu.__version__,
    }
    if metadata:
        res["metadata"] = metadata

    for var in seq._variables.values():
        res["variables"][var.name] = dict(type=var.dtype.__name__)

    qubits_default = defaults.pop("qubits", None)
    if defaults or qubits_default:
        seq._cross_check_vars(defaults)
        try:
            seq.build(qubits=qubits_default, **defaults)
        except Exception:
            raise ValueError(
                "The given 'defaults' produce an invalid sequence."
            )
        for var in seq._variables.values():
            value = var._validate_value(defaults[var.name])
            res["variables"][var.name]["value"] = value.tolist()
    else:
        # The deserializer infers each variable's size from its value
        for var in seq._variables.values():
            res["variables"][var.name]["value"] = [var.dtype()] * var.size

    def unfold_targets(target_ids: Any) -> Any:
        if isinstance(target_ids, (int, str)):
            return target_ids
        targets = list(cast(Collection, target_ids))
        return targets if len(targets) != 1 else targets[0]

    def convert_targets(
        target_ids: Any, force_list_out: bool = False
    ) -> Union[int, list[int]]:
        target_array = np.array(unfold_targets(target_ids))
        og_dim = target_array.ndim
        if og_dim == 0:
            target_array = target_array[np.newaxis]
        indices = seq.get_register(include_mappable=True).find_indices(
            target_array.tolist()
        )
        return (
            indices if force_list_out or og_dim > 0 else indices[0]
        )

    def kwarg_default(call_name: str, kwarg_name: str) -> Any:
        sig = inspect.signature(getattr(seq, call_name))
        return sig.parameters[kwarg_name].default

    def all_args(
        pos_names: tuple[str, ...], call: Any
    ) -> dict[str, Any]:
        params = {**dict(zip(pos_names, call.args)), **call.kwargs}
        for p_name in pos_names:
            if p_name not in params:
                params[p_name] = kwarg_default(call.name, p_name)
        return params

    def drop_if_default(
        data: dict[str, Any], call_name: str, kwarg_name: str
    ) -> dict[str, Any]:
        if data.get(kwarg_name, None) == kwarg_default(
            call_name, kwarg_name
        ):
            data.pop(kwarg_name, None)
        return data

    operations = res["operations"]

    def on_init(call: Any) -> None:
        data = all_args(("register", "device"), call)
        res["device"] = data["device"]
        res["register"] = data["register"]
        layout = data["register"].layout
        if layout is not None:
            res["layout"] = layout
        if qubits_default is not None:
            serial_reg = res["register"]._to_abstract_repr()
            for q_dict in serial_reg:
                if q_dict["qid"] in qubits_default:
                    q_dict["default_trap"] = qubits_default[
                        q_dict["qid"]
                    ]
            res["register"] = serial_reg

    def on_declare_channel(call: Any) -> None:
        data = all_args(("channel", "channel_id", "initial_target"), call)
        res["channels"][data["channel"]] = data["channel_id"]
        if data["initial_target"] is not None:
            operations.append(
                {
                    "op": "target",
                    "channel": data["channel"],
                    "target": convert_targets(data["initial_target"]),
                }
            )

    def on_config_detuning_map(call: Any) -> None:
        data = all_args(("detuning_map", "dmm_id"), call)
        operations.append(
            {
                "op": "config_detuning_map",
                "detuning_map": data["detuning_map"],
                "dmm_id": data["dmm_id"],
            }
        )

    def on_target(call: Any) -> None:
        data = all_args(("qubits", "channel"), call)
        if call.name == "target":
            target: Any = convert_targets(data["qubits"])
        else:  # target_index
            if isinstance(data["qubits"], Parametrized):
                target = data["qubits"]
            else:
                target = unfold_targets(data["qubits"])
        operations.append(
            {
                "op": "target",
                "channel": data["channel"],
                "target": target,
            }
        )

    def on_align(call: Any) -> None:
        optional = drop_if_default(dict(call.kwargs), "align", "at_rest")
        operations.append(
            {"op": "align", "channels": list(call.args), **optional}
        )

    def on_delay(call: Any) -> None:
        data = all_args(("duration", "channel", "at_rest"), call)
        data = drop_if_default(data, "delay", "at_rest")
        op_dict = {
            "op": "delay",
            "channel": data["channel"],
            "time": data["duration"],
        }
        if "at_rest" in data:
            op_dict["at_rest"] = data["at_rest"]
        operations.append(op_dict)

    def on_measure(call: Any) -> None:
        data = all_args(("basis",), call)
        res["measurement"] = data["basis"]

    def on_add(call: Any) -> None:
        data = all_args(("pulse", "channel", "protocol"), call)
        op_dict = {
            "op": "pulse",
            "channel": data["channel"],
            "protocol": data["protocol"],
        }
        pulse_repr = data["pulse"]._to_abstract_repr()
        if "detuning" not in pulse_repr:
            op_dict["op"] = "pulse_arbitrary_phase"
        op_dict.update(pulse_repr)
        operations.append(op_dict)

    def on_phase_shift(call: Any) -> None:
        targets = call.args[1:]
        if call.name == "phase_shift":
            targets = convert_targets(targets, force_list_out=True)
        operations.append(
            {
                "op": "phase_shift",
                "phi": call.args[0],
                "targets": targets,
                "basis": call.kwargs.get(
                    "basis", kwarg_default(call.name, "basis")
                ),
            }
        )

    def on_set_magnetic_field(call: Any) -> None:
        res["magnetic_field"] = seq.magnetic_field.tolist()

    def on_config_slm_mask(call: Any) -> None:
        data = all_args(("qubits", "dmm_id"), call)
        qubit_ids = stringify_qubit_ids(data["qubits"])
        if seq._in_xy and data["dmm_id"] == kwarg_default(
            call.name, "dmm_id"
        ):
            # Preserve the legacy XY-mode form for compatibility
            res["slm_mask_targets"] = tuple(qubit_ids)
        else:
            operations.append(
                {
                    "op": "config_slm_mask",
                    "qubits": qubit_ids,
                    "dmm_id": data["dmm_id"],
                }
            )

    def on_enable_eom_mode(call: Any) -> None:
        data = all_args(
            (
                "channel",
                "amp_on",
                "detuning_on",
                "optimal_detuning_off",
                "correct_phase_drift",
            ),
            call,
        )
        data = drop_if_default(data, call.name, "correct_phase_drift")
        operations.append({"op": "enable_eom_mode", **data})

    def on_modify_eom_setpoint(call: Any) -> None:
        data = all_args(
            (
                "channel",
                "amp_on",
                "detuning_on",
                "optimal_detuning_off",
                "correct_phase_drift",
            ),
            call,
        )
        operations.append({"op": "modify_eom_setpoint", **data})

    def on_add_eom_pulse(call: Any) -> None:
        data = all_args(
            (
                "channel",
                "duration",
                "phase",
                "post_phase_shift",
                "protocol",
                "correct_phase_drift",
            ),
            call,
        )
        data = drop_if_default(data, call.name, "correct_phase_drift")
        operations.append({"op": "add_eom_pulse", **data})

    def on_disable_eom_mode(call: Any) -> None:
        data = all_args(("channel", "correct_phase_drift"), call)
        data = drop_if_default(data, call.name, "correct_phase_drift")
        operations.append({"op": "disable_eom_mode", **data})

    def on_add_dmm_detuning(call: Any) -> None:
        data = all_args(("waveform", "dmm_name", "protocol"), call)
        operations.append({"op": "add_dmm_detuning", **data})

    def on_truncate(call: Any) -> None:
        data = all_args(("duration",), call)
        operations.append({"op": "truncate", **data})

    handlers = {
        "__init__": on_init,
        "declare_channel": on_declare_channel,
        "config_detuning_map": on_config_detuning_map,
        "target": on_target,
        "target_index": on_target,
        "align": on_align,
        "delay": on_delay,
        "measure": on_measure,
        "add": on_add,
        "phase_shift": on_phase_shift,
        "phase_shift_index": on_phase_shift,
        "set_magnetic_field": on_set_magnetic_field,
        "config_slm_mask": on_config_slm_mask,
        "enable_eom_mode": on_enable_eom_mode,
        "modify_eom_setpoint": on_modify_eom_setpoint,
        "add_eom_pulse": on_add_eom_pulse,
        "disable_eom_mode": on_disable_eom_mode,
        "add_dmm_detuning": on_add_dmm_detuning,
        "truncate": on_truncate,
    }

    for call in chain(seq._calls, seq._to_build_calls):
        if call.name not in handlers:
            raise AbstractReprError(f"Unknown call '{call.name}'.")
        handlers[call.name](call)

    abstr_seq_str = json.dumps(
        res, cls=AbstractReprEncoder, **json_dumps_options
    )
    if not skip_validation:
        validate_abstract_repr(abstr_seq_str, "sequence")
    return abstr_seq_str
