"""The (legacy) SimConfig class.

Behavioral parity with reference
``pulser-simulation/pulser_simulation/simconfig.py:42-273``. SimConfig
predates NoiseModel; it keeps the old parameter spellings (eta/epsilon/
epsilon_prime, temperature in µK at the API surface but Kelvin inside)
and converts to/from NoiseModel through an alias table.
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass, field, fields
from typing import Any, Tuple, Type, TypeVar, Union, cast

import numpy as np

from pulser_tpu.hamiltonian_data.hamiltonian_data import (
    SUPPORTED_NOISES,
)
from pulser_tpu.noise_model import (
    _LEGACY_DEFAULTS,
    NoiseModel,
    NoiseTypes,
    _doppler_sigma,
)

T = TypeVar("T", bound="SimConfig")

# NoiseModel field name -> SimConfig field name, where they differ.
_LEGACY_NAME_OF = {
    "noise_types": "noise",
    "state_prep_error": "eta",
    "p_false_pos": "epsilon",
    "p_false_neg": "epsilon_prime",
}


@dataclass(frozen=True)
class SimConfig:
    """The deprecated, pre-NoiseModel simulation configuration.

    Warning:
        Deprecated; ``NoiseModel`` should be used instead.

    Args:
        noise: Active noise type(s) — one name or a tuple of names.
        eta: Chance that an atom comes out badly prepared.
        epsilon: False-positive readout probability.
        epsilon_prime: False-negative readout probability.
        runs: How many noisy realizations to draw.
        samples_per_run: Bitstring samples taken per realization.
        temperature: The array's temperature, given in µK.
        laser_waist: Gaussian waist of the global-pulse laser (µm).
        amp_sigma: Shot-to-shot amplitude spread (std around 1).
        detuning_sigma: Shot-to-shot detuning spread (std around 0).
        solver_options: Options for the solver.
    """

    noise: Union[NoiseTypes, tuple[NoiseTypes, ...]] = ()
    runs: int = cast(int, _LEGACY_DEFAULTS["runs"])
    samples_per_run: int = cast(
        int, _LEGACY_DEFAULTS["samples_per_run"]
    )
    temperature: float = _LEGACY_DEFAULTS["temperature"]
    laser_waist: float = _LEGACY_DEFAULTS["laser_waist"]
    amp_sigma: float = _LEGACY_DEFAULTS["amp_sigma"]
    detuning_sigma: float = 0.0
    eta: float = _LEGACY_DEFAULTS["state_prep_error"]
    epsilon: float = _LEGACY_DEFAULTS["p_false_pos"]
    epsilon_prime: float = _LEGACY_DEFAULTS["p_false_neg"]
    relaxation_rate: float = _LEGACY_DEFAULTS["relaxation_rate"]
    dephasing_rate: float = _LEGACY_DEFAULTS["dephasing_rate"]
    hyperfine_dephasing_rate: float = _LEGACY_DEFAULTS[
        "hyperfine_dephasing_rate"
    ]
    depolarizing_rate: float = _LEGACY_DEFAULTS["depolarizing_rate"]
    eff_noise_rates: list[float] = field(
        default_factory=list, repr=False
    )
    eff_noise_opers: list[Any] = field(default_factory=list, repr=False)
    solver_options: dict[str, Any] | None = None

    @classmethod
    def from_noise_model(cls: Type[T], noise_model: NoiseModel) -> T:
        """Translates a NoiseModel into the legacy spelling."""
        relevant = NoiseModel._find_relevant_params(
            noise_model.noise_types,
            noise_model.state_prep_error,
            noise_model.amp_sigma,
            noise_model.laser_waist,
        )
        kwargs: dict[str, Any] = dict(noise=noise_model.noise_types)
        for param in relevant:
            kwargs[_LEGACY_NAME_OF.get(param, param)] = getattr(
                noise_model, param
            )
        # SimConfig spells "no waist" as inf, NoiseModel as None.
        if "amplitude" in noise_model.noise_types:
            kwargs.setdefault("laser_waist", float("inf"))
        kwargs.pop("with_leakage", None)
        if "eff_noise_opers" in kwargs:
            kwargs["eff_noise_opers"] = [
                np.asarray(op) for op in kwargs["eff_noise_opers"]
            ]
        if kwargs.get("runs", 0) is None:
            del kwargs["runs"]
        return cls(**kwargs)

    def to_noise_model(self) -> NoiseModel:
        """Translates this legacy config into a NoiseModel."""
        waist = (
            None if math.isinf(self.laser_waist) else self.laser_waist
        )
        relevant = NoiseModel._find_relevant_params(
            cast(Tuple[NoiseTypes, ...], self.noise),
            self.eta,
            self.amp_sigma,
            waist,
        )
        kwargs = {
            param: getattr(self, _LEGACY_NAME_OF.get(param, param))
            for param in relevant
        }
        if "temperature" in kwargs:
            kwargs["temperature"] *= 1e6  # Converts back to µK
        if "eff_noise_opers" in kwargs:
            kwargs["eff_noise_opers"] = [
                np.asarray(op) for op in kwargs["eff_noise_opers"]
            ]
        return NoiseModel(**kwargs)

    def __post_init__(self) -> None:
        warnings.warn(
            "'SimConfig' has been deprecated, please use `NoiseModel` "
            "instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        # A single noise given as argument: convert it to a tuple
        if isinstance(self.noise, str):
            self._change_attribute("noise", (self.noise,))
        if not isinstance(self.temperature, (int, float)):
            raise TypeError(
                "'temperature' must be a float, not"
                f" {type(self.temperature)}."
            )
        # Stored in Kelvin; the constructor argument is in µK.
        self._change_attribute("temperature", self.temperature / 1e6)
        NoiseModel._check_noise_types(
            cast(Tuple[NoiseTypes], self.noise)
        )
        self._check_spam_dict()
        self._check_eff_noise()
        NoiseModel._validate_parameters(
            {f.name: getattr(self, f.name) for f in fields(self)}
        )

    @property
    def with_leakage(self) -> bool:
        """True when leakage is among the active noise types."""
        return "leakage" in self.noise

    @property
    def spam_dict(self) -> dict[str, float]:
        """The three SPAM error parameters, bundled."""
        return {
            "eta": self.eta,
            "epsilon": self.epsilon,
            "epsilon_prime": self.epsilon_prime,
        }

    @property
    def doppler_sigma(self) -> float:
        """The thermal-motion Doppler-shift spread."""
        return _doppler_sigma(self.temperature)

    def _noise_report_lines(self) -> list[str]:
        """One report block per active noise type."""
        lines = []
        if self.noise:
            lines.append(
                "Noise types:           " + ", ".join(self.noise)
            )
        if "SPAM" in self.noise:
            lines.append(f"SPAM dictionary:       {self.spam_dict}")
        if "eff_noise" in self.noise:
            lines.append(
                f"Effective noise rates:       {self.eff_noise_rates}"
            )
            lines.append(
                "Effective noise operators:      "
                f" {self.eff_noise_opers}"
            )
        if "doppler" in self.noise:
            lines.append(
                f"Temperature:           {self.temperature * 1.e6}µK"
            )
        if "amplitude" in self.noise:
            lines.append(f"Laser waist:           {self.laser_waist}μm")
            lines.append(
                f"Amplitude standard dev.:  {self.amp_sigma}"
            )
        if "relaxation" in self.noise:
            lines.append(f"Relaxation rate: {self.relaxation_rate}")
        if "dephasing" in self.noise:
            lines.append(
                f"Dephasing rate: {self.dephasing_rate} (Rydberg), "
                f"{self.hyperfine_dephasing_rate} (Hyperfine)"
            )
        if "depolarizing" in self.noise:
            lines.append(
                f"Depolarizing rate: {self.depolarizing_rate}"
            )
        return lines

    def __str__(self, solver_options: bool = False) -> str:
        lines = [
            "Options:",
            "----------",
            f"Number of runs:        {self.runs}",
            f"Samples per run:       {self.samples_per_run}",
            *self._noise_report_lines(),
        ]
        if solver_options:
            lines.append(
                "Solver Options: \n"
                + f"{str(self.solver_options)[10:-1]}"
            )
        return "\n".join(lines).rstrip()

    def _check_spam_dict(self) -> None:
        for param, value in self.spam_dict.items():
            if not 0 <= value <= 1:
                raise ValueError(
                    f"SPAM parameter {param} = {value} must be"
                    + " greater than 0 and less than 1."
                )

    def _change_attribute(
        self, attr_name: str, new_value: Any
    ) -> None:
        object.__setattr__(self, attr_name, new_value)

    def _check_eff_noise(self) -> None:
        NoiseModel._check_eff_noise(
            self.eff_noise_rates,
            [np.asarray(op) for op in self.eff_noise_opers],
            "eff_noise" in self.noise,
            self.with_leakage,
        )

    @property
    def supported_noises(self) -> dict:
        """Which noise types each interaction mode accepts."""
        return SUPPORTED_NOISES
