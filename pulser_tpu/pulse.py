"""The Pulse class, the building block of a pulse sequence.

Behavioral parity with reference ``pulser-core/pulser/pulse.py:48-367``.
"""

from __future__ import annotations

import functools
import itertools
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, cast

import numpy as np

import pulser_tpu
import pulser_tpu.math as pm
from pulser_tpu.json.abstract_repr.serializer import abstract_repr
from pulser_tpu.json.utils import obj_to_dict
from pulser_tpu.parametrized import ParamObj, Parametrized
from pulser_tpu.parametrized.decorators import parametrize
from pulser_tpu.waveforms import (
    ConstantWaveform,
    CustomWaveform,
    RampWaveform,
    Waveform,
)

if TYPE_CHECKING:
    from pulser_tpu.channels.base_channel import Channel

__all__ = ["Pulse"]

PHASE_PRECISION = 1e-6


@dataclass(init=False, repr=False, frozen=True)
class Pulse:
    r"""A generic pulse.

    A modulation of a frequency signal in amplitude and/or frequency, with
    a specific phase, over a given duration.  The ``amplitude`` of a pulse
    is its Rabi frequency, :math:`\Omega`, in rad/µs.  Equivalently, the
    ``detuning`` is :math:`\delta`, also in rad/µs.

    Args:
        amplitude: The pulse amplitude waveform (in rad/µs).
        detuning: The pulse detuning waveform (in rad/µs).
        phase: The pulse phase (in radians).
        post_phase_shift: Optional phase shift (in rad) applied immediately
            after the end of the pulse.
    """

    amplitude: Waveform = field(init=False)
    detuning: Waveform = field(init=False)
    phase: pm.AbstractArray = field(init=False)
    post_phase_shift: float = field(default=0.0, init=False)

    def __new__(cls, *args: Any, **kwargs: Any) -> Pulse:
        """Returns a ParamObj if any argument is parametrized."""
        for x in itertools.chain(args, kwargs.values()):
            if isinstance(x, Parametrized):
                return ParamObj(  # type: ignore[return-value]
                    cls, *args, **kwargs
                )
        return object.__new__(cls)

    def __init__(
        self,
        amplitude: Waveform | Parametrized,
        detuning: Waveform | Parametrized,
        phase: float | pm.TensorLike | Parametrized,
        post_phase_shift: float | Parametrized = 0.0,
    ):
        """Initializes a new Pulse."""
        if not (
            isinstance(amplitude, Waveform) and isinstance(detuning, Waveform)
        ):
            raise TypeError(
                "'amplitude' and 'detuning' have to be waveforms."
            )

        if detuning.duration != amplitude.duration:
            raise ValueError(
                "The duration of detuning and amplitude waveforms must match."
            )
        if not amplitude.samples.requires_grad and np.any(
            amplitude.samples.as_array(detach=True) < 0
        ):
            raise ValueError(
                "All samples of an amplitude waveform must be "
                "greater than or equal to zero."
            )
        object.__setattr__(self, "amplitude", amplitude)
        object.__setattr__(self, "detuning", detuning)
        assert not isinstance(phase, Parametrized)
        if (phase_ := pm.AbstractArray(phase, dtype=float)).size != 1:
            raise TypeError(
                f"'phase' must be a single float, not {phase!r}."
            )
        object.__setattr__(self, "phase", phase_ % (2 * np.pi))
        post_phase_shift = cast(float, post_phase_shift)
        object.__setattr__(
            self, "post_phase_shift", float(post_phase_shift) % (2 * np.pi)
        )

    @property
    def duration(self) -> int:
        """The duration of the pulse (in ns)."""
        return self.amplitude.duration

    @classmethod
    @parametrize
    def ConstantDetuning(
        cls,
        amplitude: Waveform | Parametrized,
        detuning: float | pm.TensorLike | Parametrized,
        phase: float | pm.TensorLike | Parametrized,
        post_phase_shift: float | Parametrized = 0.0,
    ) -> Pulse:
        """Creates a Pulse with an amplitude waveform, constant detuning."""
        detuning_wf = ConstantWaveform(
            cast(Waveform, amplitude).duration, detuning
        )
        return cls(amplitude, detuning_wf, phase, post_phase_shift)

    @classmethod
    @parametrize
    def ConstantAmplitude(
        cls,
        amplitude: float | pm.TensorLike | Parametrized,
        detuning: Waveform | Parametrized,
        phase: float | pm.TensorLike | Parametrized,
        post_phase_shift: float | Parametrized = 0.0,
    ) -> Pulse:
        """Pulse with a constant amplitude and a detuning waveform."""
        amplitude_wf = ConstantWaveform(
            cast(Waveform, detuning).duration, amplitude
        )
        return cls(amplitude_wf, detuning, phase, post_phase_shift)

    @classmethod
    def ConstantPulse(
        cls,
        duration: int | Parametrized,
        amplitude: float | pm.TensorLike | Parametrized,
        detuning: float | pm.TensorLike | Parametrized,
        phase: float | pm.TensorLike | Parametrized,
        post_phase_shift: float | Parametrized = 0.0,
    ) -> Pulse:
        """Pulse with a constant amplitude and a constant detuning."""
        amplitude_wf = ConstantWaveform(duration, amplitude)
        detuning_wf = ConstantWaveform(duration, detuning)
        return cls(amplitude_wf, detuning_wf, phase, post_phase_shift)

    @classmethod
    @parametrize
    def ArbitraryPhase(
        cls,
        amplitude: Waveform | Parametrized,
        phase: Waveform | Parametrized,
        post_phase_shift: float | Parametrized = 0.0,
    ) -> Pulse:
        r"""Pulse with an arbitrary phase waveform.

        The phase and detuning are related by

        .. math:: \phi(t) = \phi_c - \sum_{k=0}^{t} \delta(k)

        where :math:`\phi_c` is the pulse's constant phase offset. From a
        given phase waveform, the phase offset and detuning waveform that
        respect this formula are extracted.

        Args:
            amplitude: The amplitude waveform (in rad/µs).
            phase: The phase waveform (in rad).
            post_phase_shift: Optional phase shift after the pulse (in rad).
        """
        if not isinstance(phase, Waveform):
            raise TypeError(
                f"'phase' must be a waveform, not of type {type(phase)}."
            )
        detuning: Waveform
        if isinstance(phase, ConstantWaveform):
            detuning = ConstantWaveform(phase.duration, 0.0)
        elif isinstance(phase, RampWaveform):
            detuning = ConstantWaveform(phase.duration, -phase._slope * 1e3)
        else:
            detuning_samples = -pm.diff(phase.samples) * 1e3  # rad/ns->rad/µs
            # Use the same value in the first two detuning samples
            detuning = CustomWaveform(
                pm.pad(detuning_samples, (1, 0), mode="edge")
            )
        # Adjust phase_c to incorporate the first detuning sample
        phase_c = phase[0] + detuning[0] * 1e-3
        return cls(amplitude, detuning, phase_c, post_phase_shift)

    def draw(self) -> None:
        """Draws the pulse's amplitude and frequency waveforms."""
        import matplotlib.pyplot as plt

        fig, ax1 = plt.subplots()
        ax2 = ax1.twinx()

        self.amplitude._plot(ax1, r"$\Omega$ (rad/µs)", color="darkgreen")
        self.detuning._plot(ax2, r"$\delta$ (rad/µs)", color="indigo")

        fig.tight_layout()
        plt.show()

    def fall_time(self, channel: Channel, in_eom_mode: bool = False) -> int:
        """Calculates the extra time needed to ramp down to zero."""
        aligned_start_extra_time = (
            channel.rise_time
            if not in_eom_mode
            else cast(
                pulser_tpu.channels.eom.BaseEOM, channel.eom_config
            ).rise_time
        )
        end_extra_time = max(
            self.amplitude.modulation_buffers(channel, eom=in_eom_mode)[1],
            self.detuning.modulation_buffers(channel, eom=in_eom_mode)[1],
        )
        return aligned_start_extra_time + end_extra_time

    def get_full_duration(
        self, channel: Channel, in_eom_mode: bool = False
    ) -> int:
        """Calculates the pulse's full duration after output modulation.

        Args:
            channel: The channel executing the pulse.
            in_eom_mode: Whether the pulse is executed in EOM mode.
        """
        from pulser_tpu.channels.base_channel import Channel as _Channel

        if not isinstance(channel, _Channel):
            raise TypeError(
                "'channel' must be a channel object instance, not "
                f"{type(channel)}."
            )
        if in_eom_mode and not channel.supports_eom():
            raise ValueError(
                "The given channel does not support EOM mode operation."
            )
        return self.duration + self.fall_time(channel, in_eom_mode)

    def _to_dict(self) -> dict[str, Any]:
        return obj_to_dict(
            self,
            self.amplitude,
            self.detuning,
            self.phase,
            post_phase_shift=self.post_phase_shift,
        )

    def _to_abstract_repr(self) -> dict[str, Any]:
        return abstract_repr(
            "Pulse",
            self.amplitude,
            self.detuning,
            self.phase,
            post_phase_shift=self.post_phase_shift,
        )

    def __str__(self) -> str:
        return (
            f"Pulse(Amp={self.amplitude!s} rad/µs, "
            f"Detuning={self.detuning!s} rad/µs, "
            f"Phase={float(self.phase):.3g})"
        )

    def __repr__(self) -> str:
        return (
            f"Pulse(amp={self.amplitude!r} rad/µs, "
            f"detuning={self.detuning!r} rad/µs, "
            f"phase={float(self.phase):.3g}, "
            f"post_phase_shift={float(self.post_phase_shift):.3g})"
        )

    def __eq__(self, other: Any) -> bool:
        if type(other) is not type(self):
            return False

        def check_phase_eq(phase1: float, phase2: float) -> np.bool_:
            # The offset comparison avoids failures near the wrapping point
            return np.isclose(phase1, phase2, atol=1e-6) or np.isclose(
                (phase1 + 1) % (2 * np.pi),
                (phase2 + 1) % (2 * np.pi),
                atol=PHASE_PRECISION,
            )

        return bool(
            self.amplitude == other.amplitude
            and self.detuning == other.detuning
            and check_phase_eq(float(self.phase), float(other.phase))
            and check_phase_eq(
                self.post_phase_shift, other.post_phase_shift
            )
        )

    def __hash__(self) -> int:
        return hash((self.amplitude, self.detuning, float(self.phase)))


# Replicate __init__'s signature in __new__
functools.update_wrapper(Pulse.__new__, Pulse.__init__)
