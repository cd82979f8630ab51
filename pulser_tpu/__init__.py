"""A TPU-native pulse-level composer and emulator for neutral-atom devices.

Drop-in capable counterpart of the reference ``pulser`` package, rebuilt
JAX/XLA/Pallas-first.  The sequence-construction layers keep the same
public API; the emulation stack (``pulser_tpu.emulator``) replaces QuTiP
with a jitted statevector/density-matrix solver.
"""

from pulser_tpu._version import __version__ as __version__
from pulser_tpu.caching import (
    _maybe_enable_from_env,
    enable_compilation_cache as enable_compilation_cache,
)

_maybe_enable_from_env()
del _maybe_enable_from_env
from pulser_tpu.waveforms import (
    CompositeWaveform,
    CustomWaveform,
    ConstantWaveform,
    RampWaveform,
    BlackmanWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
)
from pulser_tpu.pulse import Pulse
from pulser_tpu.register import Register, Register3D
from pulser_tpu.noise_model import NoiseModel
from pulser_tpu.devices import (
    AnalogDevice,
    DigitalAnalogDevice,
    MockDevice,
    WeightedAnalogDevice,
)

from pulser_tpu import (
    waveforms as waveforms,
    channels as channels,
    register as register,
    devices as devices,
    exceptions as exceptions,
)

__all__ = [
    "CompositeWaveform",
    "CustomWaveform",
    "ConstantWaveform",
    "RampWaveform",
    "BlackmanWaveform",
    "InterpolatedWaveform",
    "KaiserWaveform",
    "Pulse",
    "Register",
    "Register3D",
    "NoiseModel",
    "AnalogDevice",
    "DigitalAnalogDevice",
    "MockDevice",
    "WeightedAnalogDevice",
    "Sequence",
    "EmulatorConfig",
    "QPUBackend",
]


def __getattr__(name: str):
    # Lazily resolved to avoid import cycles while the package loads.
    if name == "Sequence":
        from pulser_tpu.sequence import Sequence

        return Sequence
    if name == "sampler":
        import pulser_tpu.sampler as sampler

        return sampler
    if name == "backend":
        import pulser_tpu.backend as backend

        return backend
    if name == "backends":
        import pulser_tpu.backends as backends

        return backends
    if name == "EmulatorConfig":
        from pulser_tpu.backend.config import EmulatorConfig

        return EmulatorConfig
    if name == "QPUBackend":
        from pulser_tpu.backend.qpu import QPUBackend

        return QPUBackend
    if name == "sequence":
        import importlib
        import sys

        # The partially-initialized module must be returned during
        # its own import (submodule imports re-enter this hook)
        mod = sys.modules.get("pulser_tpu.sequence")
        if mod is not None:
            return mod
        return importlib.import_module("pulser_tpu.sequence")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(
        set(globals())
        | {
            "Sequence",
            "sampler",
            "sequence",
            "backend",
            "backends",
            "EmulatorConfig",
            "QPUBackend",
        }
    )
