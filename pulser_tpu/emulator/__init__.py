"""The TPU-native emulation stack (replaces pulser_simulation)."""

from pulser_tpu.emulator.hamiltonian import Hamiltonian
from pulser_tpu.emulator.qobj import Qobj, basis, qeye, tensor
from pulser_tpu.emulator.sim_result import QutipResult, TpuResult
from pulser_tpu.emulator.simconfig import SimConfig
from pulser_tpu.emulator.simresults import (
    CoherentResults,
    NoisyResults,
    SimulationResults,
)
from pulser_tpu.emulator.simulation import (
    QutipEmulator,
    Solver,
    TpuEmulator,
)

__all__ = [
    "Hamiltonian",
    "Qobj",
    "basis",
    "qeye",
    "tensor",
    "QutipResult",
    "TpuResult",
    "SimConfig",
    "CoherentResults",
    "NoisyResults",
    "SimulationResults",
    "QutipEmulator",
    "Solver",
    "TpuEmulator",
]
