"""The TPU-native emulation stack (replaces pulser_simulation)."""

from pulser_tpu.emulator.hamiltonian import Hamiltonian
from pulser_tpu.backend.config import EmulatorConfig
from pulser_tpu.emulator.aggregators import density_matrix_aggregator
from pulser_tpu.noise_model import NoiseModel
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
from pulser_tpu.emulator.tpu_backend import (
    QutipBackend,
    QutipBackendV2,
    TpuBackend,
    TpuBackendV2,
)
from pulser_tpu.emulator.tpu_config import QutipConfig, TpuConfig
from pulser_tpu.emulator.tpu_op import QutipOperator, TpuOperator
from pulser_tpu.emulator.tpu_state import QutipState, TpuState

__all__ = [
    "EmulatorConfig",
    "NoiseModel",
    "density_matrix_aggregator",
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
    "QutipBackend",
    "QutipBackendV2",
    "TpuBackend",
    "TpuBackendV2",
    "QutipConfig",
    "TpuConfig",
    "QutipOperator",
    "TpuOperator",
    "QutipState",
    "TpuState",
]
