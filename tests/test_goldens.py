"""Golden-state parity for the BASELINE configs (1e-6 fidelity).

The goldens in ``tests/goldens/*.npz`` were produced by
``tools/make_goldens.py`` WITHOUT any pulser_tpu code: the sequences
are sampled with the reference pulser-core package and the dense
Schrodinger/Lindblad equation is integrated with scipy DOP853 at
rtol=1e-11 (far tighter than QuTiP's defaults). The emulator's final
states must match them to at least 1e-6 fidelity — the BASELINE.md
"final-state fidelity" acceptance bar.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    return np.load(path)


def _state_fidelity(golden_vec, state_vec):
    a = golden_vec / np.linalg.norm(golden_vec)
    b = state_vec / np.linalg.norm(state_vec)
    return abs(np.vdot(a, b)) ** 2


def _mixed_fidelity_bound(golden_rho, rho):
    """Trace-distance-based agreement for density matrices."""
    return 0.5 * np.sum(np.abs(np.linalg.eigvalsh(golden_rho - rho)))


def test_bell_blockade_golden():
    reg = tpu.Register({"q0": (-2.5, 0.0), "q1": (2.5, 0.0)})
    seq = tpu.Sequence(reg, tpu.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(1000, np.pi * np.sqrt(2)), 0.0, 0.0
        ),
        "ryd",
    )
    golden = _load("bell")["states"][-1]
    final = (
        TpuEmulator.from_sequence(seq)
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert 1 - _state_fidelity(golden, final) < 1e-6


def test_afm9_sweep_golden_at_grid_times():
    reg = tpu.Register.square(3, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = 2 * np.pi * 1.8
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, 0.0, om), -2 * np.pi * 5, 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            om, tpu.RampWaveform(2000, -2 * np.pi * 5, 2 * np.pi * 2), 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, om, 0.0), 2 * np.pi * 2, 0.0
        ),
        "ryd",
    )
    data = _load("afm9")
    eval_times = data["eval_times_us"]
    sim = TpuEmulator.from_sequence(seq, evaluation_times=eval_times)
    res = sim.run()
    # Compare at every requested grid time
    for k, golden in enumerate(data["states"]):
        state = res.get_state(
            eval_times[k], ignore_global_phase=False
        ).full()[:, 0]
        assert 1 - _state_fidelity(golden, state) < 1e-6, eval_times[k]


def test_xy_chain_golden():
    reg = tpu.Register(
        {"q0": (0.0, 0.0), "q1": (8.0, 0.0), "q2": (16.0, 0.0)}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("mw", "mw_global")
    seq.add(
        tpu.Pulse.ConstantPulse(400, 2 * np.pi * 0.5, 0.0, 0.0), "mw"
    )
    seq.delay(600, "mw")
    golden = _load("xy_chain")["states"][-1]
    final = (
        TpuEmulator.from_sequence(seq)
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert 1 - _state_fidelity(golden, final) < 1e-6


def test_digital_raman_golden():
    reg = tpu.Register({"q0": (0.0, 0.0), "q1": (0.0, 8.0)})
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(200, np.pi * 2.5, 1.0, 0.3), "ram")
    seq.target("q1", "ram")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi * 2.0, -1.0, 1.1), "ram")
    golden = _load("digital_raman")["states"][-1]
    final = (
        TpuEmulator.from_sequence(seq)
        .run()
        .get_final_state(ignore_global_phase=False)
        .full()[:, 0]
    )
    assert 1 - _state_fidelity(golden, final) < 1e-6


def test_lindblad_dephasing_golden():
    from pulser_tpu.emulator.simulation import Solver

    data = _load("lindblad_dephasing")
    rate = float(data["rate"])
    reg = tpu.Register({"q0": (-3.0, 0.0), "q1": (3.0, 0.0)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(800, 2 * np.pi, -1.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(
        seq,
        noise_model=tpu.NoiseModel(dephasing_rate=rate),
        solver=Solver.MESOLVER,
    )
    rho = sim.run().get_final_state().full()
    dim = rho.shape[0]
    golden_rho = data["states"][-1].reshape(dim, dim)
    assert _mixed_fidelity_bound(golden_rho, rho) < 1e-6


@pytest.mark.skipif(
    os.environ.get("PULSER_TPU_RUN_SLOW") != "1"
    and not any(
        d.platform in ("tpu", "axon")
        for d in __import__("jax").devices()
    ),
    reason="flagship-scale solve (dim 65536) — slow on CPU; "
    "set PULSER_TPU_RUN_SLOW=1 to force",
)
def test_afm16_flagship_golden():
    """The 16-atom AFM sweep (the headline benchmark config) must match
    the DOP853 rtol=1e-9 golden to 1e-6 fidelity at BOTH the sweep
    midpoint and the final time (``/tmp`` probes are not enough — this
    pins the exact perf-claim configuration)."""
    data = _load("afm16_final")
    spacing = 6.0
    reg = tpu.Register.square(4, spacing=spacing, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    omega_max = 2.0 * 2 * np.pi
    delta_0 = -6 * 2 * np.pi
    delta_f = 2 * 2 * np.pi
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, 0.0, omega_max), delta_0, 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            omega_max, tpu.RampWaveform(2700, delta_0, delta_f), 0.0
        ),
        "ryd",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.RampWaveform(252, omega_max, 0.0), delta_f, 0.0
        ),
        "ryd",
    )
    eval_times = np.linspace(0, seq.get_duration() * 1e-3, 101)
    res = TpuEmulator.from_sequence(
        seq, evaluation_times=eval_times
    ).run()
    mid = res.states[50].full()[:, 0]
    fin = res.states[-1].full()[:, 0]
    assert 1 - _state_fidelity(data["mid_state"], mid) < 1e-6
    assert 1 - _state_fidelity(data["final_state"], fin) < 1e-6
