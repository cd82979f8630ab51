"""Examples run end-to-end (the reference's notebook-CI analogue).

Each example is executed as a subprocess on the CPU platform via the
``PULSER_TPU_PLATFORM`` hook; assertions check the physics lines the
examples print.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(example: str, timeout: int = 420) -> str:
    env = dict(os.environ)
    env["PULSER_TPU_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", example)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_eom_pulses_example():
    out = _run("eom_pulses.py")
    assert "round trip OK" in out
    assert "detuning_off chosen by the EOM physics" in out
    assert "final bitstrings" in out


def test_xy_spin_exchange_example():
    out = _run("xy_spin_exchange.py")
    assert "conserved" in out
    # Total flipped-spin number conserved at 1
    total = float(out.rsplit("total flipped spins:", 1)[1].split()[0])
    assert abs(total - 1.0) < 1e-6


@pytest.mark.slow
def test_afm_state_prep_example():
    out = _run("afm_state_prep.py", timeout=900)
    assert "checkerboard" in out.lower() or len(out) > 0


def test_slm_mask_dmm_example():
    out = _run("slm_mask_dmm.py")
    assert "OK slm+dmm walkthrough complete" in out
    ratio = float(
        out.rsplit("q1/q0 DMM detuning ratio:", 1)[1].split()[0]
    )
    assert abs(ratio - 0.5) < 1e-9


def test_parametrized_sequences_example():
    out = _run("parametrized_sequences.py")
    assert "OK parametrized-sequence walkthrough complete" in out
    assert "round trip: OK" in out
    err = float(out.rsplit("max |P - sin^2(theta/2)|:", 1)[1].split()[0])
    assert err < 1e-3


def test_interpolated_waveforms_example():
    out = _run("interpolated_waveforms.py")
    assert "OK interpolated-waveform walkthrough complete" in out
    assert "no overshoot" in out
    p_rr = float(out.rsplit("P(rr) =", 1)[1].split()[0])
    assert p_rr < 0.1


def test_phase_shifts_example():
    out = _run("phase_shifts_virtual_z.py")
    assert "OK phase-shift walkthrough complete" in out
    err = float(out.rsplit("max |P - sin^2(phi/2)|:", 1)[1].split()[0])
    assert err < 1e-3
    assert "(free gate)" in out


def test_register_layouts_example():
    out = _run("register_layouts.py")
    assert "OK register-layout walkthrough complete" in out
    assert "layout abstract-repr round trip: OK" in out


def test_virtual_devices_example():
    out = _run("virtual_devices.py")
    assert "OK virtual-device walkthrough complete" in out
    assert "caps lifted" in out


def test_serialization_example():
    out = _run("serialization_walkthrough.py")
    assert "OK serialization walkthrough complete" in out
    assert "schema violation rejected: SchemaValidationError" in out
    assert "legacy coder round trip: OK" in out


def test_qpu_execution_example():
    out = _run("qpu_execution.py")
    assert "OK qpu-execution walkthrough complete" in out
    p00 = float(out.rsplit("P(00) =", 1)[1].split()[0])
    assert p00 < 0.05


def test_mwis_qaa_example():
    out = _run("mwis_qaa.py", timeout=600)
    assert "OK mwis-qaa walkthrough complete" in out
    assert "QAA found the MWIS 0110" in out


@pytest.mark.slow
def test_qubo_qaa_example():
    out = _run("qubo_qaa.py", timeout=900)
    assert "OK qubo-qaa walkthrough complete" in out
    assert "QAA found 10001" in out


@pytest.mark.slow
def test_optimize_afm_preparation_example():
    out = _run("optimize_afm_preparation.py", timeout=900)
    assert "OK closed-loop optimization complete" in out
    baseline = float(
        out.rsplit("baseline Neel structure factor:", 1)[1].split()[0]
    )
    best = float(
        out.rsplit("optimized Neel structure factor:", 1)[1].split()[0]
    )
    assert best > baseline + 0.3


def test_static_quality_gate():
    """tools/check.py must pass clean (the in-image lint gate)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_rydberg_blockade_intro_example():
    out = _run("rydberg_blockade_intro.py")
    assert "blockade physics OK" in out
    assert "P(rr) far apart" in out


def test_cz_gate_blockade_example():
    out = _run("cz_gate_blockade.py", timeout=600)
    assert "CZ gate OK" in out
    assert "+1.000" in out and "-1.000" in out


def test_qaoa_qubo_example():
    out = _run("qaoa_qubo.py", timeout=600)
    assert "OK qaoa-qubo walkthrough complete" in out
    assert "P(ground configs)" in out


def test_effective_noise_channels_example():
    out = _run("effective_noise_channels.py")
    assert "eff_noise(sigma_z, rate/2) == dephasing(rate): OK" in out
    assert "hand-rolled relaxation via eff_noise: OK" in out


def test_xxz_hamiltonians_example():
    out = _run("xxz_hamiltonians.py", timeout=600)
    assert "XXZ engineering suppresses spin transport: OK" in out
    assert "magnetization conserved under free exchange: OK" in out
