"""Legacy TpuBackend (QutipBackend counterpart) suite.

Mirrors the reference's
``tests/pulser_simulation/test_qutip_backend.py`` (117 LoC):
deprecation + config typing, coherent run results, QPU mimicking
validations, device-default noise models, and collapse-operator
coercion (reference
``pulser-simulation/pulser_simulation/qutip_backend.py``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.devices import MockDevice
from pulser_tpu.emulator.qobj import Qobj, basis as basis_ket
from pulser_tpu.emulator.sim_result import TpuResult
from pulser_tpu.emulator.simresults import (
    CoherentResults,
    NoisyResults,
)
from pulser_tpu.emulator.tpu_backend import TpuBackend
from pulser_tpu.register.special_layouts import SquareLatticeLayout
from pulser_tpu.waveforms import BlackmanWaveform


@pytest.fixture
def sequence():
    reg = tpu.Register({"q0": (0, 0)})
    seq = tpu.Sequence(reg, MockDevice)
    seq.declare_channel(
        "raman_local", "raman_local", initial_target="q0"
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            BlackmanWaveform(1000, np.pi), 0, 0
        ),
        "raman_local",
    )
    return seq


def test_tpu_backend(sequence):
    with pytest.raises(
        TypeError, match="must be of type 'EmulatorConfig'"
    ), pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        TpuBackend(sequence, tpu.NoiseModel())

    with pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        backend = TpuBackend(sequence)
    results = backend.run()
    assert isinstance(results, CoherentResults)
    assert results[0].get_state() == basis_ket(2, 0)

    final_result = results[-1]
    assert isinstance(final_result, TpuResult)
    final_state = final_result.get_state()
    assert final_state == results.get_final_state()
    np.testing.assert_allclose(
        final_state.full(), [[0], [1]], atol=1e-5
    )


def test_mimic_qpu(sequence):
    with pytest.raises(
        TypeError, match="must be a real device"
    ), pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        TpuBackend(sequence, mimic_qpu=True)
    sequence = sequence.with_new_device(tpu.DigitalAnalogDevice)
    with pytest.raises(
        ValueError, match="defined from a `RegisterLayout`"
    ), pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        TpuBackend(sequence, mimic_qpu=True)
    sequence = sequence.with_new_register(
        SquareLatticeLayout(5, 5, 5).square_register(2)
    )
    with pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        TpuBackend(sequence, mimic_qpu=True)


def test_with_default_noise(sequence):
    with pytest.deprecated_call():
        spam_noise = tpu.NoiseModel(
            p_false_pos=0.1,
            p_false_neg=0.05,
            state_prep_error=0.1,
            runs=10,
            samples_per_run=1,
        )
    new_device = dataclasses.replace(
        MockDevice, noise_model=spam_noise
    )
    new_seq = sequence.with_new_device(new_device)
    with pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        backend = TpuBackend(
            new_seq,
            config=tpu.EmulatorConfig(
                prefer_device_noise_model=True
            ),
        )
    new_results = backend.run()
    assert isinstance(new_results, NoisyResults)
    assert backend._sim_obj.noise_model == spam_noise


proj = [[0, 0], [0, 1]]


@pytest.mark.parametrize(
    "collapse_op",
    [
        Qobj(np.array([[0.0, 1.0], [1.0, 0.0]])),
        Qobj(np.asarray(proj, dtype=float)),
        np.array(proj),
        proj,
    ],
)
def test_collapse_op(sequence, collapse_op):
    noise_model = tpu.NoiseModel(
        eff_noise_opers=[collapse_op], eff_noise_rates=[0.1]
    )
    with pytest.deprecated_call(match="'TpuBackend' is deprecated"):
        backend = TpuBackend(
            sequence,
            config=tpu.EmulatorConfig(noise_model=noise_model),
        )
    # The run must accept every accepted operator form
    results = backend.run()
    final = results.get_final_state()
    assert final.shape[0] == final.shape[1] == 2
    assert np.isclose(float(np.real(final.tr())), 1.0, atol=1e-6)
