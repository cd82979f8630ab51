"""Pulse behavior tests (construction, ArbitraryPhase, fall times).

Coverage modeled on the reference's ``tests/test_pulse.py``; the
ArbitraryPhase expectations follow the phi(t) -> detuning conversion
of reference ``pulser-core/pulser/pulse.py:208-260``.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from pulser_tpu import (
    BlackmanWaveform,
    ConstantWaveform,
    CustomWaveform,
    Pulse,
    RampWaveform,
)
from pulser_tpu.channels import Rydberg
from pulser_tpu.channels.eom import RydbergBeam, RydbergEOM
from pulser_tpu.parametrized import Variable
from pulser_tpu.parametrized.paramobj import ParamObj

cwf = ConstantWaveform(100, -10)
bwf = BlackmanWaveform(200, 3)
rwf = RampWaveform(200, 0, 1)

pls = Pulse(bwf, bwf, 2 * np.pi)
pls2 = Pulse.ConstantPulse(100, 1, -10, -np.pi)
pls3 = Pulse.ConstantAmplitude(1, cwf, -np.pi)
pls4 = Pulse.ConstantDetuning(bwf, -10, 0)


def test_creation_validation():
    with pytest.raises(TypeError):
        Pulse(10, 0, 0, post_phase_shift=2)
    with pytest.raises(ValueError, match="The duration of"):
        Pulse(bwf, cwf, 0)
    with pytest.raises(
        ValueError, match="All samples of an amplitude"
    ):
        Pulse(cwf, cwf, 0)
    with pytest.raises(
        TypeError, match="'phase' must be a single float"
    ):
        Pulse(bwf, rwf, [0.0, 1.0, 2.0])


def test_phase_wrapping_and_equality():
    assert pls.phase == 0  # 2*pi wraps to 0
    assert pls2 == pls3
    assert pls != pls4
    assert pls4.amplitude == pls.amplitude
    # Phases equal modulo 2*pi up to the phase precision
    assert Pulse.ConstantPulse(100, 1, -1, 0) == Pulse(
        ConstantWaveform(100, 1),
        ConstantWaveform(100, -1),
        1e-6,
        post_phase_shift=-1e-6,
    )
    assert pls2 != repr(pls2)


def test_str_and_repr():
    assert str(pls2) == (
        "Pulse(Amp=1 rad/µs, Detuning=-10 rad/µs, Phase=3.14)"
    )
    pls_ = Pulse(bwf, rwf, 1, post_phase_shift=-np.pi)
    assert repr(pls_) == (
        "Pulse(amp=BlackmanWaveform(200 ns, Area: 3) rad/µs, "
        "detuning=RampWaveform(200 ns, 0->1) rad/µs, "
        "phase=1, post_phase_shift=3.14)"
    )


def test_draw(patch_plt_show):
    Pulse.ConstantDetuning(bwf, -10, 1, post_phase_shift=-np.pi).draw()


@pytest.fixture
def eom_channel():
    eom_config = RydbergEOM(
        mod_bandwidth=24,
        max_limiting_amp=100,
        limiting_beam=RydbergBeam.RED,
        intermediate_detuning=700,
        controlled_beams=tuple(RydbergBeam),
    )
    return Rydberg.Global(
        None, None, mod_bandwidth=4, eom_config=eom_config
    )


def test_fall_time(eom_channel):
    pulse = Pulse.ConstantPulse(1000, 1, 0, 0)
    # Fall time = 2 rise times of whichever modulator is active
    assert (
        pulse.fall_time(eom_channel, in_eom_mode=False)
        == 2 * eom_channel.rise_time
    )
    assert (
        pulse.fall_time(eom_channel, in_eom_mode=True)
        == 2 * eom_channel.eom_config.rise_time
    )


def test_get_full_duration(eom_channel):
    with pytest.raises(
        TypeError, match="must be a channel object instance"
    ):
        pls.get_full_duration("eom_channel")
    plain = Rydberg.Global(None, None)
    with pytest.raises(
        ValueError, match="does not support EOM mode operation"
    ):
        pls.get_full_duration(plain, in_eom_mode=True)
    # No modulation -> no fall time
    assert pls.get_full_duration(plain) == pls.duration
    modulated = dataclasses.replace(plain, mod_bandwidth=4)
    assert pls.get_full_duration(
        modulated
    ) == pls.duration + pls.fall_time(modulated)
    assert pls.get_full_duration(
        eom_channel, in_eom_mode=True
    ) == pls.duration + pls.fall_time(eom_channel, in_eom_mode=True)


@pytest.mark.parametrize(
    "phase_wf, det_wf, phase_0",
    [
        (
            ConstantWaveform(200, -123),
            ConstantWaveform(200, 0),
            -123 % (2 * np.pi),
        ),
        (
            RampWaveform(200, -5, 5),
            ConstantWaveform(200, (-10 / 199) * 1e3),
            (-5 + (-10 / 199)) % (2 * np.pi),
        ),
        (
            -bwf,
            CustomWaveform(
                np.pad(
                    np.diff(np.asarray(bwf.samples, dtype=float)),
                    (1, 0),
                    mode="edge",
                )
                * 1e3
            ),
            -float(bwf[0]) + (-float(bwf[0]) + float(bwf[1])),
        ),
    ],
)
def test_arbitrary_phase(phase_wf, det_wf, phase_0):
    with pytest.raises(TypeError, match="must be a waveform"):
        Pulse.ArbitraryPhase(bwf, -3)
    pls_ = Pulse.ArbitraryPhase(bwf, phase_wf)
    assert pls_ == Pulse(bwf, det_wf, phase_0)
    # Reconstructing phi(t) from the detuning integral recovers the
    # requested phase modulation (mod 2*pi)
    calculated = -np.cumsum(
        np.asarray(pls_.detuning.samples, dtype=float) * 1e-3
    ) + float(phase_0)
    requested = np.asarray(phase_wf.samples, dtype=float)
    assert np.allclose(
        calculated % (2 * np.pi),
        requested % (2 * np.pi),
        atol=1e-5,
    ) or np.allclose(
        (calculated + 1) % (2 * np.pi),
        (requested + 1) % (2 * np.pi),
        atol=1e-5,
    )


def test_parametrized_pulses_defer_to_build():
    vars = Variable("vars", float, size=2)
    vars._assign([1000, 1.0])
    param_bwf = BlackmanWaveform(vars[0], vars[1])
    const_pulse = Pulse.ConstantPulse(
        vars[0], vars[1], vars[1], vars[1]
    )
    assert isinstance(const_pulse, ParamObj)
    assert const_pulse.cls is Pulse
    param_const = ConstantWaveform(vars[0], vars[1])
    assert (
        const_pulse.build()
        == Pulse(param_const, param_const, vars[1]).build()
    )
    const_amp = Pulse.ConstantAmplitude(vars[1], param_bwf, vars[1])
    const_det = Pulse.ConstantDetuning(param_bwf, vars[1], vars[1])
    arb = Pulse.ArbitraryPhase(
        param_bwf, RampWaveform(vars[0], 0, vars[1])
    )
    for p, name in [
        (const_amp, "ConstantAmplitude"),
        (const_det, "ConstantDetuning"),
        (arb, "ArbitraryPhase"),
    ]:
        assert isinstance(p, ParamObj)
        assert p.cls.__name__ == name
    assert (
        const_amp.build()
        == Pulse(param_const, param_bwf, vars[1]).build()
    )
    assert (
        const_det.build()
        == Pulse(param_bwf, param_const, vars[1]).build()
    )


def test_pulse_is_frozen():
    with pytest.raises(AttributeError):
        pls2.phase = 1.0
