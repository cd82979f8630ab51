"""End-to-end differentiability of the sequence -> sampler pipeline.

JAX-native port of the reference's ``tests/test_sequence.py::
test_sequence_diff`` (reference test_sequence.py:3172-3224): gradients
must survive from input tensors (pulse parameters, register
coordinates) through sequence building — including EOM mode, DMM
detuning and output modulation — into the sampled channel arrays.

Where torch tracks ``requires_grad`` on eagerly-built tensors, JAX
differentiates a *function*; each case therefore wraps the whole
build+sample pipeline in a closure and asserts ``jax.grad`` produces
finite, non-zero derivatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.devices import AnalogDevice, DigitalAnalogDevice, MockDevice
from pulser_tpu.sampler import sample


def _total(x) -> jnp.ndarray:
    return jnp.sum(jnp.abs(x.as_tensor()))


@pytest.mark.parametrize("with_modulation", [False, True])
@pytest.mark.parametrize("parametrized", [False, True])
def test_diff_through_pulse_and_dmm(
    parametrized, with_modulation, mod_device
):
    """Gradients flow through a Blackman pulse and a DMM ramp."""

    def build(amp, det_a, det_b, phase):
        reg = tpu.Register.from_coordinates(
            [(0.0, 0.0), (-5.0, 5.0)], prefix="q"
        )
        seq = tpu.Sequence(
            reg, mod_device if with_modulation else MockDevice
        )
        seq.declare_channel("ryd_global", "rydberg_global")
        if parametrized:
            v_amp = seq.declare_variable("v_amp", dtype=float)
            pulse = tpu.Pulse.ConstantDetuning(
                tpu.BlackmanWaveform(1000, v_amp), det_a, phase
            )
        else:
            pulse = tpu.Pulse.ConstantDetuning(
                tpu.BlackmanWaveform(1000, amp), det_a, phase
            )
        seq.add(pulse, "ryd_global")
        det_map = reg.define_detuning_map({"q0": 1.0})
        # mod_device's first DMM has no modulation bandwidth; pick the
        # modulated one when sampling with modulation.
        dmm_id = "dmm_1" if with_modulation else "dmm_0"
        seq.config_detuning_map(det_map, dmm_id)
        seq.add_dmm_detuning(
            tpu.RampWaveform(2000, det_a, det_b), dmm_id
        )
        if parametrized:
            seq = seq.build(v_amp=amp)
        return sample(seq, modulation=with_modulation), dmm_id

    def loss(params):
        amp, det_a, det_b, phase = params
        s, dmm_id = build(amp, det_a, det_b, phase)
        ryd = s.channel_samples["ryd_global"]
        dmm = s.channel_samples[dmm_id]
        return (
            _total(ryd.amp)
            + _total(ryd.det)
            + _total(ryd.phase)
            + _total(dmm.det)
        )

    params = jnp.asarray([1.0, -2.0, -1.0, 2.0], jnp.float32)
    # Also assert the sampled arrays really are traced tensors.
    s, dmm_id = build(*params)
    assert s.channel_samples["ryd_global"].amp.is_tensor
    assert s.channel_samples[dmm_id].det.is_tensor

    g = np.asarray(jax.grad(loss)(params))
    assert np.all(np.isfinite(g)), g
    # every parameter influences the samples
    assert np.all(np.abs(g) > 0.0), g


@pytest.mark.parametrize("with_modulation", [False, True])
def test_diff_through_eom_mode(with_modulation):
    """Gradients flow through EOM enable/setpoint/pulse building.

    Mirrors the reference's with_eom branch: enable EOM, pulse, delay,
    modify the setpoint, pulse again with phase-drift correction.
    """

    def loss(params):
        amp, det_on, det_off, phase = params
        reg = tpu.Register.from_coordinates(
            [(0.0, 0.0), (-5.0, 5.0)], prefix="q"
        )
        seq = tpu.Sequence(reg, AnalogDevice)
        seq.declare_channel("ryd_global", "rydberg_global")
        seq.enable_eom_mode("ryd_global", amp, det_on, det_off)
        seq.add_eom_pulse(
            "ryd_global", 100, phase, correct_phase_drift=False
        )
        seq.delay(100, "ryd_global")
        seq.modify_eom_setpoint(
            "ryd_global", amp * 2, det_off, -det_on
        )
        seq.add_eom_pulse(
            "ryd_global", 100, -phase, correct_phase_drift=True
        )
        seq.disable_eom_mode("ryd_global")
        s = sample(seq, modulation=with_modulation)
        ch = s.channel_samples["ryd_global"]
        return _total(ch.amp) + _total(ch.det) + _total(ch.phase)

    params = jnp.asarray([1.0, -2.0, -1.0, 2.0], jnp.float32)
    val = float(loss(params))
    assert np.isfinite(val) and val > 0.0
    g = np.asarray(jax.grad(loss)(params))
    assert np.all(np.isfinite(g)), g
    assert np.abs(g[:3]).min() > 0.0, g  # amp & detunings all matter


def test_diff_through_register_coordinates():
    """Interaction-relevant coordinates admit gradients via sampling
    distances is out of sampler scope, but register construction must
    accept traced coordinates and keep them traced."""

    def qubit_gap(x):
        reg = tpu.Register.from_coordinates(
            jnp.stack(
                [jnp.stack([x, jnp.float32(0.0)]), jnp.asarray([5.0, 0.0])]
            ),
            prefix="q",
        )
        q = reg.qubits
        return jnp.sum((q["q1"].as_tensor() - q["q0"].as_tensor()) ** 2)

    g = jax.grad(qubit_gap)(jnp.float32(1.0))
    assert float(g) == pytest.approx(-8.0)  # d/dx (5-x)^2 at x=1


def test_diff_parametrized_phase_preserved():
    """The pulse phase is never a variable; its gradient must still be
    preserved through a parametrized build (reference
    test_sequence.py:3188-3190)."""

    def loss(phase):
        reg = tpu.Register.from_coordinates([(0.0, 0.0)], prefix="q")
        seq = tpu.Sequence(reg, DigitalAnalogDevice)
        seq.declare_channel("ryd_global", "rydberg_global")
        v = seq.declare_variable("v", dtype=float)
        seq.add(
            tpu.Pulse.ConstantDetuning(
                tpu.BlackmanWaveform(500, v), -1.0, phase
            ),
            "ryd_global",
        )
        built = seq.build(v=1.0)
        ch = sample(built).channel_samples["ryd_global"]
        return _total(ch.phase)

    g = jax.grad(loss)(jnp.float32(2.0))
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(500.0, rel=1e-5)


class TestWaveformScalarGrads:
    """`integral`/`first_value`/`last_value` stay differentiable.

    These properties return host floats eagerly but must pass JAX
    tracers through instead of silently detaching them (a plain
    ``float()`` cast would zero the gradient — the reference's
    behavior, ``pulser-core/pulser/waveforms.py``).
    """

    @staticmethod
    def _scalar(v):
        return v.as_tensor() if hasattr(v, "as_tensor") else v

    def test_integral_grad_blackman(self):
        g = jax.grad(
            lambda a: self._scalar(tpu.BlackmanWaveform(1000, a).integral)
        )(jnp.float64(np.pi) if jax.config.jax_enable_x64 else np.pi)
        # The Blackman area parameter IS the integral
        assert float(g) == pytest.approx(1.0, rel=1e-5)

    def test_integral_grad_ramp(self):
        g = jax.grad(
            lambda stop: self._scalar(
                tpu.RampWaveform(1000, 0.0, stop).integral
            )
        )(2.0)
        # d/dstop of (start+stop)/2 * 1us
        assert float(g) == pytest.approx(0.5, rel=1e-5)

    def test_last_value_grad(self):
        g = jax.grad(
            lambda stop: self._scalar(
                tpu.RampWaveform(1000, 0.0, stop).last_value
            )
        )(2.0)
        assert float(g) == pytest.approx(1.0, rel=1e-5)

    def test_concrete_values_stay_floats(self):
        wf = tpu.BlackmanWaveform(1000, np.pi)
        assert isinstance(wf.integral, float)
        assert isinstance(wf.first_value, float)
        assert isinstance(wf.last_value, float)
        assert wf.integral == pytest.approx(np.pi)
