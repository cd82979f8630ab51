"""The parametrized system: variables, lazy DAGs, sequence replay.

Covers Variable validation/assignment, ParamObj evaluation and caching,
arithmetic on deferred values, parametrized sequence building (replay
order, register mapping, blocked methods) and end-to-end jax.grad flow
from variables to samples.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.append("/root/reference/pulser-core")
ref = pytest.importorskip("pulser")
import pulser.sampler as ref_sampler  # noqa: E402

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.parametrized import ParamObj, Variable  # noqa: E402
from pulser_tpu.sampler import sample  # noqa: E402


# ----------------------------------------------------------- variables


def test_variable_validation():
    with pytest.raises(TypeError, match="'name' has to be of type"):
        Variable(3, float)
    with pytest.raises(TypeError, match="Invalid data type"):
        Variable("x", str)
    with pytest.raises(TypeError, match="'size' is not of type 'int'"):
        Variable("x", float, size=2.0)
    with pytest.raises(ValueError, match="size 1 or larger"):
        Variable("x", float, size=0)


def test_variable_assignment_and_count():
    v = Variable("v", float, size=2)
    with pytest.raises(ValueError, match="No value assigned"):
        v.build()
    start_count = v._count
    v._assign([1.0, 2.0])
    assert v._count == start_count + 1
    np.testing.assert_array_equal(
        v.build().as_array(detach=True), [1.0, 2.0]
    )
    with pytest.raises(ValueError, match="size 3 to variable of size 2"):
        v._assign([1.0, 2.0, 3.0])


def test_variable_int_casting():
    v = Variable("n", int, size=1)
    v._assign([3.14])
    assert int(v.build()[0]) == 3


def test_variable_indexing():
    v = Variable("v", float, size=4)
    v._assign([0.0, 1.0, 2.0, 3.0])
    assert float(v[2].build()) == 2.0
    assert float(v[-1].build()) == 3.0
    picked = v[[0, 2]]
    np.testing.assert_array_equal(
        picked.build().as_array(detach=True), [0.0, 2.0]
    )
    sliced = v[1:3]
    np.testing.assert_array_equal(
        sliced.build().as_array(detach=True), [1.0, 2.0]
    )
    with pytest.raises(IndexError, match="out of bounds"):
        v[4]
    with pytest.raises(IndexError, match="out of bounds"):
        v[[0, -5]]
    with pytest.raises(TypeError, match="Invalid index type"):
        v[[0, "a"]]
    with pytest.raises(TypeError, match="Invalid key type"):
        v[{"a": 1}]
    assert len(v) == 4
    assert len(list(v)) == 4
    with pytest.raises(TypeError, match="unsized"):
        len(v[0])


def test_variable_str_forms():
    v = Variable("v", float, size=3)
    assert str(v) == "v"
    assert str(v[0]) == "v[0]"
    assert str(v[0:2]) == "v[0:2:]"
    assert str(v[[0, 2]]) == "v[[0, 2]]"


# ------------------------------------------------------------ paramobj


def test_paramobj_arithmetic_builds_correctly():
    x = Variable("x", float)
    x._assign(2.0)
    cases = [
        (x + 3, 5.0),
        (3 + x, 5.0),
        (x - 1, 1.0),
        (1 - x, -1.0),
        (x * 4, 8.0),
        (x / 4, 0.5),
        (4 / x, 2.0),
        (x**3, 8.0),
        (x % 1.5, 0.5),
        (-x, -2.0),
        (abs(-x), 2.0),
        (x // 1.5, 1.0),
        (np.sqrt(x), np.sqrt(2.0)),
        (np.exp(x), np.exp(2.0)),
        (np.sin(x), np.sin(2.0)),
        (np.tanh(x), np.tanh(2.0)),
        (np.ceil(x + 0.2), 3.0),
        (np.floor(x + 0.2), 2.0),
        (round(x + 0.123, 2), 2.12),
    ]
    for obj, expected in cases:
        assert isinstance(obj, ParamObj)
        assert float(obj.build()) == pytest.approx(expected), str(obj)


def test_paramobj_caches_until_reassignment():
    x = Variable("x", float)
    x._assign(1.0)
    expr = x * 10
    first = expr.build()
    assert expr.build() is first  # cached
    x._assign(2.0)
    assert float(expr.build()) == 20.0


def test_waveform_and_pulse_deferral():
    x = Variable("x", float)
    wf = tpu.BlackmanWaveform(800, x)
    assert isinstance(wf, ParamObj)
    pulse = tpu.Pulse.ConstantDetuning(wf, -2.0, 0.0)
    assert isinstance(pulse, ParamObj)
    x._assign(np.pi)
    built = pulse.build()
    assert isinstance(built, tpu.Pulse)
    assert float(built.amplitude.integral) == pytest.approx(np.pi)
    # ParamObj defers calls, not attribute access (same as reference)
    with pytest.raises(AttributeError):
        wf.duration


# ------------------------------------------------- parametrized builds


def _param_seq(mod):
    reg = mod.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = mod.Sequence(reg, mod.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    amp = seq.declare_variable("amp", dtype=float)
    durs = seq.declare_variable("durs", size=2, dtype=int)
    seq.add(
        mod.Pulse.ConstantPulse(durs[0], amp, -amp, 0.0), "ryd"
    )
    seq.target_index(1, "ram")
    seq.add(
        mod.Pulse.ConstantDetuning(
            mod.BlackmanWaveform(durs[1], amp * 2), 0.5, 0.1
        ),
        "ram",
    )
    seq.phase_shift_index(amp / 2, 1, basis="digital")
    return seq


def test_parametrized_build_matches_reference():
    seq_r = _param_seq(ref)
    seq_t = _param_seq(tpu)
    assert seq_t.is_parametrized()
    values = dict(amp=1.5, durs=[200, 500])
    built_r = seq_r.build(**values)
    built_t = seq_t.build(**values)
    assert built_r.get_duration() == built_t.get_duration()
    samp_r = ref_sampler.sample(built_r).to_nested_dict()
    samp_t = sample(built_t).to_nested_dict()

    def walk(a, b, path=""):
        assert a.keys() == b.keys(), path
        for k in a:
            if isinstance(a[k], dict):
                walk(a[k], b[k], path + f"/{k}")
            else:
                np.testing.assert_allclose(
                    a[k], b[k], atol=1e-12, err_msg=path + f"/{k}"
                )

    walk(samp_r, samp_t)


def test_build_requires_exactly_declared_vars():
    seq = _param_seq(tpu)
    with pytest.raises(TypeError, match="Did not receive values"):
        seq.build(amp=1.0)
    with pytest.warns(UserWarning, match="No declared variables"):
        with pytest.raises(TypeError, match="Did not receive values"):
            seq.build(amp=1.0, bogus=2.0)


def test_variables_must_come_from_this_sequence():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 8)}), tpu.MockDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    foreign = Variable("amp", float)
    with pytest.raises(ValueError, match="Unknown variable"):
        seq.add(tpu.Pulse.ConstantPulse(100, foreign, 0.0, 0.0), "ryd")


def test_protected_and_duplicate_variable_names():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 8)}), tpu.MockDevice
    )
    with pytest.raises(ValueError, match="protected name"):
        seq.declare_variable("qubits")
    seq.declare_variable("x")
    with pytest.raises(ValueError, match="already being used"):
        seq.declare_variable("x")


def test_screened_methods_block_when_parametrized():
    seq = _param_seq(tpu)
    with pytest.raises(RuntimeError, match="can't be called in"):
        seq.get_duration()
    with pytest.raises(RuntimeError, match="can't be called in"):
        seq.current_phase_ref("q0", "digital")


def test_parametrized_sequence_str_shows_stored_calls():
    seq = _param_seq(tpu)
    text = str(seq)
    assert "Stored calls" in text and "Prelude" in text
    assert "amp" in text


def test_mappable_register_build(tmp_path):
    layout = tpu.register.TriangularLatticeLayout(20, 6.0)
    mreg = layout.make_mappable_register(3)
    seq = tpu.Sequence(mreg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    with pytest.raises(ValueError, match="'qubits' must be specified"):
        seq.build()
    built = seq.build(qubits={"q0": 3, "q1": 11})
    assert set(built.register.qubit_ids) == {"q0", "q1"}
    # Global slots retarget onto the concrete register
    for slot in built._schedule["ryd"]:
        assert set(slot.targets) == {"q0", "q1"}


# ----------------------------------------------------- differentiation


def test_grad_flows_from_variable_to_samples():
    """jax.grad through a parametrized waveform build."""
    import jax
    import jax.numpy as jnp

    def loss(area):
        wf = tpu.BlackmanWaveform(800, area)
        # Sum of squared samples: d/d(area) > 0
        return jnp.sum(wf.samples.as_tensor() ** 2)

    grad = jax.grad(loss)(jnp.float32(np.pi))
    assert np.isfinite(float(grad))
    # Samples scale linearly with area, so the loss is quadratic:
    # g(a) = 2 * loss(a) / a
    expected = 2 * float(loss(jnp.float32(np.pi))) / np.pi
    assert float(grad) == pytest.approx(expected, rel=1e-4)


def test_grad_through_sequence_samples():
    """Gradients flow variables -> pulse -> schedule -> samples."""
    import jax
    import jax.numpy as jnp

    def amp_sum(amp):
        reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(100, amp, -1.0, 0.0), "ryd"
        )
        samp = sample(seq).channel_samples["ryd"]
        return jnp.sum(samp.amp.as_tensor())

    grad = jax.grad(amp_sum)(jnp.float32(1.5))
    # d(sum)/d(amp) = number of pulse samples
    assert float(grad) == pytest.approx(100.0, rel=1e-5)
