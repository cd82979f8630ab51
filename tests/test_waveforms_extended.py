"""Extended waveform behavior suite.

Mirrors the reference's ``tests/test_waveforms.py`` (623 LoC):
duration casting/warnings, duration changes, sample values, integrals,
equality/hashing, composite/custom/ramp/blackman specifics, the
InterpolatedWaveform validation matrix incl. parametrized inputs and
deprecated interpolators, the Kaiser sweep, arithmetic operators,
legacy serialization, the full __getitem__ matrix, channel modulation,
JAX differentiability (torch autograd in the reference), and
truncation (reference ``pulser-core/pulser/waveforms.py``).
"""

from __future__ import annotations

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import PchipInterpolator, interp1d

from pulser_tpu.channels import Rydberg
from pulser_tpu.json.coders import PulserDecoder, PulserEncoder
from pulser_tpu.parametrized import ParamObj, Variable
from pulser_tpu.waveforms import (
    BlackmanWaveform,
    CompositeWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
    RampWaveform,
)

np.random.seed(20201105)

constant = ConstantWaveform(100, -3)
ramp = RampWaveform(2000, 5, 19)
arb_samples = np.random.random(52)
custom = CustomWaveform(arb_samples)
blackman = BlackmanWaveform(40, np.pi)
composite = CompositeWaveform(blackman, constant, custom)
interp_values = [0, 1, 4.4, 2, 3, 1, 0]
interp = InterpolatedWaveform(1000, interp_values)
kaiser = KaiserWaveform(40, np.pi)


def test_duration():
    with pytest.raises(
        TypeError, match="needs to be castable to int"
    ):
        ConstantWaveform("s", -1)
    with pytest.raises(
        TypeError, match="needs to be castable to int"
    ):
        RampWaveform([0, 1, 3], 1, 0)

    with pytest.raises(ValueError, match="positive duration"):
        RampWaveform(-20, 3, 4)

    with pytest.warns(UserWarning):
        wf = BlackmanWaveform(np.pi * 10, 1)

    assert wf.duration == 31
    assert custom.duration == 52
    assert composite.duration == 192


def test_change_duration():
    new_cte = constant.with_new_duration(103)
    assert constant.duration == 100
    assert new_cte.duration == 103

    new_blackman = blackman.with_new_duration(30)
    assert np.isclose(new_blackman.integral, blackman.integral)
    assert new_blackman != blackman

    new_ramp = ramp.with_new_duration(100)
    assert new_ramp.duration == 100
    assert new_ramp != ramp

    assert interp.duration == 1000
    new_interp = interp.with_new_duration(100)
    assert new_interp.duration == 100


def test_samples():
    assert np.all(constant.samples.as_array() == -3)
    bm_samples = np.clip(np.blackman(40), 0, np.inf)
    bm_samples *= np.pi / np.sum(bm_samples) / 1e-3
    comp_samples = np.concatenate(
        [bm_samples, np.full(100, -3), arb_samples]
    )
    assert np.all(
        np.isclose(composite.samples.as_array(), comp_samples)
    )


def test_integral():
    assert np.isclose(blackman.integral, np.pi)
    assert constant.integral == -0.3
    assert ramp.integral == 24


def test_draw(patch_plt_show):
    rydberg_global = Rydberg.Global(
        2 * np.pi * 20, 2 * np.pi * 2.5, mod_bandwidth=4
    )
    composite.draw()
    blackman.draw(output_channel=rydberg_global)
    interp.draw(output_channel=rydberg_global)


def test_eq():
    assert constant == CustomWaveform(np.full(100, -3))
    assert constant != -3
    assert constant != CustomWaveform(np.full(48, -3))


def test_first_last():
    assert constant.first_value == constant.last_value
    assert ramp.first_value == 5
    assert ramp.last_value == 19
    assert blackman.first_value == 0
    assert blackman.last_value == 0
    assert composite.first_value == 0
    assert composite.last_value == arb_samples[-1]
    assert custom.first_value == arb_samples[0]
    assert np.isclose(interp.first_value, interp_values[0])
    assert np.isclose(interp.last_value, interp_values[-1])


def test_hash():
    assert hash(constant) == hash(tuple(np.full(100, -3)))
    assert hash(ramp) == hash(tuple(np.linspace(5, 19, num=2000)))


def test_composite():
    with pytest.raises(
        ValueError, match="Needs at least two waveforms"
    ):
        CompositeWaveform()
    with pytest.raises(
        ValueError, match="Needs at least two waveforms"
    ):
        CompositeWaveform(composite)

    with pytest.raises(TypeError, match="not a valid waveform"):
        CompositeWaveform(composite, "constant")

    assert composite.waveforms == [blackman, constant, custom]

    wf = CompositeWaveform(blackman, constant)
    msg = (
        "BlackmanWaveform(40 ns, Area: 3.14), "
        "ConstantWaveform(100 ns, -3)"
    )
    assert wf.__str__() == f"Composite({msg})"
    assert wf.__repr__() == f"CompositeWaveform(140 ns, [{msg}])"


def test_custom():
    data = np.arange(16, dtype=float)
    wf = CustomWaveform(data)
    assert wf.__str__() == "Custom"
    assert wf.__repr__() == f"CustomWaveform(16 ns, {data!r})"


def test_ramp():
    assert np.isclose(ramp.slope, 7e-3, atol=1e-5)

    ramp_samples = RampWaveform(
        3000, top := 25.757450291031688, 0
    ).samples.as_array()
    assert np.all(
        np.logical_and(ramp_samples <= top, ramp_samples >= 0)
    )


def test_blackman():
    with pytest.raises(TypeError):
        BlackmanWaveform(100, np.array([1, 2]))
    wf = BlackmanWaveform(100, -2)
    assert np.isclose(wf.integral, -2)
    assert np.all(wf.samples.as_array() <= 0)
    assert wf == BlackmanWaveform(100, np.array(-2))

    with pytest.raises(ValueError, match="matching signs"):
        BlackmanWaveform.from_max_val(-10, np.pi)

    wf = BlackmanWaveform.from_max_val(10, 2 * np.pi)
    assert np.isclose(wf.integral, 2 * np.pi)
    assert np.max(wf.samples.as_array()) < 10

    wf = BlackmanWaveform.from_max_val(-10, -np.pi)
    assert np.isclose(wf.integral, -np.pi)
    assert np.min(wf.samples.as_array()) > -10

    var = Variable("var", float)
    wf_var = BlackmanWaveform.from_max_val(-10, var[0])
    assert isinstance(wf_var, ParamObj)
    var._assign(-np.pi)
    assert wf_var.build() == wf

    # The duration snaps back to even before exceeding max_val
    area: float = np.pi / 6
    max_val: float = 46
    wf = BlackmanWaveform.from_max_val(max_val, area)
    duration = wf.duration
    assert duration % 2 == 0
    wf2 = BlackmanWaveform(duration + 1, area)
    assert (
        np.max(wf2.samples.as_array())
        < np.max(wf.samples.as_array())
        <= max_val
    )

    wf = BlackmanWaveform.from_max_val(-max_val, -area)
    duration = wf.duration
    assert duration % 2 == 0
    wf2 = BlackmanWaveform(duration + 1, -area)
    assert (
        np.min(wf2.samples.as_array())
        > np.min(wf.samples.as_array())
        >= -max_val
    )


def test_interpolated():
    import pulser_tpu

    assert isinstance(interp.interp_function, PchipInterpolator)

    times = np.linspace(0.2, 0.8, num=len(interp_values))
    with pytest.raises(
        ValueError, match="must match the number of `values`"
    ):
        InterpolatedWaveform(1000, interp_values, times=times[:-1])
    with pytest.raises(
        ValueError, match="must be greater than or equal to 0"
    ):
        InterpolatedWaveform(
            1000, interp_values, times=times - 0.21
        )
    with pytest.raises(
        ValueError, match="must be less than or equal to 1"
    ):
        InterpolatedWaveform(
            1000, interp_values, times=times + 0.21
        )
    with pytest.raises(
        ValueError, match="array of non-repeating values"
    ):
        InterpolatedWaveform(
            1000, interp_values, times=[0.2] + times[:-1].tolist()
        )

    with pytest.raises(
        ValueError, match="Invalid interpolator 'fake'"
    ):
        InterpolatedWaveform(
            1000, interp_values, times=times, interpolator="fake"
        )

    # Large value ranges keep samples non-negative after rounding
    wf = InterpolatedWaveform(
        1000, times=[0.0, 0.5, 1.0], values=[0, 2.6e7, 0]
    )
    assert np.all(wf.samples.as_array() >= 0)

    seq = pulser_tpu.Sequence(
        pulser_tpu.Register.square(2, 5, prefix="q"),
        device=pulser_tpu.DigitalAnalogDevice,
    )

    values = seq.declare_variable("values", size=5)
    duration, *other_values = values
    with pytest.raises(
        TypeError,
        match="`values` must be a parametrized object or a sequence"
        " of elements castable to float.",
    ):
        InterpolatedWaveform(1000, values=other_values)
    with pytest.raises(
        TypeError,
        match="`values` must be a parametrized object or a sequence"
        " of elements castable to float.",
    ):
        InterpolatedWaveform(duration, values=other_values)
    with pytest.raises(
        TypeError,
        match="`times` must be a parametrized object or a sequence"
        " of elements castable to float.",
    ):
        InterpolatedWaveform(
            duration, [0, 0.1, 0.2, 0.3], other_values
        )
    times_var = seq.declare_variable("times", size=6)
    interp_wvf = InterpolatedWaveform(1000, values, times_var)
    times_var._assign([0, 0.1, 0.2, 0.3, 0.4, 0.5])
    values._assign([0, 1, 2, 3, 4])
    with pytest.raises(
        ValueError,
        match=re.escape(
            "When specified, the number of time coordinates in"
            " `times` (6) must match the number of `values` (5)."
        ),
    ):
        interp_wvf.build()

    # Interpolation never overshoots the value range (pulser#1051)
    max_amp = 2.5 * 2 * np.pi
    interpolated_wf = InterpolatedWaveform(
        60.0, [0.0, 0.5, max_amp, 0.5, 0.0]
    )
    assert np.all(interpolated_wf.samples.as_array() <= max_amp)
    assert np.all(interpolated_wf.samples.as_array() >= 0)

    # Times defined below the ns resolution
    points_nb = 1001
    duration = 100  # ns
    values = np.linspace(0, 10, points_nb)
    times = np.linspace(0, duration, points_nb)
    interpolated_wf = InterpolatedWaveform(
        duration + 1, values, times / duration
    )
    assert all(
        np.isclose(interpolated_wf.samples.as_array(), values[::10])
    )


def test_deprecated_interp1d_interpolator():
    dt = 1000
    with pytest.deprecated_call(
        match="Setting 'interpolator' to \"interp1d\""
    ):
        interp_wf = InterpolatedWaveform(
            dt, [0, 1], interpolator="interp1d"
        )
    assert isinstance(interp_wf.interp_function, interp1d)
    np.testing.assert_allclose(
        interp_wf.samples.as_array(), np.linspace(0, 1.0, num=dt)
    )

    # __mul__ reconstructs the waveform, so it re-emits the warning
    with pytest.deprecated_call(
        match="Setting 'interpolator' to \"interp1d\""
    ):
        interp_wf *= 2
    np.testing.assert_allclose(
        interp_wf.samples.as_array(), np.linspace(0, 2.0, num=dt)
    )

    wf_str = "InterpolatedWaveform(Points: (0, 0), (999, 2)"
    assert str(interp_wf) == wf_str + ")"
    assert repr(interp_wf) == wf_str + ", Interpolator=interp1d)"


def test_deprecated_interpolator_kwargs():
    with pytest.deprecated_call(
        match="Passing extra keyword arguments to configure the SciPy"
    ):
        InterpolatedWaveform(1000, [0, 1, 0], extrapolate=False)

    dt = 1000
    vals = np.linspace(0, 1, num=5) ** 2
    with pytest.warns(DeprecationWarning) as record:
        interp_wf = InterpolatedWaveform(
            dt, vals, interpolator="interp1d", kind="quadratic"
        )
    messages = [str(w.message) for w in record]
    assert any('"interp1d"' in m for m in messages)
    assert any("extra keyword arguments" in m for m in messages)
    np.testing.assert_allclose(
        interp_wf.samples.as_array(),
        np.linspace(0, 1, num=dt) ** 2,
        atol=1e-3,
    )


def test_kaiser():
    duration: int = 40
    area: float = np.pi
    beta: float = 14.0

    wf = KaiserWaveform(duration, area, beta)
    wf_samples = wf.samples.as_array()

    with pytest.raises(TypeError):
        KaiserWaveform(duration, np.array([1, 2]))
    with pytest.raises(TypeError):
        KaiserWaveform(duration, area, beta=np.array([1, 2]))
    with pytest.raises(ValueError, match="must be greater than 0"):
        KaiserWaveform(duration, area, -1.0)

    assert wf.duration == duration
    assert wf.samples.size == duration

    wf_default_beta = KaiserWaveform(duration, area)
    kaiser_beta_14 = np.kaiser(duration, 14.0)
    kaiser_beta_14 *= area / float(np.sum(kaiser_beta_14)) / 1e-3
    np.testing.assert_allclose(
        wf_default_beta.samples.as_array(), kaiser_beta_14, atol=1e-3
    )

    assert np.isclose(np.sum(wf_samples), area * 1000.0)

    new_duration = duration * 2
    wf_with_new_duration = wf.with_new_duration(new_duration)
    assert wf_with_new_duration.samples.size == new_duration
    assert np.isclose(
        np.sum(wf_samples),
        np.sum(wf_with_new_duration.samples.as_array()),
    )

    assert str(wf) == (
        f"Kaiser({duration} ns, Area: {area:.3g}, Beta: {beta:.3g})"
    )
    assert repr(wf) == (
        f"KaiserWaveform(duration: {duration}, "
        f"area: {area:.3g}, beta: {beta:.3g})"
    )

    wf_multiplication = wf * 2
    assert np.all(
        wf_multiplication.samples.as_array() == wf_samples * 2
    )

    with pytest.raises(ValueError, match="must have matching signs"):
        KaiserWaveform.from_max_val(1, -1)

    for max_val in range(1, 501, 50):
        for beta in range(1, 20):
            wf = KaiserWaveform.from_max_val(max_val, area, beta)
            assert np.isclose(
                np.sum(wf.samples.as_array()), area * 1000.0
            )
            assert np.max(wf.samples.as_array()) <= max_val
            wf = KaiserWaveform.from_max_val(-max_val, -area, beta)
            assert np.isclose(
                np.sum(wf.samples.as_array()), -area * 1000.0
            )
            assert np.min(wf.samples.as_array()) >= -max_val


def test_ops():
    assert -constant == ConstantWaveform(100, 3)
    assert ramp * 2 == RampWaveform(2e3, 10, 38)
    assert --custom == custom
    assert blackman / 2 == BlackmanWaveform(40, np.pi / 2)
    assert composite * 1 == composite
    with pytest.raises(ZeroDivisionError):
        constant / 0


def test_serialization():
    for wf in [
        blackman,
        composite,
        constant,
        custom,
        interp,
        kaiser,
        ramp,
    ]:
        s = json.dumps(wf, cls=PulserEncoder)
        assert wf == json.loads(s, cls=PulserDecoder)


def test_get_item():
    duration = constant.duration
    with pytest.raises(
        IndexError,
        match=re.escape(
            "Index ('index_or_slice' = "
            f"{duration}) must be in the range "
            f"0~{duration - 1}, or "
            f"{-duration}~-1 from the end."
        ),
    ):
        constant[duration]
    with pytest.raises(
        IndexError,
        match=re.escape(
            "Index ('index_or_slice' = "
            f"{-duration - 1}) must be in the range "
            f"0~{duration - 1}, or "
            f"{-duration}~-1 from the end."
        ),
    ):
        constant[-duration - 1]

    with pytest.raises(
        IndexError, match="The step of the slice must be None or 1."
    ):
        constant[0:1:2]

    for wf in [blackman, composite, constant, custom, kaiser, ramp]:
        duration = wf.duration
        duration14 = duration // 4
        duration34 = duration * 3 // 4
        samples = wf.samples.as_array()

        for i in range(-duration, duration):
            assert wf[i] == samples[i]

        assert np.all(wf[0:duration].as_array() == samples)
        assert np.all(wf[0:-1].as_array() == samples[0:-1])
        assert np.all(wf[0:].as_array() == samples)
        assert np.all(wf[-1:].as_array() == samples[-1:])
        assert np.all(wf[:duration].as_array() == samples)
        assert np.all(wf[:].as_array() == samples)
        assert np.all(
            wf[duration14:duration34].as_array()
            == samples[duration14:duration34]
        )
        assert np.all(
            wf[-duration34:-duration14].as_array()
            == samples[-duration34:-duration14]
        )

        # Out-of-bounds slices clamp
        assert np.all(wf[: duration * 2].as_array() == samples)
        assert np.all(wf[-duration * 2 :].as_array() == samples)
        assert np.all(
            wf[-duration * 2 : duration * 2].as_array() == samples
        )
        assert np.all(
            wf[duration // 2 : duration * 2].as_array()
            == samples[duration // 2 : duration * 2]
        )
        assert np.all(
            wf[-duration * 2 : duration // 2].as_array()
            == samples[-duration * 2 : duration // 2]
        )
        assert wf[2:1].size == 0
        assert wf[duration * 2 :].size == 0
        assert wf[duration * 2 : duration * 3].size == 0
        assert wf[-duration * 3 : -duration * 2].size == 0


@pytest.fixture
def rydberg_global():
    return Rydberg.Global(
        2 * np.pi * 20, 2 * np.pi * 2.5, mod_bandwidth=4
    )


def test_modulation(rydberg_global):
    mod_samples = constant.modulated_samples(
        rydberg_global
    ).as_array()
    assert np.all(
        mod_samples
        == rydberg_global.modulate(constant.samples).as_array()
    )
    assert constant.modulation_buffers(rydberg_global) == (
        rydberg_global.rise_time,
        rydberg_global.rise_time,
    )
    assert (
        len(mod_samples)
        == constant.duration + 2 * rydberg_global.rise_time
    )
    assert np.isclose(np.sum(mod_samples) * 1e-3, constant.integral)
    assert max(np.abs(mod_samples)) < np.abs(constant[0])


@pytest.mark.parametrize(
    "wf_type, diff_param_name, diff_param_value, extra_params",
    [
        (CustomWaveform, "samples", np.arange(-10.0, 10.0), {}),
        (ConstantWaveform, "value", -3.14, {"duration": 20}),
        (RampWaveform, "start", -10.0, {"duration": 10, "stop": 10}),
        (RampWaveform, "stop", -10.0, {"duration": 10, "start": 10}),
        (BlackmanWaveform, "area", 2.0, {"duration": 200}),
        (KaiserWaveform, "area", -2.0, {"duration": 200}),
    ],
)
@pytest.mark.parametrize("as_composite", [True, False])
def test_waveform_diff(
    wf_type,
    diff_param_name,
    diff_param_value,
    extra_params,
    as_composite,
    rydberg_global,
    patch_plt_show,
):
    kwargs = {
        diff_param_name: jnp.asarray(diff_param_value),
        **extra_params,
    }
    wf = wf_type(**kwargs)
    if as_composite:
        wf = CompositeWaveform(wf, ConstantWaveform(100, 1.0))

    samples_tensor = wf.samples.as_tensor()
    assert wf.samples.is_tensor
    wfx2_tensor = (-wf * 2).samples.as_tensor()
    assert jnp.allclose(wfx2_tensor, samples_tensor * -2.0)

    wfdiv2 = wf / jnp.asarray(2.0)
    assert jnp.allclose(
        wfdiv2.samples.as_tensor(), samples_tensor / 2.0
    )

    # Non-differentiation methods still work on tensor inputs
    wf.draw(output_channel=rydberg_global)
    repr(wf)
    str(wf)
    hash(wf)
    wf._to_dict()
    wf._to_abstract_repr()
    assert isinstance(wf.integral, float)

    # jax.grad flows through sample construction
    def total(param):
        w = wf_type(**{**extra_params, diff_param_name: param})
        if as_composite:
            w = CompositeWaveform(w, ConstantWaveform(100, 1.0))
        return jnp.sum(w.samples.as_tensor())

    g = jax.grad(total)(jnp.asarray(diff_param_value, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize(
    "wf", [blackman, composite, custom, kaiser, ramp, interp]
)
def test_truncate(wf):
    assert wf.truncated(wf.duration + 1) == wf
    assert wf.truncated(wf.duration - 10) == CustomWaveform(
        wf.samples[:-10]
    )


def test_truncate_constant():
    assert constant.truncated(constant.duration + 1) == constant
    assert constant.truncated(
        constant.duration // 2
    ) == ConstantWaveform(constant.duration // 2, constant[0])
