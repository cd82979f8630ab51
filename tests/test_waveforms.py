"""Waveform behavior tests (values, algebra, slicing, modulation).

Coverage modeled on the reference's ``tests/test_waveforms.py``;
expected numbers recomputed from the waveform definitions
(reference ``pulser-core/pulser/waveforms.py``).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from pulser_tpu import (
    BlackmanWaveform,
    CompositeWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
    RampWaveform,
)
from pulser_tpu.channels import Rydberg
from pulser_tpu.json.coders import PulserDecoder, PulserEncoder

ARB_SAMPLES = np.random.RandomState(7).random(52)

constant = ConstantWaveform(100, -3)
ramp = RampWaveform(2000, 5, 19)
custom = CustomWaveform(ARB_SAMPLES)
blackman = BlackmanWaveform(40, np.pi)
composite = CompositeWaveform(blackman, constant, custom)
interp_values = [0.0, 1.0, 4.4, 2.0]
interp = InterpolatedWaveform(1000, interp_values)
kaiser = KaiserWaveform(200, np.pi)


def test_duration_validation():
    with pytest.raises(TypeError, match="castable to int"):
        ConstantWaveform("s", -1)
    with pytest.raises(ValueError, match="positive duration"):
        RampWaveform(-20, 3, 4)
    with pytest.warns(
        UserWarning, match="below the supported precision"
    ):
        wf = BlackmanWaveform(np.pi * 10, 1)
    assert wf.duration == 31
    assert custom.duration == 52
    assert composite.duration == 192


def test_samples_values():
    assert np.all(np.asarray(constant.samples, dtype=float) == -3)
    bm = np.clip(np.blackman(40), 0, np.inf)
    bm *= np.pi / np.sum(bm) / 1e-3
    expected = np.concatenate([bm, np.full(100, -3), ARB_SAMPLES])
    np.testing.assert_allclose(
        np.asarray(composite.samples, dtype=float), expected
    )
    # Ramp is linspace between endpoints
    np.testing.assert_allclose(
        np.asarray(ramp.samples, dtype=float),
        np.linspace(5, 19, num=2000),
    )


def test_integral_values():
    assert np.isclose(float(blackman.integral), np.pi)
    assert np.isclose(float(constant.integral), -0.3)
    assert np.isclose(float(ramp.integral), 24)


def test_first_last_values():
    assert constant.first_value == constant.last_value == -3
    assert ramp.first_value == 5
    assert ramp.last_value == 19
    assert blackman.first_value == 0
    assert blackman.last_value == 0
    assert composite.first_value == 0
    assert np.isclose(composite.last_value, ARB_SAMPLES[-1])
    assert np.isclose(interp.first_value, interp_values[0])
    assert np.isclose(interp.last_value, interp_values[-1])


def test_equality_and_hash():
    assert constant == CustomWaveform(np.full(100, -3))
    assert constant != -3
    assert constant != CustomWaveform(np.full(48, -3))
    assert hash(constant) == hash(tuple(np.full(100, -3)))
    assert hash(ramp) == hash(tuple(np.linspace(5, 19, num=2000)))


def test_with_new_duration():
    new_cte = constant.with_new_duration(103)
    assert constant.duration == 100
    assert new_cte.duration == 103

    new_blackman = blackman.with_new_duration(30)
    assert np.isclose(
        float(new_blackman.integral), float(blackman.integral)
    )
    assert new_blackman != blackman

    assert ramp.with_new_duration(100).duration == 100
    assert interp.with_new_duration(100).duration == 100

    with pytest.raises(NotImplementedError):
        custom.with_new_duration(53)


def test_composite_validation():
    with pytest.raises(
        ValueError, match="Needs at least two waveforms"
    ):
        CompositeWaveform(composite)
    with pytest.raises(TypeError, match="not a valid waveform"):
        CompositeWaveform(composite, "constant")
    assert composite.waveforms == [blackman, constant, custom]
    wf = CompositeWaveform(blackman, constant)
    body = (
        "BlackmanWaveform(40 ns, Area: 3.14), "
        "ConstantWaveform(100 ns, -3)"
    )
    assert str(wf) == f"Composite({body})"
    assert repr(wf) == f"CompositeWaveform(140 ns, [{body}])"


def test_ramp_slope():
    # Slope is in [waveform units] per ns
    assert np.isclose(ramp.slope, (19 - 5) / (2000 - 1))


class TestBlackman:
    def test_rejects_mixed_sign_area(self):
        with pytest.raises(
            TypeError, match="needs to be castable to float"
        ):
            BlackmanWaveform(100, "the area")

    def test_negative_area_flips_sign(self):
        wf = BlackmanWaveform(200, -np.pi)
        assert np.isclose(float(wf.integral), -np.pi)
        assert np.all(np.asarray(wf.samples, dtype=float) <= 0)

    def test_from_max_val(self):
        for max_val, area in [(2.0, np.pi / 2), (-2.0, -np.pi / 2)]:
            wf = BlackmanWaveform.from_max_val(max_val, area)
            samples = np.asarray(wf.samples, dtype=float)
            assert np.isclose(float(wf.integral), area)
            if max_val > 0:
                assert samples.max() <= max_val
            else:
                assert samples.min() >= max_val
        with pytest.raises(ValueError, match="matching signs"):
            BlackmanWaveform.from_max_val(-2.0, np.pi / 2)


class TestKaiser:
    def test_area_and_beta(self):
        wf = KaiserWaveform(200, np.pi, beta=10.0)
        assert np.isclose(float(wf.integral), np.pi)
        with pytest.raises(
            ValueError, match="must be greater than 0"
        ):
            KaiserWaveform(100, 1.0, beta=-1.0)

    def test_from_max_val(self):
        wf = KaiserWaveform.from_max_val(1.0, np.pi / 4)
        samples = np.asarray(wf.samples, dtype=float)
        assert samples.max() <= 1.0
        assert np.isclose(float(wf.integral), np.pi / 4)


class TestInterpolated:
    def test_default_times_uniform(self):
        wf = InterpolatedWaveform(100, [0.0, 1.0, 0.0])
        # data_points are (t[ns], value) pairs, times spread uniformly
        pts = np.asarray(wf.data_points, dtype=float)
        np.testing.assert_allclose(pts[:, 1], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(pts[:, 0], [0.0, 49.5, 99.0])
        samples = np.asarray(wf.samples, dtype=float)
        assert np.isclose(samples[0], 0.0)
        assert np.isclose(samples[-1], 0.0)
        assert samples.max() <= 1.0 + 1e-9  # PCHIP doesn't overshoot

    def test_explicit_times(self):
        wf = InterpolatedWaveform(
            100, [0.0, 1.0], times=[0.0, 1.0]
        )
        assert np.isclose(wf.last_value, 1.0)
        with pytest.raises(
            ValueError, match="must match the number of `values`"
        ):
            InterpolatedWaveform(100, [0, 1, 0], times=[0, 1])


def test_ops():
    assert -constant == ConstantWaveform(100, 3)
    assert ramp * 2 == RampWaveform(2e3, 10, 38)
    assert --custom == custom
    assert blackman / 2 == BlackmanWaveform(40, np.pi / 2)
    assert composite * 1 == composite
    with pytest.raises(ZeroDivisionError):
        constant / 0


def test_legacy_serialization_roundtrip():
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


def test_get_item_errors():
    duration = constant.duration
    with pytest.raises(IndexError, match="must be in the range"):
        constant[duration]
    with pytest.raises(IndexError, match="must be in the range"):
        constant[-duration - 1]
    with pytest.raises(
        IndexError, match="step of the slice must be None or 1"
    ):
        constant[0:1:2]


@pytest.mark.parametrize(
    "wf", [blackman, composite, constant, custom, kaiser, ramp, interp]
)
def test_get_item_matches_numpy_slicing(wf):
    duration = wf.duration
    samples = np.asarray(wf.samples, dtype=float)
    q1, q3 = duration // 4, duration * 3 // 4
    for i in (-duration, -1, 0, duration - 1, q1):
        assert np.isclose(float(wf[i]), samples[i])
    for sl in (
        slice(0, duration),
        slice(0, -1),
        slice(0, None),
        slice(-1, None),
        slice(None, duration),
        slice(None, None),
        slice(q1, q3),
        slice(-q3, -q1),
        slice(None, duration * 2),
        slice(-duration * 2, None),
        slice(duration // 2, duration * 2),
    ):
        np.testing.assert_allclose(
            np.asarray(wf[sl], dtype=float), samples[sl]
        )
    assert wf[2:1].size == 0
    assert wf[duration * 2 :].size == 0


def test_modulation_through_channel():
    ch = Rydberg.Global(
        2 * np.pi * 20, 2 * np.pi * 2.5, mod_bandwidth=4
    )
    mod = np.asarray(
        constant.modulated_samples(ch).as_array(detach=True)
    )
    np.testing.assert_array_equal(
        mod, np.asarray(ch.modulate(constant.samples), dtype=float)
    )
    assert constant.modulation_buffers(ch) == (
        ch.rise_time,
        ch.rise_time,
    )
    assert len(mod) == constant.duration + 2 * ch.rise_time
    # The Gaussian filter conserves area but caps the peak
    assert np.isclose(np.sum(mod) * 1e-3, float(constant.integral))
    assert np.abs(mod).max() < np.abs(float(constant[0]))


def test_draw_smoke(patch_plt_show):
    ch = Rydberg.Global(
        2 * np.pi * 20, 2 * np.pi * 2.5, mod_bandwidth=4
    )
    composite.draw()
    blackman.draw(output_channel=ch)
    interp.draw(output_channel=ch)


def test_truncated():
    trunc = constant.truncated(60)
    assert trunc.duration == 60
    np.testing.assert_array_equal(
        np.asarray(trunc.samples, dtype=float),
        np.asarray(constant.samples, dtype=float)[:60],
    )


def test_jax_grad_through_samples():
    import jax
    import jax.numpy as jnp

    def total(area):
        wf = BlackmanWaveform(600, area)
        return jnp.sum(wf.samples.as_tensor()) * 1e-3

    g = jax.grad(total)(jnp.float32(2.0))
    assert np.isclose(float(g), 1.0, atol=1e-5)
