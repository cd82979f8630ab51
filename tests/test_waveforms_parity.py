"""Waveform sample parity against the importable reference."""

from __future__ import annotations

import sys

import numpy as np
import pytest

import pulser_tpu as tpu

sys.path.insert(0, "/root/reference/pulser-core")
ref = pytest.importorskip("pulser")


_CASES = [
    ("ConstantWaveform", (200, 2.5)),
    ("RampWaveform", (300, -3.0, 5.0)),
    ("BlackmanWaveform", (500, np.pi)),
    ("KaiserWaveform", (400, np.pi, 10.0)),
    ("InterpolatedWaveform", (300, [0.0, 2.0, 0.5, 3.0])),
    ("CustomWaveform", (np.linspace(0, 1.0, 120),)),
]


@pytest.mark.parametrize("cls_name,args", _CASES)
def test_waveform_samples_bit_exact(cls_name, args):
    mine = getattr(tpu, cls_name)(*args)
    theirs = getattr(ref, cls_name)(*args)
    np.testing.assert_array_equal(
        np.asarray(mine.samples, dtype=float),
        np.asarray(theirs.samples, dtype=float),
    )
    assert mine.duration == theirs.duration
    np.testing.assert_allclose(
        float(mine.integral), float(theirs.integral)
    )


def test_composite_waveform_parity():
    mine = tpu.CompositeWaveform(
        tpu.ConstantWaveform(100, 1.0),
        tpu.RampWaveform(200, 1.0, 0.0),
    )
    theirs = ref.CompositeWaveform(
        ref.ConstantWaveform(100, 1.0),
        ref.RampWaveform(200, 1.0, 0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(mine.samples, dtype=float),
        np.asarray(theirs.samples, dtype=float),
    )


def test_blackman_from_max_val_parity():
    mine = tpu.BlackmanWaveform.from_max_val(2.0, np.pi / 2)
    theirs = ref.BlackmanWaveform.from_max_val(2.0, np.pi / 2)
    assert mine.duration == theirs.duration
    np.testing.assert_array_equal(
        np.asarray(mine.samples, dtype=float),
        np.asarray(theirs.samples, dtype=float),
    )


def test_waveform_modulation_parity():
    ch_mine = tpu.channels.Rydberg.Global(
        None, None, mod_bandwidth=8.0
    )
    ch_ref = ref.channels.Rydberg.Global(
        None, None, mod_bandwidth=8.0
    )
    wf_mine = tpu.BlackmanWaveform(500, np.pi)
    wf_ref = ref.BlackmanWaveform(500, np.pi)
    np.testing.assert_allclose(
        np.asarray(wf_mine.modulated_samples(ch_mine), dtype=float),
        np.asarray(wf_ref.modulated_samples(ch_ref), dtype=float),
        atol=1e-12,
    )


def test_waveform_gradients_flow():
    """d(area)/d(value) through a JAX-traced waveform."""
    import jax

    def area(v):
        wf = tpu.ConstantWaveform(100, v)
        return (
            tpu.math.AbstractArray(wf.samples.as_tensor()).as_tensor()
        ).sum() * 1e-3

    g = jax.grad(area)(2.0)
    np.testing.assert_allclose(float(g), 0.1, rtol=1e-6)
