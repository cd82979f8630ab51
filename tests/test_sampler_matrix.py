"""Sampler behavior matrix: delays, SLM arrays, phase jumps, repr.

Complements tests/test_sampler.py and test_ref_parity_sampling.py
with the reference's delay-only nested-dict matrix, exact SLM sample
arrays, extend_duration semantics and the phase-jump-time sampling
schedule (reference tests/test_sequence_sampler.py:79-560).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.sampler import sample


def _seq_rydberg():
    reg = tpu.Register.from_coordinates(
        np.array([[0.0, 0.0], [2.0, 0.0]]), prefix="q"
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "rydberg_local", initial_target="q0")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(100, np.pi / 8), 0.0, 0.0
        ),
        "ch0",
    )
    seq.delay(20, "ch0")
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            0.0, tpu.BlackmanWaveform(100, np.pi / 8), 0.0
        ),
        "ch0",
    )
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(100, np.pi / 8), 0.0, 0.0
        ),
        "ch1",
    )
    seq.target("q1", "ch1")
    seq.add(
        tpu.Pulse.ConstantAmplitude(
            1.0, tpu.BlackmanWaveform(100, np.pi / 8), 0.0
        ),
        "ch1",
    )
    seq.target(["q0", "q1"], "ch1")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(100, np.pi / 8), 0.0, 0.0
        ),
        "ch1",
    )
    seq.measure()
    return seq


def _seq_with_slm(ch_name):
    q_dict = {
        "batman": np.array([-4.0, 0.0]),  # masked
        "superman": np.array([4.0, 0.0]),  # unmasked
    }
    reg = tpu.Register(q_dict)
    seq = tpu.Sequence(
        reg, replace(tpu.MockDevice, dmm_objects=(DMM(),))
    )
    seq.declare_channel("ch0", ch_name)
    seq.config_slm_mask(["batman"])
    for _ in range(2):
        seq.add(
            tpu.Pulse.ConstantDetuning(
                tpu.BlackmanWaveform(200, np.pi / 2), 0.0, 0.0
            ),
            "ch0",
        )
    seq.measure(
        "ground-rydberg" if ch_name == "rydberg_global" else "XY"
    )
    return seq


def _assert_nested(got, want):
    """Every entry in `want` must match `got`.

    Mirrors the reference's assert_nested_dict_equality: extra empty
    pre-seeded entries in `got` (the XY scaffold) are tolerated.
    """
    assert set(want) <= set(got)
    for addr in want:
        for basis in want[addr]:
            g, w = got[addr][basis], want[addr][basis]
            assert set(w) <= set(g)
            for key in w:
                if isinstance(w[key], dict):
                    for qty in w[key]:
                        np.testing.assert_allclose(
                            np.asarray(g[key][qty], dtype=float),
                            w[key][qty],
                            atol=1e-12,
                            err_msg=f"{addr}/{basis}/{key}/{qty}",
                        )
                else:
                    np.testing.assert_allclose(
                        np.asarray(g[key], dtype=float),
                        w[key],
                        atol=1e-12,
                        err_msg=f"{addr}/{basis}/{key}",
                    )


def test_parametrized_sequence_not_samplable():
    seq = _seq_rydberg()
    var = seq.declare_variable("var")
    seq.delay(var, "ch0")
    assert seq.is_parametrized()
    with pytest.raises(
        NotImplementedError, match="Parametrized sequences"
    ):
        sample(seq)


@pytest.mark.parametrize("local_only", [True, False])
@pytest.mark.parametrize(
    "channel_name, basis",
    [
        ("rydberg_global", "ground-rydberg"),
        ("raman_global", "digital"),
        ("mw_global", "XY"),
    ],
)
def test_delay_only(local_only, channel_name, basis):
    seq = tpu.Sequence(tpu.Register({"q0": (0, 0)}), tpu.MockDevice)
    seq.declare_channel("ch0", channel_name)
    seq.delay(16, "ch0")
    samples = sample(seq)
    assert samples.channel_samples["ch0"].initial_targets == {"q0"}

    qty_dict = {
        "amp": np.zeros(16),
        "det": np.zeros(16),
        "phase": np.zeros(16),
    }
    if local_only:
        want = {"Local": {basis: {"q0": qty_dict}}, "Global": {}}
    else:
        want = {"Global": {basis: qty_dict}, "Local": {}}
    _assert_nested(
        samples.to_nested_dict(all_local=local_only), want
    )
    assert samples.used_bases == set()
    expected_basis = ["u", "d"] if basis == "XY" else ["r", "g"]
    assert samples.eigenbasis == expected_basis


def test_one_pulse_exact_samples():
    reg = tpu.Register.square(1, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    N = 1000
    amp_wf = tpu.BlackmanWaveform(N, np.pi)
    det_wf = tpu.RampWaveform(N, -np.pi / 2, np.pi / 2)
    phase = 1.234
    seq.add(tpu.Pulse(amp_wf, det_wf, phase), "ch0")
    seq.measure()

    got = sample(seq).to_nested_dict()["Global"]["ground-rydberg"]
    np.testing.assert_array_equal(
        np.asarray(got["amp"], dtype=float),
        np.asarray(amp_wf.samples, dtype=float),
    )
    np.testing.assert_array_equal(
        np.asarray(got["det"], dtype=float),
        np.asarray(det_wf.samples, dtype=float),
    )
    np.testing.assert_array_equal(
        np.asarray(got["phase"], dtype=float), np.full(N, phase)
    )


def test_slm_samples_xy():
    seq = _seq_with_slm("mw_global")
    a_samples = np.asarray(
        tpu.BlackmanWaveform(200, np.pi / 2).samples, dtype=float
    )
    total = seq.get_duration()

    def z():
        return np.zeros(total)

    want = {
        "Global": {"XY": {"amp": z(), "det": z(), "phase": z()}},
        "Local": {
            "XY": {"superman": {"amp": z(), "det": z(), "phase": z()}}
        },
    }
    # In XY the masked first pulse is rerouted: only the unmasked
    # qubit sees it (locally), the register-wide pulse starts at 200.
    want["Global"]["XY"]["amp"][200:400] = a_samples
    want["Local"]["XY"]["superman"]["amp"][0:200] = a_samples
    samples = sample(seq)
    _assert_nested(samples.to_nested_dict(), want)
    assert samples.used_bases == {"XY"}
    assert samples.eigenbasis == ["u", "d"]


def test_slm_samples_ising():
    seq = _seq_with_slm("rydberg_global")
    a_samples = np.asarray(
        tpu.BlackmanWaveform(200, np.pi / 2).samples, dtype=float
    )
    total = seq.get_duration()

    def z():
        return np.zeros(total)

    want = {
        "Global": {
            "ground-rydberg": {"amp": z(), "det": z(), "phase": z()}
        },
        "Local": {
            "ground-rydberg": {
                "superman": {"amp": z(), "det": z(), "phase": z()},
                "batman": {"amp": z(), "det": z(), "phase": z()},
            }
        },
    }
    # In Ising the pulses stay global; the masked qubit receives a
    # large negative DMM detuning during the first pulse instead.
    want["Global"]["ground-rydberg"]["amp"][0:200] = a_samples
    want["Global"]["ground-rydberg"]["amp"][200:400] = a_samples
    want["Local"]["ground-rydberg"]["batman"]["det"][
        0:200
    ] = np.full_like(a_samples, -10 * np.max(a_samples))
    samples = sample(seq)
    _assert_nested(samples.to_nested_dict(), want)
    assert samples.used_bases == {"ground-rydberg"}
    assert samples.eigenbasis == ["r", "g"]


def test_samples_repr():
    samples = sample(_seq_rydberg())
    assert repr(samples) == "\n\n".join(
        [
            f"ch0:\n{samples.samples_list[0]!r}",
            f"ch1:\n{samples.samples_list[1]!r}",
        ]
    )


def test_extend_duration():
    samples = sample(_seq_rydberg())
    short, long = samples.samples_list
    assert short.duration < long.duration
    assert (
        short.extend_duration(short.duration).duration
        == short.duration
    )
    with pytest.raises(ValueError, match="lower duration"):
        long.extend_duration(short.duration)

    extended = short.extend_duration(long.duration)
    assert extended.duration == long.duration
    for qty in ("amp", "det", "phase", "centered_phase"):
        new = np.asarray(getattr(extended, qty), dtype=float)
        old = np.asarray(getattr(short, qty), dtype=float)
        np.testing.assert_array_equal(new[: short.duration], old)
        # Amplitude/detuning pad with 0, phase holds its last value
        np.testing.assert_array_equal(
            new[short.duration :],
            old[-1] if "phase" in qty else 0.0,
        )
    assert extended.slots == short.slots


@pytest.mark.parametrize("custom_phase_jump_time", [None, 0, 100])
def test_phase_jump_sampling(custom_phase_jump_time):
    ryd_ch_obj = replace(
        tpu.AnalogDevice.channels["rydberg_global"],
        max_amp=1000,
        max_abs_detuning=200,
        clock_period=1,
        min_duration=1,
        custom_phase_jump_time=custom_phase_jump_time,
    )
    device = replace(
        tpu.AnalogDevice.to_virtual(),
        channel_objects=(ryd_ch_obj,),
        channel_ids=None,
        min_atom_distance=1,
    )
    reg = tpu.Register.from_coordinates(
        np.array([[0.0, 0.0]]), prefix="q"
    )
    seq = tpu.Sequence(reg, device)
    seq.declare_channel("ch0", "rydberg_global")

    dt = 100
    seq.add(tpu.Pulse.ConstantPulse(dt, 1, 0, phase=1), "ch0")
    seq.add(
        tpu.Pulse.ConstantPulse(dt, 1, 0, phase=2),
        "ch0",
        protocol="no-delay",
    )
    seq.add(tpu.Pulse.ConstantPulse(dt, 1, 0, phase=3), "ch0")
    pulse3_start = seq.get_duration() - dt
    # Detuned delay: phase is ignored
    seq.add(
        tpu.Pulse.ConstantPulse(1000, 0, 1, phase=0),
        "ch0",
        protocol="no-delay",
    )
    end_of_detuned_delay = seq.get_duration()
    seq.add(tpu.Pulse.ConstantPulse(dt, 1, 0, phase=4), "ch0")
    full_duration = seq.get_duration()
    assert end_of_detuned_delay == full_duration - dt

    ph_jump_time = seq.declared_channels["ch0"].phase_jump_time
    if custom_phase_jump_time is not None:
        assert ph_jump_time == custom_phase_jump_time
    else:
        assert ph_jump_time > 0
    expected_phase = np.zeros(full_duration)
    expected_phase[:dt] = 1.0
    transition2_3 = pulse3_start - ph_jump_time
    assert transition2_3 >= 2 * dt
    expected_phase[dt:transition2_3] = 2.0
    transition3_4 = full_duration - dt - ph_jump_time
    expected_phase[transition2_3:transition3_4] = 3.0
    expected_phase[transition3_4:] = 4.0

    ch_samples = sample(seq).channel_samples["ch0"]
    np.testing.assert_array_equal(
        np.asarray(ch_samples.phase, dtype=float), expected_phase
    )
    # Centered phase wraps values above pi
    expected_phase[expected_phase > np.pi] -= 2 * np.pi
    np.testing.assert_array_equal(
        np.asarray(ch_samples.centered_phase, dtype=float),
        expected_phase,
    )


def test_dmm_unsampleable_while_register_mappable():
    """A configured DMM defers its weights to build time; sampling
    before the mappable register is pinned must refuse (reference
    test_sequence_sampler.py:363)."""
    from pulser_tpu.register import MappableRegister, RegisterLayout

    layout = RegisterLayout([[-4, 0], [4, 0], [0, -4], [0, 4]])
    mreg = MappableRegister(layout, "q0", "q1")
    seq = tpu.Sequence(mreg, tpu.MockDevice)
    seq.config_detuning_map(
        mreg.define_detuning_map({i: 0.25 for i in range(4)}), "dmm_0"
    )
    with pytest.raises(
        NotImplementedError,
        match="DMM channel can't be sampled while their register is "
        "mappable",
    ):
        sample(seq)


@pytest.mark.parametrize("all_local", [False, True])
@pytest.mark.parametrize(
    "samples_type", ["abstract", "array", "tensor"]
)
def test_to_nested_dict_samples_type(samples_type, all_local):
    """samples_type picks the array backend of every leaf: numpy,
    JAX (the reference's torch analogue) or AbstractArray."""
    import re

    import jax
    import pulser_tpu.math as pm

    samples = sample(_seq_rydberg())
    with pytest.raises(
        ValueError,
        match=re.escape(
            "'samples_type' must be one of ('abstract', 'array',"
            " 'tensor'), not 'jax'."
        ),
    ):
        samples.to_nested_dict(samples_type="jax")

    expected_type = {
        "tensor": jax.Array,
        "array": np.ndarray,
        "abstract": pm.AbstractArray,
    }[samples_type]

    nested = samples.to_nested_dict(
        samples_type=samples_type, all_local=all_local
    )
    leaves = []
    if all_local:
        assert not nested["Global"]
        for qsamples in nested["Local"]["ground-rydberg"].values():
            leaves.extend(qsamples.values())
    else:
        # The local channel keeps its per-qubit entries; the global
        # one's arrays live under "Global".
        leaves.extend(nested["Global"]["ground-rydberg"].values())
    assert leaves
    for leaf in leaves:
        assert isinstance(leaf, expected_type), type(leaf)
