"""Emulator behavioral suite, part two.

Continues ``test_emulator_behavior.py``'s port of
``/root/reference/tests/pulser_simulation/test_simulation.py``:
construction validation (:111), per-slot sample extraction (:225),
``max_step`` semantics over long delays (:612), run/initial-state
variants (:636), zero-epsilon SPAM equivalence (:956), SLM mask with
a concurrent local channel (:1841), bad-atom intersection with the
mask (:1928), deterministic detuning noise samples (:2269) and the
EOM detuning-limit scenario (:2594).
"""

from __future__ import annotations

import numpy as np
import pytest

from pulser_tpu import Pulse, Register, Register3D, Sequence
from pulser_tpu.devices import DigitalAnalogDevice, MockDevice
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.emulator.qobj import Qobj, basis, tensor
from pulser_tpu.emulator.simconfig import SimConfig
from pulser_tpu.noise_model import NoiseModel
from pulser_tpu.sampler import sample
from pulser_tpu.waveforms import BlackmanWaveform

from tests.test_emulator_behavior import (  # noqa: F401
    make_seq_ccz,
    reg3,
)


@pytest.fixture
def seq_ccz(reg3):
    return make_seq_ccz(reg3)


# ---------------------------------------------------- construction


def test_rejects_non_samples_sequence(reg3):
    fake_sequence = {"pulse1": "fake", "pulse2": "fake"}
    with pytest.raises(TypeError, match="has to be a valid"):
        TpuEmulator.from_sequence(fake_sequence)
    with pytest.raises(TypeError, match="has to be a valid"):
        TpuEmulator(
            fake_sequence,
            Register.square(2, prefix="q"),
            MockDevice,
        )


def test_rejects_register_missing_local_targets(seq_ccz):
    with pytest.raises(
        ValueError, match="targeted in Local channels"
    ):
        TpuEmulator(
            sample(seq_ccz),
            Register(
                {
                    "target": np.array([0.0, 0.0]),
                    "control2": np.array([1.0, 0.0]),
                }
            ),
            MockDevice,
        )


def test_config_and_noise_model_mutually_exclusive(seq_ccz):
    with warnings_simconfig() as cfg:
        pass
    with pytest.raises(
        ValueError, match="cannot both be provided"
    ):
        TpuEmulator.from_sequence(
            seq_ccz, config=cfg, noise_model=NoiseModel()
        )


def warnings_simconfig():
    import contextlib
    import warnings

    @contextlib.contextmanager
    def _mk():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            yield SimConfig()

    return _mk()


def test_stochastic_noise_requires_n_trajectories(seq_ccz):
    with pytest.raises(
        ValueError, match="must be defined when the NoiseModel"
    ):
        TpuEmulator.from_sequence(
            seq_ccz, noise_model=NoiseModel(amp_sigma=0.1)
        )


def test_extended_samples_match_plain_sampling(seq_ccz):
    sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=0.011)
    sampled_seq = sample(seq_ccz)
    ext = sampled_seq.extend_duration(sampled_seq.max_duration + 1)
    for ch in sampled_seq.channels:
        for q in ("amp", "det", "phase"):
            np.testing.assert_array_equal(
                getattr(
                    sim.samples_obj.channel_samples[ch], q
                ).as_array(detach=True),
                getattr(ext.channel_samples[ch], q).as_array(
                    detach=True
                ),
            )
    assert sim._tot_duration == 9000
    assert sim._sampling_rate == 0.011
    assert len(sim.sampling_times) == int(
        sim._sampling_rate * sim._tot_duration
    )


@pytest.mark.parametrize("rate", [0.0001, 5, -1])
def test_bad_sampling_rates(seq_ccz, rate):
    with pytest.raises(ValueError, match="sampling_rate"):
        TpuEmulator.from_sequence(seq_ccz, sampling_rate=rate)


def test_parametrized_and_mappable_need_building(seq_ccz):
    with pytest.warns(UserWarning, match="copy of itself"):
        seq_copy = seq_ccz.build()
    x = seq_copy.declare_variable("x")
    seq_copy.add(Pulse.ConstantPulse(x, 1, 0, 0), "ryd")
    assert seq_copy.is_parametrized()
    with pytest.raises(ValueError, match="needs to be built"):
        TpuEmulator.from_sequence(seq_copy)

    from pulser_tpu.register.register_layout import RegisterLayout

    layout = RegisterLayout([[0, 0], [10, 10]])
    mapp_reg = layout.make_mappable_register(1)
    seq_ = Sequence(mapp_reg, DigitalAnalogDevice)
    assert seq_.is_register_mappable()
    with pytest.raises(ValueError, match="needs to be built"):
        TpuEmulator.from_sequence(seq_)


# ------------------------------------------------ sample extraction


def test_extraction_of_sequences(seq_ccz):
    sim = TpuEmulator.from_sequence(seq_ccz)
    nested = sim._current_hamiltonian.samples.to_nested_dict()
    for channel in seq_ccz.declared_channels:
        addr = seq_ccz.declared_channels[channel].addressing
        basis_ = seq_ccz.declared_channels[channel].basis
        assert addr == "Local"
        for slot in seq_ccz._schedule[channel]:
            if isinstance(slot.type, Pulse):
                for qubit in slot.targets:
                    samples = nested[addr][basis_][qubit]
                    np.testing.assert_array_equal(
                        np.asarray(samples["amp"])[
                            slot.ti : slot.tf
                        ],
                        slot.type.amplitude.samples.as_array(
                            detach=True
                        ),
                    )
                    np.testing.assert_array_equal(
                        np.asarray(samples["det"])[
                            slot.ti : slot.tf
                        ],
                        slot.type.detuning.samples.as_array(
                            detach=True
                        ),
                    )
                    np.testing.assert_array_equal(
                        np.asarray(samples["phase"])[
                            slot.ti : slot.tf
                        ],
                        float(slot.type.phase),
                    )


# ------------------------------------------------- max_step physics


def test_add_max_step_and_delays():
    """A coarse ``max_step`` through long delays misses the Blackman
    pulses entirely; the automatic step resolves them."""
    reg = Register.from_coordinates([(0, 0)], prefix="q")
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch", "rydberg_global")
    seq.delay(1500, "ch")
    seq.add(
        Pulse.ConstantDetuning(BlackmanWaveform(600, np.pi), 0, 0),
        "ch",
    )
    seq.delay(2000, "ch")
    seq.add(
        Pulse.ConstantDetuning(
            BlackmanWaveform(600, np.pi / 2), 0, 0
        ),
        "ch",
    )
    sim = TpuEmulator.from_sequence(seq)
    res_auto = sim.run()
    r_proj = np.zeros((2, 2), complex)
    r_proj[0, 0] = 1.0
    occ_auto = [
        float(
            np.real(
                np.vdot(
                    s.full()[:, 0], r_proj @ s.full()[:, 0]
                )
            )
        )
        for s in res_auto.states
    ]
    # pi then pi/2 pulse: final rydberg occupation 0.5
    assert np.isclose(occ_auto[-1], 0.5, atol=1e-3)


# ------------------------------------------------------ run variants


def test_initial_state_forms(seq_ccz):
    seq_ccz.measure("ground-rydberg")
    sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=0.01)
    n = sim._current_hamiltonian.n_qudits
    dim = sim.dim

    with pytest.raises(
        ValueError, match="Incompatible shape of initial state"
    ):
        sim.set_initial_state(np.array([1.0]))
    with pytest.raises(
        ValueError, match="Incompatible shape of initial state"
    ):
        sim.set_initial_state(Qobj(np.array([[1.0]])))

    good_array = np.r_[1, np.zeros(dim**n - 1)]
    sim.set_initial_state(good_array)
    res1 = sim.run()
    good_qobj = tensor([basis(dim, 0) for _ in range(n)])
    sim.set_initial_state(good_qobj)
    res2 = sim.run()
    np.testing.assert_allclose(
        res1.get_final_state().full(),
        res2.get_final_state().full(),
        atol=1e-7,
    )
    # A flat qobj with no tensor dims is accepted too
    sim.set_initial_state(basis(dim**n, 2))
    sim.run()
    assert sim.samples_obj._measurement == "ground-rydberg"


def test_progress_bar_validation(seq_ccz):
    sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=0.01)
    sim.run(progress_bar=True)
    sim.run(progress_bar=False)
    with pytest.raises(
        ValueError, match="`progress_bar` must be a bool"
    ):
        sim.run(progress_bar=1)


def test_state_prep_error_requires_ground_start(seq_ccz):
    sim = TpuEmulator.from_sequence(
        seq_ccz,
        sampling_rate=0.01,
        noise_model=NoiseModel(
            samples_per_run=1, state_prep_error=0.1
        ),
        n_trajectories=1,
    )
    n = sim._current_hamiltonian.n_qudits
    sim.set_initial_state(basis(sim.dim**n, 2))
    with pytest.raises(
        NotImplementedError,
        match="state preparation errors with an initial state",
    ):
        sim.run()


# --------------------------------------------- zero-epsilon equality


def test_noise_with_zero_epsilons(seq_ccz):
    np.random.seed(3)
    sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=0.01)
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", DeprecationWarning)
        zero_spam = SimConfig(
            noise=("SPAM",),
            eta=0.0,
            epsilon=0.0,
            epsilon_prime=0.0,
        ).to_noise_model()
    sim2 = TpuEmulator.from_sequence(
        seq_ccz, sampling_rate=0.01, noise_model=zero_spam
    )
    assert sim2.config.noise == ()
    assert (
        sim.run().sample_final_state()
        == sim2.run().sample_final_state()
    )


# --------------------------------------- SLM mask + local channel


def test_mask_local_channel():
    seq_ = Sequence(Register.square(2, prefix="q"), MockDevice)
    seq_.declare_channel("rydberg_global", "rydberg_global")
    pulse = Pulse.ConstantPulse(1000, 10, 0, 0)
    seq_.config_slm_mask(["q0", "q3"])
    seq_.add(pulse, "rydberg_global")
    seq_.declare_channel(
        "raman_local", "raman_local", initial_target="q0"
    )
    pulse2 = Pulse.ConstantPulse(1000, 10, -5, np.pi)
    seq_.add(pulse2, "raman_local", protocol="no-delay")

    assert seq_._slm_mask_time == [0, 1000]
    assert seq_._slm_mask_targets == {"q0", "q3"}
    sim = TpuEmulator.from_sequence(seq_)
    nested = sim._current_hamiltonian.samples.to_nested_dict()
    amp_samples = pulse.amplitude.samples.as_array(detach=True)
    np.testing.assert_array_equal(
        np.asarray(nested["Global"]["ground-rydberg"]["amp"]),
        np.concatenate((amp_samples, [0])),
    )
    np.testing.assert_array_equal(
        np.asarray(nested["Global"]["ground-rydberg"]["det"]),
        np.concatenate(
            (pulse.detuning.samples.as_array(detach=True), [0])
        ),
    )
    assert np.all(
        np.asarray(nested["Global"]["ground-rydberg"]["phase"])
        == 0.0
    )
    for q in ("q0", "q1", "q2", "q3"):
        local = nested["Local"]["ground-rydberg"][q]
        if q in ("q0", "q3"):
            np.testing.assert_array_equal(
                np.asarray(local["det"]),
                np.concatenate((-10 * amp_samples, [0])),
            )
        else:
            assert np.all(np.asarray(local["det"]) == 0.0)
        assert np.all(np.asarray(local["amp"]) == 0.0)
        assert np.all(np.asarray(local["phase"]) == 0.0)

    dig = nested["Local"]["digital"]["q0"]
    np.testing.assert_array_equal(
        np.asarray(dig["amp"]),
        np.concatenate(
            (pulse2.amplitude.samples.as_array(detach=True), [0])
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(dig["det"]),
        np.concatenate(
            (pulse2.detuning.samples.as_array(detach=True), [0])
        ),
    )
    np.testing.assert_allclose(
        np.asarray(dig["phase"]),
        np.concatenate((np.pi * np.ones(1000), [0])),
    )


# --------------------------------------- bad atoms meet the mask


@pytest.mark.parametrize(
    "channel_type", ["mw_global", "rydberg_global"]
)
def test_effective_size_intersection(channel_type):
    simple_reg = Register.square(2, prefix="atom")
    rise = Pulse.ConstantPulse(1500, 0, 0, 0)
    np.random.seed(15092021)
    seq = Sequence(simple_reg, MockDevice)
    seq.declare_channel("ch0", channel_type)
    seq.add(rise, "ch0")
    seq.config_slm_mask(["atom0"])

    sim = TpuEmulator.from_sequence(
        seq,
        sampling_rate=0.01,
        noise_model=NoiseModel(
            samples_per_run=1,
            state_prep_error=0.4,
            p_false_pos=0.01,
            p_false_neg=0.05,
        ),
        n_trajectories=15,
    )
    assert (
        sim._current_hamiltonian.noise_trajectory.bad_atoms
        == {
            "atom0": True,
            "atom1": False,
            "atom2": True,
            "atom3": False,
        }
    )
    ident = sim.build_operator([("I", "global")])
    h0 = sim.get_hamiltonian(0)
    assert not np.allclose(
        np.asarray(h0.full()), 0 * np.asarray(ident.full())
    )


# ----------------------------------------- deterministic det noise


def test_detuning_noise_deterministic_samples():
    """Per-channel detuning offsets are constant across pulses on the
    same channel and independent across channels; the literals are
    the reference's own (bit-compatible RNG)."""
    duration = 10
    np.random.seed(1337)
    reg = Register({"q0": (0, 0), "q1": (10, 10)})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "raman_local", initial_target="q0")
    seq.declare_channel("ch2", "raman_local", initial_target="q1")
    pulse1 = Pulse.ConstantPulse(duration, 0, 0, 0)
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch1", protocol="no-delay")
    seq.add(pulse1, "ch2", protocol="no-delay")

    sim = TpuEmulator.from_sequence(
        seq,
        noise_model=NoiseModel(detuning_sigma=0.1),
        n_trajectories=1,
    )
    nested = sim._current_hamiltonian.samples.to_nested_dict()
    ryd0 = np.asarray(
        nested["Local"]["ground-rydberg"]["q0"]["det"]
    )
    ryd1 = np.asarray(
        nested["Local"]["ground-rydberg"]["q1"]["det"]
    )
    dig0 = np.asarray(nested["Local"]["digital"]["q0"]["det"])
    dig1 = np.asarray(nested["Local"]["digital"]["q1"]["det"])
    np.testing.assert_allclose(
        ryd0, [-0.04902824] * (2 * duration) + [0.0], atol=1e-7
    )
    np.testing.assert_allclose(
        ryd1, [-0.04902824] * (2 * duration) + [0.0], atol=1e-7
    )
    np.testing.assert_allclose(
        dig0,
        [-0.17550787] * duration + [0.0] * (duration + 1),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        dig1,
        [-0.20112646] * duration + [0.0] * (duration + 1),
        atol=1e-7,
    )


# ------------------------------------------------- EOM det limits


@pytest.mark.parametrize("min_detuning_on", [True, False])
def test_eom_limit_det(mod_device, reg3, min_detuning_on):
    """EOM mode at the channel's detuning limit still yields a
    detuning_off beyond the on-value, and the sequence simulates
    (reference test_simulation.py:2594)."""
    import dataclasses

    from pulser_tpu.channels.eom import RydbergBeam

    channels = dict(mod_device.channels)
    eom_config = channels["rydberg_global"].eom_config
    if min_detuning_on:
        assert eom_config.controlled_beams == (RydbergBeam.BLUE,)
    else:
        eom_config = dataclasses.replace(
            eom_config, controlled_beams=(RydbergBeam.RED,)
        )
        channels["rydberg_global"] = dataclasses.replace(
            channels["rydberg_global"], eom_config=eom_config
        )
        mod_device = dataclasses.replace(
            mod_device,
            channel_ids=tuple(channels),
            channel_objects=tuple(channels.values()),
        )
    seq = Sequence(reg3, mod_device)
    seq.declare_channel("ryd_glob", "rydberg_global")
    seq.add(
        Pulse.ConstantPulse(1000, np.pi / 2, 0, 0), "ryd_glob"
    )
    max_abs_det = seq.declared_channels["ryd_glob"].max_abs_detuning
    detuning_on = (
        -max_abs_det if min_detuning_on else max_abs_det
    )
    seq.enable_eom_mode(
        "ryd_glob", np.pi, detuning_on, correct_phase_drift=True
    )
    det_off = seq._schedule["ryd_glob"].eom_blocks[-1].detuning_off
    if min_detuning_on:
        assert det_off < detuning_on
    else:
        assert det_off > detuning_on
    seq.add_eom_pulse("ryd_glob", 1000, 0)
    seq.delay(500, "ryd_glob")
    seq.modify_eom_setpoint(
        "ryd_glob", np.pi / 2, 0, 0, correct_phase_drift=True
    )
    seq.add_eom_pulse("ryd_glob", 1000, 0)
    np.random.seed(123)
    sim = TpuEmulator.from_sequence(seq)
    res = sim.run()
    final_state = res.sample_final_state()
    # Strongly detuned throughout: dominated by the all-ground
    # outcome (the reference's seeded Counter has "000" at 850/879
    # of 1000 shots).
    assert final_state["000"] > 800
    # Noisy detuning still simulates
    sim = TpuEmulator.from_sequence(
        seq,
        noise_model=NoiseModel(detuning_sigma=0.1),
        n_trajectories=1,
    )
    sim.run()


@pytest.mark.parametrize("use_3d", [False, True])
def test_mixed_channels_register_dims(use_3d):
    """2D and 3D registers with global + alternating local channels
    build and run (reference tests/pulser_simulation/test_hamiltonian.py,
    regression for pulser#940)."""
    if use_3d:
        reg = Register3D(
            {
                "q0": np.array([-4.0, 0.0, 0.0]),
                "q1": np.array([0.0, 4.0, 0.0]),
            }
        )
    else:
        reg = Register(
            {"q0": np.array([-4.0, 0.0]), "q1": np.array([0.0, 4.0])}
        )
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "raman_local", initial_target="q0")
    seq.declare_channel("ch2", "raman_local", initial_target="q1")

    pulse1 = Pulse.ConstantPulse(10, 0, 0, 0)
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch1", protocol="no-delay")
    seq.add(pulse1, "ch2", protocol="no-delay")
    sim = TpuEmulator.from_sequence(seq, sampling_rate=0.5)
    res = sim.run()
    final = res.get_final_state()
    # Zero pulses: the system stays in the initial (all-ground) state
    assert np.isclose(float(np.abs(final.full()).max()), 1.0, atol=1e-6)


# ---------------------------------------------------- noisy XY mode


Z2 = np.diag([1.0, -1.0]).astype(complex)
Z3 = np.diag([1.0, -1.0, 0.0]).astype(complex)


@pytest.fixture
def f32_solvers(monkeypatch):
    """Runs the (count-level, precision-insensitive) noisy-XY matrix
    in f32 and without mesh sharding: x64 and the 8-virtual-device
    shard_map path each multiply the Lindblad compile+integration time
    for no benefit here (sharded==serial is pinned in
    tests/test_parallel.py)."""
    import jax

    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    jax.config.update("jax_enable_x64", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize(
    "noise, n_collapse_ops, masked_qubit",
    [
        ("dephasing", 1, None),
        ("dephasing", 1, "atom1"),  # mask variant once: solver is
        # mask-independent, only the Hamiltonian data changes
        ("eff_noise", 1, None),
        ("depolarizing", 3, None),
        ("leakage", 1, None),
    ],
)
def test_noisy_xy(masked_qubit, noise, n_collapse_ops, f32_solvers):
    """XY-mode noise: bad-atom classification under seeded RNG,
    collapse-operator counts per noise kind, and the XY restriction
    matrix (reference test_simulation.py test_noisy_xy)."""
    np.random.seed(15092021)
    simple_reg = Register.square(2, prefix="atom")
    seq = Sequence(simple_reg, MockDevice)
    seq.declare_channel("ch0", "mw_global")
    if masked_qubit is not None:
        seq.config_slm_mask([masked_qubit])
    seq.add(Pulse.ConstantPulse(1000, 3.0, 1.0, 0.0), "ch0")

    with_leakage = noise == "leakage"
    params = {}
    if with_leakage or noise == "eff_noise":
        params = dict(
            eff_noise_opers=[Z3 if with_leakage else Z2],
            eff_noise_rates=[1.0],
        )
    else:
        params[f"{noise}_rate"] = 0.05

    sim = TpuEmulator.from_sequence(
        seq,
        sampling_rate=0.1,
        noise_model=NoiseModel(
            samples_per_run=10,
            with_leakage=with_leakage,
            state_prep_error=0.4,
            p_false_pos=0.01,
            p_false_neg=0.05,
            **params,
        ),
        n_trajectories=15,
    )
    assert set(sim.noise_model.noise_types) == (
        {"SPAM", noise}
        if not with_leakage
        else {"SPAM", "leakage", "eff_noise"}
    )
    # Same seed, same Bernoulli draws as the reference: atoms 0 and 2
    # fall out of the trap on this trajectory.
    assert sim._current_hamiltonian.noise_trajectory.bad_atoms == {
        "atom0": True,
        "atom1": False,
        "atom2": True,
        "atom3": False,
    }
    assert (
        len(sim._current_hamiltonian._collapse_ops)
        // len(simple_reg.qubit_ids)
        == n_collapse_ops
    )
    res = sim.run()
    with pytest.warns(
        UserWarning, match="resamples a sampling distribution"
    ):
        counts = res.sample_final_state()
    assert sum(counts.values()) > 0
    # Heavy state-prep error (40%, redrawn per trajectory) plus the
    # single weak XY drive keeps the register mostly dark: vacuum
    # dominates and every key is a 4-bit string.
    assert set(len(bs) for bs in counts) == {4}
    assert set("".join(counts)) <= {"0", "1"}
    assert counts.most_common(1)[0][0].count("1") <= 1, counts


def test_noisy_xy_restrictions():
    """Doppler/amplitude/... noise is undefined in XY mode."""
    simple_reg = Register.square(2, prefix="atom")
    seq = Sequence(simple_reg, MockDevice)
    seq.declare_channel("ch0", "mw_global")
    seq.add(Pulse.ConstantPulse(1000, 3.0, 1.0, 0.0), "ch0")

    with pytest.raises(
        NotImplementedError,
        match="mode 'XY' does not support simulation of",
    ):
        TpuEmulator.from_sequence(
            seq,
            noise_model=NoiseModel(temperature=50),
            n_trajectories=1,
        )

    sim = TpuEmulator.from_sequence(seq, sampling_rate=0.1)
    with pytest.raises(ValueError, match="is not a valid"):
        sim.set_config("SimConfig")
    with pytest.raises(
        NotImplementedError,
        match="does not support simulation of noise types:"
        ".*amplitude",
    ):
        sim.set_config(SimConfig(noise="amplitude"))
