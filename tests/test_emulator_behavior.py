"""Emulator behavioral suite, mirroring the reference's gold standard.

Ports the semantics of ``/root/reference/tests/pulser_simulation/
test_simulation.py`` (2659 LoC): exact Hamiltonian matrix elements at
given times (``test_get_hamiltonian :476``, XY ``:1430``), basis and
projector construction (``:254``), evaluation-times semantics
(``:721``), per-noise-combination collapse-operator counts and seeded
bitstring histograms (``:990,1115,1214``), SLM-mask equivalences
(``:1730-1841``), bad-atom physics (``:1928``), modulation simulation
(``:2048``), and solver auto-selection (``:2502``).

Seeded histograms are pinned against THIS implementation's RNG (same
draw structure as the reference; exact trajectory parameters are
bit-compatible — verified by the seeded Hamiltonian literals below,
which ARE the reference's own expected values).
"""

from __future__ import annotations

import warnings
from collections import Counter

import numpy as np
import pytest

from pulser_tpu import Pulse, Register, Sequence
from pulser_tpu.devices import (
    AnalogDevice,
    DigitalAnalogDevice,
    MockDevice,
)
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.emulator.simulation import (
    Solver,
    _has_stochastic_noise,
)
from pulser_tpu.noise_model import _LEGACY_DEFAULTS, NoiseModel
from pulser_tpu.sampler import sample
from pulser_tpu.waveforms import BlackmanWaveform, RampWaveform

# --- shared fixtures (mirroring the reference's CCZ setup) --------

DURATION = 1000
PI_PULSE = Pulse.ConstantDetuning(
    BlackmanWaveform(DURATION, np.pi), 0.0, 0
)
TWOPI_PULSE = Pulse.ConstantDetuning(
    BlackmanWaveform(DURATION, 2 * np.pi), 0.0, 0
)
PI_Y_PULSE = Pulse.ConstantDetuning(
    BlackmanWaveform(DURATION, np.pi), 0.0, -np.pi / 2
)

Z2 = np.diag([1.0, -1.0]).astype(complex)
Z3 = np.diag([1.0, -1.0, 0.0]).astype(complex)
LEAK2 = np.zeros((3, 3), complex)
LEAK2[0, 0] = 1.0
LEAK3 = np.zeros((4, 4), complex)
LEAK3[0, 0] = 1.0


@pytest.fixture
def reg3():
    return Register(
        {
            "control1": np.array([-4.0, 0.0]),
            "target": np.array([0.0, 4.0]),
            "control2": np.array([4.0, 0.0]),
        }
    )


def make_seq_digital(reg):
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("raman", "raman_local", "control1")
    seq.add(PI_Y_PULSE, "raman")
    seq.target("target", "raman")
    seq.add(PI_Y_PULSE, "raman")
    seq.target("control2", "raman")
    seq.add(PI_Y_PULSE, "raman")
    return seq


def make_seq_ccz(reg):
    seq = make_seq_digital(reg)
    seq.declare_channel("ryd", "rydberg_local", "control1")
    seq.add(PI_PULSE, "ryd", protocol="wait-for-all")
    seq.target("control2", "ryd")
    seq.add(PI_PULSE, "ryd")
    seq.target("target", "ryd")
    seq.add(TWOPI_PULSE, "ryd")
    seq.target("control2", "ryd")
    seq.add(PI_PULSE, "ryd")
    seq.target("control1", "ryd")
    seq.add(PI_PULSE, "ryd")
    seq.add(Pulse.ConstantPulse(DURATION, 1, 0, 0), "ryd")
    return seq


@pytest.fixture
def seq_digital(reg3):
    return make_seq_digital(reg3)


@pytest.fixture
def seq_ccz(reg3):
    return make_seq_ccz(reg3)


def _legacy_noise_model(noise, eff_op):
    """NoiseModel from legacy defaults for the given noise combo."""
    params = {
        p: _LEGACY_DEFAULTS[p]
        for p in NoiseModel._find_relevant_params(
            [n for n in noise if n not in ("leakage", "eff_noise")],
            state_prep_error=_LEGACY_DEFAULTS["state_prep_error"],
            amp_sigma=_LEGACY_DEFAULTS["amp_sigma"],
            laser_waist=_LEGACY_DEFAULTS["laser_waist"],
        )
    }
    with_leakage = "leakage" in noise
    if with_leakage or "eff_noise" in noise:
        params["eff_noise_opers"] = [eff_op]
        params["eff_noise_rates"] = [0.1 if with_leakage else 0.025]
    n_traj = params.pop("runs", None)
    return (
        NoiseModel(with_leakage=with_leakage, **params),
        n_traj,
    )


# --- Hamiltonian construction -------------------------------------


def test_get_hamiltonian_values():
    """Exact matrix elements (reference test_get_hamiltonian :476).

    The seeded noisy matrix below is the REFERENCE's own expected
    literal — matching it proves the doppler-noise trajectory RNG is
    bit-compatible.
    """
    simple_reg = Register.from_coordinates(
        [[10, 0], [0, 0]], prefix="atom"
    )
    detun = 1.0
    rise = Pulse.ConstantDetuning(
        RampWaveform(1500, 0.0, 2.0), detun, 0.0
    )
    simple_seq = Sequence(simple_reg, DigitalAnalogDevice)
    simple_seq.declare_channel("ising", "rydberg_global")
    simple_seq.add(rise, "ising")

    simple_sim = TpuEmulator.from_sequence(
        simple_seq, sampling_rate=0.01
    )
    with pytest.raises(ValueError, match="less than or equal to"):
        simple_sim.get_hamiltonian(1650)
    with pytest.raises(ValueError, match="greater than or equal to"):
        simple_sim.get_hamiltonian(-10)
    # Constant detuning: <rr|H|rr> = C6/r^6 - 2*detuning at any time
    simple_ham = simple_sim.get_hamiltonian(143).full()
    assert np.isclose(
        simple_ham[0, 0],
        DigitalAnalogDevice.interaction_coeff / 10**6 - 2 * detun,
    )

    np.random.seed(123)
    sim_noise = TpuEmulator.from_sequence(
        simple_seq,
        noise_model=NoiseModel(samples_per_run=1, temperature=20000),
        n_trajectories=15,
    )
    np.testing.assert_allclose(
        np.asarray(sim_noise.get_hamiltonian(144).full()),
        np.array(
            [
                [4.47984523, 0.09606404, 0.09606404, 0.0],
                [0.09606404, 12.03082372, 0.0, 0.09606404],
                [0.09606404, 0.0, -12.97113702, 0.09606404],
                [0.0, 0.09606404, 0.09606404, 0.0],
            ],
            dtype=complex,
        ),
        atol=5e-9,
    )

    # noiseless=True strips the noise from the same simulation
    clean = TpuEmulator.from_sequence(simple_seq).get_hamiltonian(144)
    noiseless = sim_noise.get_hamiltonian(144, noiseless=True)
    np.testing.assert_allclose(
        np.asarray(noiseless.full()), np.asarray(clean.full())
    )


def test_get_xy_hamiltonian():
    """Exact XY couplings (reference test_get_xy_hamiltonian :1430)."""
    simple_reg = Register.from_coordinates(
        [[0, 10], [10, 0], [0, 0]], prefix="atom"
    )
    detun, amp = 1.0, 3.0
    rise = Pulse.ConstantPulse(1500, amp, detun, 0.0)
    simple_seq = Sequence(simple_reg, MockDevice)
    simple_seq.declare_channel("ch0", "mw_global")
    simple_seq.set_magnetic_field(0, 1.0, 0.0)
    simple_seq.add(rise, "ch0")
    assert np.isclose(
        np.linalg.norm(
            np.asarray(simple_seq.magnetic_field, dtype=float)[0:2]
        ),
        1,
    )

    sim = TpuEmulator.from_sequence(simple_seq, sampling_rate=0.03)
    with pytest.raises(
        ValueError, match="less than or equal to the sequence duration"
    ):
        sim.get_hamiltonian(1650)
    with pytest.raises(ValueError, match="greater than or equal to 0"):
        sim.get_hamiltonian(-10)
    h = np.asarray(sim.get_hamiltonian(143).full())
    # atom1-atom2 along x (theta=90deg from B): +C3/r^3
    assert np.isclose(h[1, 2], MockDevice.interaction_coeff_xy / 10**3)
    # atom0-atom1 at theta=45deg: C3(1-3cos^2)/r^3 = -C3/2r^3 * ...
    assert (
        np.abs(
            h[1, 4] - (-2 * MockDevice.interaction_coeff_xy / 10**3)
        )
        < 1e-10
    )
    assert np.isclose(h[0, 1], 0.5 * amp)
    # Diagonal: -detun per |d> + C6/r^6 Rydberg-type stacking term
    np.testing.assert_array_almost_equal(
        np.diag(h),
        np.array([0, 1, 1, 2, 1, 2, 2, 3]) * -detun
        + np.array([2 + 1 / 8, 1 / 8, 1, 0, 1, 0, 0, 0])
        * MockDevice.interaction_coeff
        / 1e6,
    )


@pytest.mark.parametrize("leakage", [False, True])
def test_building_basis_and_projection_operators(seq_ccz, leakage):
    """Basis registry + projectors (reference :254)."""
    nm = (
        NoiseModel(
            with_leakage=True,
            eff_noise_opers=[np.eye(4)],
            eff_noise_rates=[0.0],
        )
        if leakage
        else NoiseModel()
    )
    dim = 3 + leakage
    sim = TpuEmulator.from_sequence(
        seq_ccz, sampling_rate=0.01, noise_model=nm
    )
    assert sim.basis_name == "all" + ("_with_error" if leakage else "")
    assert sim.dim == dim
    states = ["r", "g", "h"] + (["x"] if leakage else [])
    for k, label in enumerate(states):
        vec = np.asarray(sim.basis[label].full())[:, 0]
        expected = np.zeros(dim)
        expected[k] = 1
        np.testing.assert_allclose(vec, expected)
    op = sim._current_hamiltonian.op_matrix
    np.testing.assert_allclose(
        np.asarray(op["sigma_rr"].full()),
        np.outer(np.eye(dim)[0], np.eye(dim)[0]),
    )
    np.testing.assert_allclose(
        np.asarray(op["sigma_gr"].full()),
        np.outer(np.eye(dim)[1], np.eye(dim)[0]),
    )
    np.testing.assert_allclose(
        np.asarray(op["sigma_hg"].full()),
        np.outer(np.eye(dim)[2], np.eye(dim)[1]),
    )
    if leakage:
        np.testing.assert_allclose(
            np.asarray(op["sigma_xr"].full()),
            np.outer(np.eye(dim)[3], np.eye(dim)[0]),
        )
    # build_operator validation
    with pytest.raises(ValueError, match="Duplicate atom"):
        sim.build_operator([("sigma_gg", ["target", "target"])])
    with pytest.raises(ValueError, match="not a valid operator"):
        sim.build_operator([("wrong", ["target"])])
    with pytest.raises(ValueError, match="Invalid qubit names: {'q0'}"):
        sim.build_operator([("sigma_gg", ["q0"])])
    # "global" sums the local operator over every atom
    identity = sim.build_operator([("I", "global")])
    np.testing.assert_allclose(
        np.asarray(identity.full()), 3 * np.eye(dim**3)
    )


def test_concurrent_pulses(reg3):
    """Rydberg + raman acting at the same time both enter H (:1402)."""
    reg = Register({"q0": (0, 0)})
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch_local", "raman_local", initial_target="q0")
    pulse = Pulse.ConstantPulse(20, 10, 0, 0)
    seq.add(pulse, "ch_local")
    seq.declare_channel("ch_global", "rydberg_global")
    seq.add(pulse, "ch_global", protocol="no-delay")
    sim = TpuEmulator.from_sequence(seq)
    ham_mid = np.asarray(sim.get_hamiltonian(10).full())
    # both the g<->h (digital) and g<->r (ground-rydberg) couplings on
    assert sim.basis_name == "all"
    assert not np.isclose(ham_mid[1, 2], 0)  # g<->h
    assert not np.isclose(ham_mid[0, 1], 0)  # r<->g


# --- run semantics -------------------------------------------------


def test_empty_sequences(reg3):
    seq = Sequence(reg3, MockDevice)
    with pytest.raises(ValueError, match="no declared channels"):
        TpuEmulator.from_sequence(seq)
    seq.declare_channel("ch0", "mw_global")
    with pytest.raises(ValueError, match="No instructions given"):
        TpuEmulator.from_sequence(seq)
    seq.delay(100, "ch0")
    emu = TpuEmulator.from_sequence(seq)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        emu.run()


def test_single_atom_simulation():
    one_reg = Register.from_coordinates([(0, 0)], "atom")
    one_seq = Sequence(one_reg, MockDevice)
    one_seq.declare_channel("ch0", "rydberg_global")
    one_seq.add(
        Pulse.ConstantDetuning(ConstantAmp(16, 2.0), 0.0, 0.0), "ch0"
    )
    one_sim = TpuEmulator.from_sequence(one_seq)
    one_res = one_sim.run()
    assert one_res._size == one_sim._hamiltonian_data._size
    one_seq = Sequence(one_reg, MockDevice)
    one_seq.declare_channel("ch0", "rydberg_global")
    one_seq.add(
        Pulse.ConstantDetuning(ConstantAmp(16, 2.0), 1.0, 0.0), "ch0"
    )
    one_sim = TpuEmulator.from_sequence(one_seq)
    one_resb = one_sim.run()
    assert one_resb._size == 1


def ConstantAmp(duration, value):
    from pulser_tpu.waveforms import ConstantWaveform

    return ConstantWaveform(duration, value)


def test_eval_times_semantics(seq_ccz):
    """Evaluation-times spec semantics (reference :721)."""
    with pytest.raises(
        ValueError, match="evaluation_times float must be between 0"
    ):
        sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
        sim.set_evaluation_times(3.0)
    with pytest.raises(ValueError, match="Wrong evaluation time label."):
        sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
        sim.set_evaluation_times(123)
    with pytest.raises(ValueError, match="Wrong evaluation time label."):
        sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
        sim.set_evaluation_times("Best")
    with pytest.raises(
        ValueError, match="contains negative values"
    ):
        sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
        sim.set_evaluation_times([-1, 0, sim.sampling_times[-2]])
    with pytest.raises(
        ValueError, match="extends further than sequence duration"
    ):
        sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
        sim.set_evaluation_times([0, sim.sampling_times[-1] + 10])

    sim = TpuEmulator.from_sequence(seq_ccz, sampling_rate=1.0)
    sim.set_evaluation_times("Full")
    np.testing.assert_almost_equal(
        sim._eval_times_array, sim.sampling_times
    )

    sim.set_evaluation_times("Minimal")
    np.testing.assert_almost_equal(
        sim._eval_times_array,
        np.array([sim.sampling_times[0], sim._tot_duration / 1000]),
    )

    # explicit list keeps given interior points
    sim.set_evaluation_times(
        [0, sim.sampling_times[-3], sim._tot_duration / 1000]
    )
    np.testing.assert_almost_equal(
        sim._eval_times_array,
        np.array(
            [0, sim.sampling_times[-3], sim._tot_duration / 1000]
        ),
    )

    # empty list and tiny fraction reduce to the {0, T} endpoints
    sim.set_evaluation_times([])
    np.testing.assert_almost_equal(
        sim._eval_times_array,
        np.array([0, sim._tot_duration / 1000]),
    )
    sim.set_evaluation_times(0.0001)
    np.testing.assert_almost_equal(
        sim._eval_times_array,
        np.array([0, sim._tot_duration / 1000]),
    )

    # interior points get unioned with the {0, T} endpoints
    sim.set_evaluation_times(
        [sim.sampling_times[-10], sim.sampling_times[-3]]
    )
    np.testing.assert_almost_equal(
        sim._eval_times_array,
        np.array(
            [
                0,
                sim.sampling_times[-10],
                sim.sampling_times[-3],
                sim._tot_duration / 1000,
            ]
        ),
    )

    # fraction spec = evenly-spaced subset of the sampling times
    sim.set_evaluation_times(0.4)
    np.testing.assert_almost_equal(
        sim.sampling_times[
            np.linspace(
                0,
                len(sim.sampling_times) - 1,
                int(0.4 * len(sim.sampling_times)),
                dtype=int,
            )
        ],
        sim._eval_times_array,
    )


def test_initial_state_sim():
    """Custom initial states propagate exactly (reference :2156)."""
    reg = Register.from_coordinates([(0, 0), (0, 5)], prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(300, 2 * np.pi, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    amps = np.random.default_rng(5).random(4)
    state = amps / np.linalg.norm(amps)
    sim.set_initial_state(state)
    np.testing.assert_allclose(
        np.asarray(sim.initial_state.full())[:, 0], state
    )
    res = sim.run()
    final = res.get_final_state().full()[:, 0]
    assert abs(np.linalg.norm(final) - 1) < 1e-6
    assert not np.allclose(np.abs(final), state)


# --- noise combinations (collapse ops + seeded histograms) --------
# Collapse-operator counts are the REFERENCE's expectations
# (test_noises_rydberg :990 etc.); histograms are pinned against this
# implementation's seeded RNG (regenerate with
# /tmp/gen_behavior_pins.py if the solver or RNG layout changes).

# For comparison, the reference's own expectations under ITS RNG path
# (test_simulation.py:984-1047): digital dephasing {"111": 978,
# "110": 12, "011": 7, "101": 3}, qutrit dephasing {"111": 961,
# "101": 15, "110": 14, "011": 9, "001": 1} — ours differ by at most
# a couple of samples per bin, i.e. the underlying distributions agree.
RYDBERG_PINS: dict = {
    ("dephasing",): {"0": 591, "1": 409},
    ("relaxation",): {"0": 592, "1": 408},
    ("eff_noise",): {"0": 591, "1": 409},
    ("depolarizing",): {"0": 586, "1": 414},
    ("dephasing", "depolarizing", "relaxation"): {"0": 585, "1": 415},
    ("eff_noise", "dephasing"): {"0": 590, "1": 410},
    ("eff_noise", "leakage"): {"0": 591, "1": 409},
}
DIGITAL_PINS: dict = {
    ("dephasing",): {"111": 978, "110": 12, "011": 8, "101": 2},
    ("eff_noise",): {"111": 978, "110": 12, "011": 8, "101": 2},
    ("depolarizing",): {
        "111": 827,
        "011": 59,
        "110": 40,
        "101": 63,
        "001": 4,
        "010": 5,
        "000": 1,
        "100": 1,
    },
    ("dephasing", "depolarizing"): {
        "111": 806,
        "011": 60,
        "110": 57,
        "101": 63,
        "001": 5,
        "100": 4,
        "010": 4,
        "000": 1,
    },
    ("eff_noise", "dephasing"): {
        "111": 960,
        "101": 16,
        "011": 9,
        "110": 14,
        "001": 1,
    },
    ("eff_noise", "leakage"): {
        "111": 978,
        "110": 12,
        "011": 8,
        "101": 2,
    },
    ("eff_noise", "leakage", "dephasing"): {
        "111": 960,
        "101": 16,
        "011": 9,
        "110": 14,
        "001": 1,
    },
}
ALL_PINS: dict = {
    ("dephasing",): {
        "111": 961,
        "101": 16,
        "011": 9,
        "110": 13,
        "001": 1,
    },
    ("eff_noise",): {
        "111": 961,
        "101": 16,
        "011": 9,
        "110": 13,
        "001": 1,
    },
    ("relaxation",): {
        "010": 201,
        "000": 463,
        "001": 166,
        "100": 169,
        "101": 1,
    },
    ("dephasing", "relaxation"): {
        "010": 203,
        "000": 451,
        "001": 172,
        "100": 169,
        "101": 5,
    },
    ("eff_noise", "dephasing"): {
        "111": 931,
        "110": 15,
        "011": 24,
        "101": 28,
        "100": 1,
        "001": 1,
    },
    ("eff_noise", "leakage"): {
        "111": 961,
        "101": 16,
        "011": 9,
        "110": 13,
        "001": 1,
    },
}


def _run_noise_case(seq, noise, eff_op):
    np.random.seed(123)
    nm, n_traj = _legacy_noise_model(noise, eff_op)
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=0.01, noise_model=nm, n_trajectories=n_traj
    )
    assert set(sim.noise_model.noise_types) == set(noise)
    res = sim.run()
    return sim, res


@pytest.mark.parametrize(
    "noise, n_collapse_ops",
    [
        (("dephasing",), 1),
        (("relaxation",), 1),
        (("eff_noise",), 1),
        (("depolarizing",), 3),
        (("dephasing", "depolarizing", "relaxation"), 5),
        (("eff_noise", "dephasing"), 2),
        (("eff_noise", "leakage"), 1),
    ],
)
def test_noises_rydberg(noise, n_collapse_ops):
    """Collapse-op counts (reference values) + seeded histograms."""
    reg = Register.from_coordinates([(0, 0)], prefix="q")
    seq = Sequence(reg, DigitalAnalogDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(Pulse.ConstantPulse(2500, np.pi, 0, 0), "ch0")
    eff_op = LEAK2 if "leakage" in noise else Z2
    sim, res = _run_noise_case(seq, noise, eff_op)
    assert (
        len(sim._current_hamiltonian._collapse_ops) == n_collapse_ops
    )
    assert res.sample_final_state() == Counter(RYDBERG_PINS[noise])
    # Mixedness: the final state is not pure
    rho = np.asarray(res.states[-1].full())
    trace_2 = np.trace(rho @ rho).real
    assert trace_2 < 1 and not np.isclose(trace_2, 1)
    if "leakage" in noise:
        state = np.asarray(res.get_final_state().full())
        assert np.allclose(state[2, :], 0)
        assert np.allclose(state[:, 2], 0)


#: reference leakage op for digital (projector on the 2nd basis state)
LEAK_DIG = np.zeros((3, 3), complex)
LEAK_DIG[1, 1] = 1.0


@pytest.mark.parametrize(
    "noise, n_collapse_ops",
    [
        (("dephasing",), 1),
        (("eff_noise",), 1),
        (("depolarizing",), 3),
        (("dephasing", "depolarizing"), 4),
        (("eff_noise", "dephasing"), 2),
        (("eff_noise", "leakage"), 1),
        (("eff_noise", "leakage", "dephasing"), 2),
    ],
)
def test_noises_digital(noise, n_collapse_ops, seq_digital):
    """Digital-basis noise combos (reference :1115).

    Collapse ops count n per atom (``n_collapse_ops * n_qubits``, the
    reference's own assertion); dephasing uses the hyperfine rate 0.05
    exactly as the reference test sets it.
    """
    np.random.seed(123)
    params = {
        p: _LEGACY_DEFAULTS[p]
        for p in NoiseModel._find_relevant_params(
            [n for n in noise if n not in ("leakage", "eff_noise")],
            state_prep_error=_LEGACY_DEFAULTS["state_prep_error"],
            amp_sigma=_LEGACY_DEFAULTS["amp_sigma"],
            laser_waist=_LEGACY_DEFAULTS["laser_waist"],
        )
    }
    if "dephasing" in noise:
        params["hyperfine_dephasing_rate"] = 0.05
    with_leakage = "leakage" in noise
    if with_leakage or "eff_noise" in noise:
        params["eff_noise_opers"] = [
            LEAK_DIG if with_leakage else Z2
        ]
        params["eff_noise_rates"] = [0.1 if with_leakage else 0.025]
    params.pop("runs", None)
    sim = TpuEmulator.from_sequence(
        seq_digital,
        sampling_rate=0.01,
        noise_model=NoiseModel(with_leakage=with_leakage, **params),
    )
    assert set(sim.noise_model.noise_types) == set(noise)
    with pytest.raises(
        ValueError,
        match="'relaxation' noise requires addressing of the "
        "'ground-rydberg'",
    ):
        TpuEmulator.from_sequence(
            seq_digital,
            noise_model=NoiseModel(relaxation_rate=0.01),
        )
    res = sim.run()
    assert res.sample_final_state() == Counter(DIGITAL_PINS[noise])
    assert len(
        sim._current_hamiltonian._collapse_ops
    ) == n_collapse_ops * len(seq_digital.register.qubits)
    rho = np.asarray(res.states[-1].full())
    trace_2 = np.trace(rho @ rho).real
    assert trace_2 < 1 and not np.isclose(trace_2, 1)


@pytest.mark.parametrize(
    "noise, n_collapse_ops",
    [
        (("dephasing",), 2),
        (("eff_noise",), 2),
        (("relaxation",), 1),
        (("dephasing", "relaxation"), 3),
        (("eff_noise", "dephasing"), 4),
        (("eff_noise", "leakage"), 2),
    ],
)
def test_noises_all_basis(noise, n_collapse_ops, seq_ccz):
    """Qutrit ('all') basis noise combos (reference :1214)."""
    seq = seq_ccz
    params: dict = {}
    if "relaxation" in noise:
        # Bring the state to ggg, then a 2pi rydberg-basis pulse
        seq.target("control1", "raman")
        seq.add(PI_Y_PULSE, "raman")
        seq.target("target", "raman")
        seq.add(PI_Y_PULSE, "raman")
        seq.target("control2", "raman")
        seq.add(PI_Y_PULSE, "raman")
        seq.declare_channel("ryd_glob", "rydberg_global")
        seq.add(TWOPI_PULSE, "ryd_glob")
        seq.measure()
        params["relaxation_rate"] = 1.0
    with_leakage = "leakage" in noise
    dim = 4 if with_leakage else 3
    deph_op = np.zeros((dim, dim), complex)
    deph_op[0, 0] = 1.0
    hyp_op = np.zeros((dim, dim), complex)
    hyp_op[2, 2] = 1.0
    if "dephasing" in noise:
        params["hyperfine_dephasing_rate"] = 0.1
        params["dephasing_rate"] = 0.1
    if with_leakage or "eff_noise" in noise:
        params["eff_noise_opers"] = [deph_op, hyp_op]
        params["eff_noise_rates"] = [0.2, 0.2]
    sim = TpuEmulator.from_sequence(
        seq,
        sampling_rate=0.01,
        noise_model=NoiseModel(with_leakage=with_leakage, **params),
    )
    assert set(sim.noise_model.noise_types) == set(noise)
    # eff-noise operators must match the basis dimension
    with pytest.raises(
        ValueError,
        match="Incompatible shape for effective noise operator n°0.",
    ):
        TpuEmulator.from_sequence(
            seq,
            noise_model=NoiseModel(
                eff_noise_opers=[Z2], eff_noise_rates=[1.0]
            ),
        )
    # depolarizing is rejected in the qutrit basis
    with pytest.raises(
        NotImplementedError,
        match="Cannot include depolarizing noise in all-basis.",
    ):
        TpuEmulator.from_sequence(
            seq, noise_model=NoiseModel(depolarizing_rate=1.0)
        )
    assert len(
        sim._current_hamiltonian._collapse_ops
    ) == n_collapse_ops * len(seq.register.qubits)
    np.random.seed(123)
    res = sim.run()
    assert res.sample_final_state() == Counter(ALL_PINS[noise])
    rho = np.asarray(res.states[-1].full())
    trace_2 = np.trace(rho @ rho).real
    assert trace_2 < 1 and not np.isclose(trace_2, 1)
    if with_leakage:
        state = np.asarray(res.get_final_state().full())
        assert np.allclose(state[3, :], 0)
        assert np.allclose(state[:, 3], 0)


def test_relaxation_noise_decays():
    """Rydberg population decays monotonically (reference :1049)."""
    seq = Sequence(Register({"q0": (0, 0)}), MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        Pulse.ConstantDetuning(BlackmanWaveform(1000, np.pi), 0, 0),
        "ryd",
    )
    seq.delay(10000, "ryd")
    sim = TpuEmulator.from_sequence(
        seq, noise_model=NoiseModel(relaxation_rate=0.1)
    )
    np.random.seed(3)
    res = sim.run()
    start = res.sample_state(1)
    ryd_pop = start["1"]
    assert ryd_pop > start.get("0", 0)
    for t_ in range(2, 10):
        new_pop = res.sample_state(t_)["1"]
        assert new_pop < ryd_pop
        ryd_pop = new_pop


@pytest.mark.parametrize(
    "noise_data, expected",
    [
        (dict(p_false_pos=0.1), False),
        (dict(dephasing_rate=0.1), False),
        (dict(relaxation_rate=0.1), False),
        (
            dict(
                eff_noise_opers=[np.eye(2)],
                eff_noise_rates=[0.1],
            ),
            False,
        ),
        (dict(state_prep_error=0.1), True),
        (dict(temperature=100.0), True),
        (dict(amp_sigma=0.5), True),
        (dict(detuning_sigma=1.0), True),
        (
            dict(trap_depth=100.0, trap_waist=1.0, temperature=1.0),
            True,
        ),
    ],
)
def test_has_stochastic_noise(noise_data, expected):
    """Stochastic-noise classification (reference :2497)."""
    assert (
        _has_stochastic_noise(NoiseModel(**noise_data)) is expected
    )


# --- SLM masks ----------------------------------------------------


def test_mask_nopulses():
    """SLM mask with no pulses leaves no mask window (ref :1730)."""
    reg = Register({"q0": (0, 0), "q1": (10, 10), "q2": (-10, -10)})
    for channel_type in ["mw_global", "rydberg_global"]:
        seq_empty = Sequence(reg, MockDevice)
        if channel_type == "mw_global":
            seq_empty.set_magnetic_field(0, 1.0, 0.0)
        seq_empty.declare_channel("ch", channel_type)
        seq_empty.delay(duration=100, channel="ch")
        seq_empty.config_slm_mask(["q2"])
        sim_empty = TpuEmulator.from_sequence(seq_empty)
        assert seq_empty._slm_mask_time == []
        assert sample(seq_empty)._slm_mask.end == 0
        assert sim_empty.samples_obj._slm_mask.end == 0


def test_mask_equals_remove_xy():
    """Masked XY qubit == removing it from the register (ref :1748)."""
    reg_three = Register(
        {"q0": (0, 0), "q1": (10, 10), "q2": (-10, -10)}
    )
    reg_two = Register({"q0": (0, 0), "q1": (10, 10)})
    pulse = Pulse.ConstantPulse(100, 10, 0, 0)

    seq_masked = Sequence(reg_three, MockDevice)
    seq_masked.set_magnetic_field(0, 1.0, 0.0)
    seq_masked.declare_channel("ch_masked", "mw_global")
    seq_masked.config_slm_mask(["q2"])
    seq_masked.add(pulse, "ch_masked")
    sim_masked = TpuEmulator.from_sequence(seq_masked)

    with pytest.raises(
        ValueError,
        match="Samples use SLM mask but device does not have one.",
    ):
        TpuEmulator(sample(seq_masked), reg_three, AnalogDevice)
    with pytest.raises(
        ValueError, match="The ids of qubits targeted in SLM mask"
    ):
        TpuEmulator(sample(seq_masked), reg_two, MockDevice)

    seq_two = Sequence(reg_two, MockDevice)
    seq_two.set_magnetic_field(0, 1.0, 0.0)
    seq_two.declare_channel("ch_two", "mw_global")
    seq_two.add(pulse, "ch_two")
    sim_two = TpuEmulator.from_sequence(seq_two)

    for t in sim_two.sampling_times:
        ham_masked = np.asarray(sim_masked.get_hamiltonian(t).full())
        ham_two = np.asarray(sim_two.get_hamiltonian(t).full())
        np.testing.assert_allclose(
            ham_masked, np.kron(ham_two, np.eye(2)), atol=1e-12
        )


def test_mask_two_pulses_xy():
    """Mask only applies during the first pulse (reference :1792)."""
    reg_three = Register(
        {"q0": (0, 0), "q1": (10, 10), "q2": (-10, -10)}
    )
    reg_two = Register({"q0": (0, 0), "q1": (10, 10)})
    pulse = Pulse.ConstantPulse(100, 10, 0, 0)
    no_pulse = Pulse.ConstantPulse(100, 0, 0, 0)

    seq_masked = Sequence(reg_three, MockDevice)
    seq_masked.declare_channel("ch_masked", "mw_global")
    seq_masked.config_slm_mask(["q2"])
    seq_masked.add(pulse, "ch_masked")
    seq_masked.add(pulse, "ch_masked")
    seq_masked.add(pulse, "ch_masked")
    sim_masked = TpuEmulator.from_sequence(seq_masked)

    seq_three = Sequence(reg_three, MockDevice)
    seq_three.declare_channel("ch_three", "mw_global")
    seq_three.add(no_pulse, "ch_three")
    seq_three.add(pulse, "ch_three")
    seq_three.add(pulse, "ch_three")
    sim_three = TpuEmulator.from_sequence(seq_three)

    seq_two = Sequence(reg_two, MockDevice)
    seq_two.declare_channel("ch_two", "mw_global")
    seq_two.add(pulse, "ch_two")
    seq_two.add(no_pulse, "ch_two")
    seq_two.add(no_pulse, "ch_two")
    sim_two = TpuEmulator.from_sequence(seq_two)

    ti, tf = seq_masked._slm_mask_time
    for t in sim_masked.sampling_times:
        ham_masked = np.asarray(sim_masked.get_hamiltonian(t).full())
        if ti <= t <= tf:
            ham_two = np.asarray(sim_two.get_hamiltonian(t).full())
            np.testing.assert_allclose(
                ham_masked, np.kron(ham_two, np.eye(2)), atol=1e-12
            )
        else:
            ham_three = np.asarray(
                sim_three.get_hamiltonian(t).full()
            )
            np.testing.assert_allclose(
                ham_masked, ham_three, atol=1e-12
            )


def test_effective_size_disjoint_bad_atoms():
    """Bad atoms drop out; SLM detuning hits the masked one (:1969)."""
    simple_reg = Register.square(2, prefix="atom")
    amp = 1
    rise = Pulse.ConstantPulse(1500, amp, 0, 0)
    for channel_type in ("rydberg_global", "raman_global"):
        np.random.seed(15092021)
        seq = Sequence(simple_reg, MockDevice)
        seq.declare_channel("ch0", channel_type)
        seq.add(rise, "ch0")
        seq.config_slm_mask(["atom1"])
        assert seq._slm_mask_time == [0, 1500]
        sim = TpuEmulator.from_sequence(
            seq,
            sampling_rate=0.01,
            noise_model=NoiseModel(
                samples_per_run=5,
                state_prep_error=0.4,
                p_false_pos=0.01,
                p_false_neg=0.05,
            ),
            n_trajectories=15,
        )
        assert sim._current_hamiltonian.noise_trajectory.bad_atoms == {
            "atom0": True,
            "atom1": False,
            "atom2": True,
            "atom3": False,
        }
        basis = (
            "ground-rydberg"
            if channel_type == "rydberg_global"
            else "digital"
        )
        nested = sim._current_hamiltonian.samples.to_nested_dict()
        amp_samples = np.concatenate(
            (np.asarray(rise.amplitude.samples, dtype=float), [0])
        )
        for q in ("atom1", "atom3"):
            np.testing.assert_array_equal(
                np.asarray(nested["Local"][basis][q]["amp"]),
                amp_samples,
            )
            assert np.all(
                np.asarray(nested["Local"][basis][q]["phase"]) == 0.0
            )
        # the masked qubit gets the -10*amp SLM detuning pulse
        assert np.all(
            np.asarray(
                nested["Local"]["ground-rydberg"]["atom1"]["det"]
            )
            == -10 * amp_samples
        )
        assert np.all(
            np.asarray(nested["Local"][basis]["atom3"]["det"]) == 0.0
        )


# --- modulation ---------------------------------------------------


def test_simulation_with_modulation(mod_device, reg3):
    """Modulated samples drive the solve (reference :2048)."""
    seq = Sequence(reg3, mod_device)
    seq.declare_channel("ch0", "rydberg_global")
    seq.config_slm_mask({"control1"})
    pulse1 = Pulse.ConstantPulse(120, 1, 0, 2.0)
    seq.add(pulse1, "ch0")

    with pytest.raises(
        NotImplementedError,
        match="Simulation of sequences combining an SLM mask and "
        "output modulation is not supported.",
    ):
        TpuEmulator.from_sequence(seq, with_modulation=True)

    seq = Sequence(reg3, mod_device)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "raman_local", initial_target="target")
    seq.add(pulse1, "ch1")
    seq.target("control1", "ch1")
    seq.add(pulse1, "ch1")
    seq.add(pulse1, "ch0")

    ch0_obj = seq.declared_channels["ch0"]
    mod_samples = ch0_obj.modulate(np.asarray(pulse1.amplitude.samples))
    sim = TpuEmulator.from_sequence(seq, with_modulation=True)
    raman = sim._hamiltonian_data.samples.to_nested_dict()["Local"][
        "digital"
    ]
    ryd_global = sim._hamiltonian_data.samples.to_nested_dict()[
        "Global"
    ]["ground-rydberg"]
    # the modulated pulse extends past its nominal duration
    assert sim._tot_duration > seq.get_duration()
    # every locally-targeted qubit sees the raman channel's output
    for q in ("control1", "target"):
        amp_q = np.asarray(raman[q]["amp"])
        assert amp_q.max() > 0
    # the global channel's output is the modulated waveform
    amp_glob = np.asarray(ryd_global["amp"])
    np.testing.assert_allclose(
        amp_glob.max(),
        np.asarray(mod_samples, dtype=float).max(),
        rtol=1e-6,
    )


# --- solver selection ---------------------------------------------


def test_default_solver_selection(monkeypatch, reg3):
    """DEFAULT picks sesolve / mesolve / MCWF correctly (:2502)."""
    import pulser_tpu.ops.solver as S

    calls = []
    real_sesolve = S.sesolve_rk4
    real_mesolve = S.mesolve_rk4

    def spy_sesolve(*a, **k):
        calls.append("sesolve")
        return real_sesolve(*a, **k)

    def spy_mesolve(*a, **k):
        calls.append("mesolve")
        return real_mesolve(*a, **k)

    monkeypatch.setattr(S, "sesolve_rk4", spy_sesolve)
    monkeypatch.setattr(S, "mesolve_rk4", spy_mesolve)
    import pulser_tpu.emulator.simulation as sim_mod

    monkeypatch.setattr(sim_mod, "sesolve_rk4", spy_sesolve)
    monkeypatch.setattr(sim_mod, "mesolve_rk4", spy_mesolve)

    reg = Register.from_coordinates([(0, 0), (0, 5)], prefix="q")

    def build():
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(Pulse.ConstantPulse(200, 2, 0, 0), "ryd")
        return seq

    # No noise -> pure Schrodinger solve
    TpuEmulator.from_sequence(build()).run()
    assert "sesolve" in calls and "mesolve" not in calls

    calls.clear()
    # Dephasing (no stochastic noise) -> master equation
    TpuEmulator.from_sequence(
        build(), noise_model=NoiseModel(dephasing_rate=0.1)
    ).run()
    assert "mesolve" in calls

    # MESOLVER forced WITHOUT collapse operators reduces to the pure
    # Schrodinger solve — matching qutip.mesolve itself, which falls
    # back to sesolve when given a ket and no c_ops.
    calls.clear()
    TpuEmulator.from_sequence(
        build(), solver=Solver.MESOLVER
    ).run()
    assert calls == ["sesolve"]

    # MCSOLVER forced with collapse operators -> quantum jumps
    real_mcsolve = S.mcsolve_rk4

    def spy_mcsolve(*a, **k):
        calls.append("mcsolve")
        return real_mcsolve(*a, **k)

    monkeypatch.setattr(S, "mcsolve_rk4", spy_mcsolve)
    monkeypatch.setattr(sim_mod, "mcsolve_rk4", spy_mcsolve)
    calls.clear()
    np.random.seed(11)
    TpuEmulator.from_sequence(
        build(),
        noise_model=NoiseModel(dephasing_rate=0.1),
        solver=Solver.MCSOLVER,
    ).run()
    assert "mcsolve" in calls


def test_amp_sigma_noise_per_channel_factors():
    """Shot-to-shot amplitude factors: per channel, constant across
    pulses, applied to every targeted qubit (reference :2193)."""
    reg = Register({"q0": (0, 0), "q1": (10, 10)})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.declare_channel("ch1", "raman_local", initial_target="q0")
    seq.declare_channel("ch2", "raman_local", initial_target="q1")

    pulse1 = Pulse.ConstantPulse(120, 1, 0, 2.0)
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch0")
    seq.add(pulse1, "ch1", protocol="no-delay")
    seq.target("q1", "ch1")
    seq.add(pulse1, "ch1", protocol="no-delay")
    seq.add(pulse1, "ch2", protocol="no-delay")

    np.random.seed(777)
    sim = TpuEmulator.from_sequence(
        seq, noise_model=NoiseModel(amp_sigma=0.1), n_trajectories=1
    )
    noiseless = TpuEmulator.from_sequence(
        seq
    ).samples_obj.to_nested_dict(all_local=True)
    sim_samples = sim._current_hamiltonian.samples.to_nested_dict()
    assert sim_samples["Global"] == {}

    amp0 = np.asarray(pulse1.amplitude.samples, float)[0]
    ryd = sim_samples["Local"]["ground-rydberg"]
    factors = {
        "ch0": float(np.asarray(ryd["q0"]["amp"])[0]) / amp0
    }
    for qid in reg.qubit_ids:
        np.testing.assert_allclose(
            np.asarray(
                noiseless["Local"]["ground-rydberg"][qid]["amp"],
                dtype=float,
            )
            * factors["ch0"],
            np.asarray(ryd[qid]["amp"], dtype=float),
            rtol=1e-12,
        )

    dig = sim_samples["Local"]["digital"]
    factors["ch1"] = float(np.asarray(dig["q0"]["amp"])[0]) / amp0
    factors["ch2"] = float(np.asarray(dig["q1"]["amp"])[0]) / amp0
    assert all(f > 0 and f != 1 for f in factors.values())
    assert len(set(factors.values())) == len(factors)

    # q0 sees only ch1's factor
    np.testing.assert_allclose(
        np.asarray(
            noiseless["Local"]["digital"]["q0"]["amp"], dtype=float
        )
        * factors["ch1"],
        np.asarray(dig["q0"]["amp"], dtype=float),
        rtol=1e-12,
    )
    # q1: first pulse from ch2, second from ch1
    expected_q1 = np.asarray(
        noiseless["Local"]["digital"]["q1"]["amp"], dtype=float
    ).copy()
    expected_q1[: pulse1.duration] *= factors["ch2"]
    expected_q1[-pulse1.duration - 1 :] *= factors["ch1"]
    np.testing.assert_allclose(
        expected_q1, np.asarray(dig["q1"]["amp"], dtype=float),
        rtol=1e-12,
    )
