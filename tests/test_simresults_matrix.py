"""SimulationResults construction/measurement matrix.

Second half of the reference's
``tests/pulser_simulation/test_simresults.py`` coverage: constructor
validation over every basis name, measurement-basis compatibility,
basis reduction of three-level states, SPAM-error expectation values
through the pseudo-density path, XY-basis restrictions, and the
measurement-basis-mismatch sampling rule (reference
``pulser-simulation/pulser_simulation/simresults.py:38-568``).
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu import NoiseModel
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.emulator.qobj import Qobj, basis as basis_ket, qeye, tensor
from pulser_tpu.emulator.simresults import (
    CoherentResults,
    NoisyResults,
)

ALL_BASES = [
    "ground-rydberg",
    "digital",
    "all",
    "XY",
    "ground-rydberg_with_error",
    "digital_with_error",
    "all_with_error",
    "XY_with_error",
]


@pytest.fixture
def reg():
    return tpu.Register(
        {"A": np.array([0.0, 0.0]), "B": np.array([0.0, 10.0])}
    )


@pytest.fixture
def pi_pulse():
    return tpu.Pulse.ConstantDetuning(
        tpu.BlackmanWaveform(1000, np.pi), 0.0, 0
    )


@pytest.fixture
def seq_no_meas(reg, pi_pulse):
    seq = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(pi_pulse, "ryd")
    return seq


@pytest.fixture
def results(seq_no_meas):
    seq_no_meas.measure("ground-rydberg")
    return TpuEmulator.from_sequence(seq_no_meas).run()


@pytest.mark.parametrize(
    ["basis", "exp_basis"],
    [
        ("ground-rydberg_with_error", "ground-rydberg"),
        ("digital_with_error", "digital"),
        ("all_with_error", "digital"),
        ("all", "digital"),
        ("XY_with_error", "XY"),
    ],
)
def test_initialization(results, basis, exp_basis):
    times = np.array([0.0])
    with pytest.raises(ValueError, match="`basis_name` must be"):
        CoherentResults([], 2, "bad_basis", times, "ground-rydberg")
    if "all" in basis:
        with pytest.raises(
            ValueError,
            match="`meas_basis` must be 'ground-rydberg' or 'digital'.",
        ):
            CoherentResults([], 1, basis, times, "XY")
    else:
        with pytest.raises(
            ValueError,
            match=(
                f"`meas_basis` associated to basis_name '{basis}'"
                " must be"
            ),
        ):
            CoherentResults(
                [], 1, basis, times, "wrong_measurement_basis"
            )
    with pytest.raises(
        ValueError,
        match="only values of 'epsilon' and 'epsilon_prime'",
    ):
        CoherentResults(
            [],
            1,
            basis,
            times,
            exp_basis,
            {"eta": 0.1, "epsilon": 0.0, "epsilon_prime": 0.4},
        )

    assert results._dim == 2
    assert results._size == 2
    assert results._basis_name == "ground-rydberg"
    assert results._meas_basis == "ground-rydberg"
    # Initial state is |gg>: last index in the r-first ordering
    assert results.states[0] == tensor([basis_ket(2, 1), basis_ket(2, 1)])


@pytest.mark.parametrize(
    ["basis", "exp_basis"],
    [
        ("ground-rydberg_with_error", "ground-rydberg"),
        ("digital_with_error", "digital"),
        ("all_with_error", "digital"),
        ("all", "digital"),
        ("XY_with_error", "XY"),
    ],
)
def test_init_noisy(basis, exp_basis):
    times = np.array([0.0])
    with pytest.raises(ValueError, match="`basis_name` must be"):
        NoisyResults([], 2, "bad_basis", times, 123)
    assert (
        NoisyResults([], 2, basis, times, 100)._basis_name
        == exp_basis
    )


@pytest.mark.parametrize("noisychannel", [True, False])
def test_get_final_state(noisychannel, seq_no_meas, results):
    nm = NoiseModel(dephasing_rate=0.01) if noisychannel else None
    _results = TpuEmulator.from_sequence(
        seq_no_meas, noise_model=nm
    ).run()
    assert isinstance(_results, CoherentResults)
    final_state = _results.get_final_state()
    if noisychannel:
        assert final_state.isoper and not final_state.isket
    else:
        assert final_state.isket
    with pytest.raises(TypeError, match="Can't reduce"):
        _results.get_final_state(reduce_to_basis="digital")
    assert (
        _results.get_final_state(
            reduce_to_basis="ground-rydberg",
            ignore_global_phase=False,
        )
        == _results.states[-1].tidyup()
    )
    # Final state is the last state in the results
    assert np.all(
        np.isclose(
            np.abs(
                _results.get_final_state(
                    ignore_global_phase=False
                ).full()
            ),
            np.abs(_results.states[-1].full()),
        )
    )
    # Density matrices/far-spaced kets unaffected by global phase
    assert np.all(
        np.isclose(
            np.abs(
                _results.get_final_state(
                    ignore_global_phase=True
                ).full()
            ),
            np.abs(_results.states[-1].full()),
        )
    )


def test_get_final_state_three_level(reg, pi_pulse, results):
    seq_ = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq_.declare_channel("ryd", "rydberg_global")
    seq_.declare_channel("ram", "raman_local", initial_target="A")
    seq_.add(pi_pulse, "ram")
    seq_.add(pi_pulse, "ram")
    seq_.add(pi_pulse, "ryd")

    results_ = TpuEmulator.from_sequence(seq_).run()

    with pytest.raises(
        ValueError, match="'reduce_to_basis' must be"
    ):
        results_.get_final_state(reduce_to_basis="all")

    with pytest.raises(
        TypeError, match="Can't reduce to chosen basis"
    ):
        results_.get_final_state(reduce_to_basis="digital")

    # With a permissive tolerance, the 'h' populations are tiny: the
    # two raman pi pulses return atom A to 'g'
    h_states = results_.get_final_state(
        reduce_to_basis="digital", tol=1, normalize=False
    ).full()[1:]
    assert np.linalg.norm(h_states) < 3e-6

    # Reducing to ground-rydberg recovers the two-level result
    assert np.all(
        np.isclose(
            np.abs(
                results_.get_final_state(
                    reduce_to_basis="ground-rydberg"
                ).full()
            ),
            np.abs(results.states[-1].full()),
            atol=1e-5,
        )
    )


def test_get_state_float_time(results):
    with pytest.raises(IndexError, match="is absent from"):
        results.get_state(-1.0)
    mean = (results._sim_times[-1] + results._sim_times[-2]) / 2
    diff = (results._sim_times[-1] - results._sim_times[-2]) / 2
    with pytest.raises(IndexError, match="is absent from"):
        results.get_state(mean, t_tol=diff / 2)
    state = results.get_state(mean, t_tol=3 * diff / 2)
    assert state == results.get_state(results._sim_times[-2])


def test_expect_spam_measurement_errors(pi_pulse):
    reg_single = tpu.Register.from_coordinates([(0, 0)], prefix="q")
    seq_single = tpu.Sequence(reg_single, tpu.DigitalAnalogDevice)
    seq_single.declare_channel("ryd", "rydberg_global")
    seq_single.add(pi_pulse, "ryd")

    sim_single = TpuEmulator.from_sequence(seq_single)
    results_single = sim_single.run()
    op = [basis_ket(2, 0).proj()]
    exp = results_single.expect(op)[0]
    assert np.isclose(exp[-1], 1)
    assert len(exp) == pi_pulse.duration + 1  # includes t=0
    np.testing.assert_almost_equal(
        results_single._calc_pseudo_density(-1).full(),
        np.array([[1, 0], [0, 0]]),
    )

    # With SPAM readout errors the pseudo-density path engages
    noise_model = NoiseModel(p_false_pos=0.01, p_false_neg=0.05)
    sim_single = TpuEmulator.from_sequence(
        seq_single, noise_model=noise_model
    )
    sim_single.set_evaluation_times("Minimal")
    results_single = sim_single.run()
    exp = results_single.expect(op)[0]
    assert len(exp) == 2
    assert isinstance(results_single, CoherentResults)
    assert results_single._meas_errors == {
        "epsilon": noise_model.p_false_pos,
        "epsilon_prime": noise_model.p_false_neg,
    }
    # P(measure 1 | g) = false-positive rate
    assert np.isclose(exp[0], noise_model.p_false_pos)
    # P(measure 1 | r) = 1 - false-negative rate
    assert np.isclose(exp[-1], 1 - noise_model.p_false_neg)
    np.testing.assert_almost_equal(
        results_single._calc_pseudo_density(-1).full(),
        np.array(
            [
                [1 - noise_model.p_false_neg, 0],
                [0, noise_model.p_false_neg],
            ]
        ),
    )


def test_expect_three_level(reg, pi_pulse):
    seq3dim = tpu.Sequence(reg, tpu.DigitalAnalogDevice)
    seq3dim.declare_channel("ryd", "rydberg_global")
    seq3dim.declare_channel("ram", "raman_local", initial_target="A")
    seq3dim.add(pi_pulse, "ram")
    seq3dim.add(pi_pulse, "ryd")
    sim3dim = TpuEmulator.from_sequence(seq3dim)
    exp3dim = sim3dim.run().expect(
        [tensor([basis_ket(3, 0).proj(), qeye(3)])]
    )
    # Atom A was driven to 'h' then 'r': no remaining 'r'-excl. pop.
    assert np.isclose(exp3dim[0][-1], 0.0, atol=1e-10)


def test_expect_noisy_diagonal_only(seq_no_meas):
    np.random.seed(123)
    res = TpuEmulator.from_sequence(
        seq_no_meas,
        noise_model=NoiseModel(
            state_prep_error=0.01, runs=5, samples_per_run=1
        ),
    ).run()
    assert isinstance(res, NoisyResults)
    sigma_p = np.array([[0, 1], [0, 0]], dtype=complex)
    bad_op = np.kron(np.eye(2), sigma_p)
    with pytest.raises(ValueError, match="non-diagonal"):
        res.expect([bad_op])
    op = np.kron(np.eye(2), basis_ket(2, 0).proj().full())
    vals = res.expect([op])[0]
    assert np.all(np.asarray(vals) >= 0)
    assert np.all(np.asarray(vals) <= 1 + 1e-12)


def test_plot_noisy(seq_no_meas, patch_plt_show):
    np.random.seed(123)
    res = TpuEmulator.from_sequence(
        seq_no_meas,
        noise_model=NoiseModel(
            state_prep_error=0.01, runs=5, samples_per_run=1
        ),
    ).run()
    op = Qobj(np.kron(np.eye(2), basis_ket(2, 0).proj().full()))
    res.plot(op)
    res.plot(op, error_bars=False)


def test_sim_without_measurement(seq_no_meas):
    assert not seq_no_meas.is_measured()
    results_no_meas = TpuEmulator.from_sequence(seq_no_meas).run()
    np.random.seed(123)
    # The global pi pulse sends both (distant) atoms to 'r'
    assert results_no_meas.sample_final_state(1) == {"11": 1}


def test_sample_final_state(results):
    np.random.seed(1234)
    sampling = results.sample_final_state(1234)
    assert sum(sampling.values()) == 1234

    # A measurement-basis mismatch measures everything as zeros
    results[-1].matching_meas_basis = False
    sampling0 = results.sample_final_state(N_samples=911)
    assert sampling0 == {"00": 911}
    results[-1].matching_meas_basis = True


def test_sample_final_state_three_level(seq_no_meas, pi_pulse):
    seq_no_meas.declare_channel("raman", "raman_local", "B")
    seq_no_meas.add(pi_pulse, "raman")
    res_3level = TpuEmulator.from_sequence(seq_no_meas).run()
    # Digital measurement: raman pi pulse moves only atom B
    assert len(res_3level.sample_final_state()) == 2

    seq_no_meas.measure("ground-rydberg")
    res_3level_gb = TpuEmulator.from_sequence(seq_no_meas).run()
    # Rydberg measurement sees the global pulse on both atoms
    assert len(res_3level_gb.sample_final_state()) == 4


def test_results_xy(reg, pi_pulse):
    seq_ = tpu.Sequence(reg, tpu.MockDevice)
    seq_.declare_channel("ch0", "mw_global")
    seq_.add(pi_pulse, "ch0")
    seq_.measure("XY")

    results_ = TpuEmulator.from_sequence(seq_).run()

    assert results_._dim == 2
    assert results_._size == 2
    assert results_._basis_name == "XY"
    assert results_._meas_basis == "XY"
    # In XY mode the initial state is all-|u> = index 0
    init = results_.states[0].full()[:, 0]
    assert np.isclose(abs(init[0]), 1.0)

    for bad_basis in ("all", "ground-rydberg", "digital"):
        with pytest.raises(
            TypeError, match="Can't reduce a system in"
        ):
            results_.get_final_state(reduce_to_basis=bad_basis)

    state = results_.get_final_state(reduce_to_basis="XY")
    assert np.all(
        np.isclose(
            np.abs(state.full()),
            np.abs(results_.states[-1].full()),
            atol=1e-5,
        )
    )

    # Measurement projectors: 0 -> |u>, 1 -> |d>
    assert results_._meas_projector(0) == basis_ket(2, 0).proj()
    assert results_._meas_projector(1) == basis_ket(2, 1).proj()


def test_false_positive_composite():
    """A long zero-amplitude head must not corrupt the final state."""
    seq = tpu.Sequence(
        tpu.Register.square(2, 5, prefix="q"), tpu.AnalogDevice
    )
    seq.declare_channel("ryd_glob", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.CompositeWaveform(
                tpu.ConstantWaveform(2500, 0.0),
                tpu.BlackmanWaveform(1000, np.pi),
                tpu.ConstantWaveform(500, 0.0),
            ),
            0,
            0,
        ),
        channel="ryd_glob",
    )
    sim = TpuEmulator.from_sequence(seq)
    assert sim.run().get_final_state() != sim.initial_state
