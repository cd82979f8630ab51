"""TpuBackendV2 behavioral suite.

Mirrors the reference's tests/pulser_simulation/test_qutip_backend_v2.py
(callback counting, energy-expectation parity, device noise-model
preference, stochastic-noise equivalence with the legacy emulator API,
eval-time rounding robustness, leakage physics, exact aggregation,
output-state normalization, samples-based entry point).
"""

from __future__ import annotations

import dataclasses
import math
from unittest.mock import patch

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.backend.default_observables import (
    BitStrings,
    CorrelationMatrix,
    Energy,
    EnergyVariance,
    Fidelity,
    Occupation,
    StateResult,
)
from pulser_tpu.backend.observable import Callback
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.devices import AnalogDevice
from pulser_tpu.emulator import (
    Qobj,
    Solver,
    TpuBackendV2,
    TpuConfig,
    TpuEmulator,
    TpuOperator,
    TpuState,
    basis,
    qeye,
    tensor,
)
from pulser_tpu.sampler import sample


class CountCalls(Callback):
    """Counts how often the callback has been invoked."""

    def __init__(self) -> None:
        super().__init__()
        self.counter = 0

    def __call__(self, **kwargs) -> None:
        self.counter += 1


def _seq():
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, 0.0, 0.0), "ryd")
    return seq


def sequence(device=None):
    """The reference suite's two-atom adiabatic sweep sequence."""
    omega_max = 4 * 2 * math.pi
    u = omega_max / 2
    delta_0 = -6 * u
    delta_f = 2 * u
    t_rise = 500
    t_fall = 1000
    t_sweep = int((delta_f - delta_0) / (2 * np.pi * 10) * 1000)

    r_interatomic = tpu.MockDevice.rydberg_blockade_radius(u)
    reg = tpu.Register.rectangle(1, 2, r_interatomic, prefix="q")

    rise = tpu.Pulse.ConstantDetuning(
        tpu.RampWaveform(t_rise, 0.0, omega_max), delta_0, 0.0
    )
    sweep = tpu.Pulse.ConstantAmplitude(
        omega_max, tpu.RampWaveform(t_sweep, delta_0, delta_f), 0.0
    )
    fall = tpu.Pulse.ConstantDetuning(
        tpu.RampWaveform(t_fall, omega_max, 0.0), delta_f, 0.0
    )

    seq = tpu.Sequence(reg, device if device is not None else tpu.MockDevice)
    seq.declare_channel("ising_global", "rydberg_global")
    seq.add(rise, "ising_global")
    seq.add(sweep, "ising_global")
    seq.add(fall, "ising_global")
    return seq


def test_backend_v2_observable_pipeline():
    ggg = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"gggg": 1.0}
    )
    config = TpuConfig(
        observables=[
            BitStrings(evaluation_times=[1.0], num_shots=500),
            Occupation(evaluation_times=[0.5, 1.0]),
            CorrelationMatrix(evaluation_times=[1.0]),
            Energy(evaluation_times=[1.0]),
            Fidelity(ggg, evaluation_times=[1.0]),
            StateResult(evaluation_times=[1.0]),
        ],
    )
    backend = TpuBackendV2(_seq(), config=config)
    results = backend.run()
    occ = results.occupation[-1]
    assert len(occ) == 4
    assert all(0 <= float(o) <= 1 for o in occ)
    corr = results.correlation_matrix[-1]
    assert np.asarray(corr).shape == (4, 4)
    counts = results.bitstrings[-1]
    assert sum(counts.values()) == 500
    fid = float(np.real(results.fidelity[-1]))
    assert 0.0 <= fid <= 1.0
    state = results.state[-1]
    assert isinstance(state, TpuState)
    # overlap(self, self) = 1 for a normalized pure state
    assert abs(float(np.real(state.overlap(state))) - 1) < 1e-6
    energy = float(np.real(results.energy[-1]))
    assert np.isfinite(energy)


def test_backend_v2_default_config():
    backend = TpuBackendV2(_seq())
    results = backend.run()
    counts = results.bitstrings[-1]
    assert sum(counts.values()) > 0


def test_tpu_state_api():
    st = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"),
        amplitudes={"gg": 1 / np.sqrt(2), "rr": 1 / np.sqrt(2)},
    )
    assert st.n_qudits == 2
    probs = st.bitstring_probabilities()
    assert abs(probs["00"] - 0.5) < 1e-9
    assert abs(probs["11"] - 0.5) < 1e-9
    samples = st.sample(num_shots=200)
    assert sum(samples.values()) == 200
    other = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"gg": 1.0}
    )
    # overlap already returns |<a|b>|^2 for pure states
    ov = float(np.real(st.overlap(other)))
    assert abs(ov - 0.5) < 1e-9


def test_tpu_operator_api():
    op = TpuOperator.from_operator_repr(
        eigenstates=("r", "g"),
        n_qudits=2,
        operations=[(1.0, [({"rr": 1.0}, [0])])],
    )
    st = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"rg": 1.0}
    )
    applied = op.apply_to(st)
    exp = float(np.real(st.overlap(applied)))
    assert abs(exp - 1.0) < 1e-9


def test_callback():
    """A Callback fires once per sample step plus once at t=0.

    Reference: test_qutip_backend_v2.py::test_callback.
    """
    seq = sequence()

    config = TpuConfig(callbacks=[CountCalls()])
    backend = TpuBackendV2(seq, config=config)
    backend.run()
    assert backend._config.callbacks[0].counter == seq.get_duration() + 1

    config = TpuConfig(
        callbacks=[CountCalls()],
        noise_model=tpu.NoiseModel(amp_sigma=0.1),
        n_trajectories=1,
    )
    backend = TpuBackendV2(seq, config=config)
    backend.run()
    assert backend._config.callbacks[0].counter == seq.get_duration() + 1


def test_backend_v2_energy(capfd):
    """Energy observables match direct Hamiltonian expectation values."""
    seq = sequence()
    with pytest.raises(
        TypeError, match="'config' must be an instance of 'EmulationConfig'"
    ):
        TpuBackendV2(seq, config="tralala")

    config = TpuConfig(
        default_evaluation_times="Full",
        observables=[
            StateResult(),
            Energy(evaluation_times=[0.001 * n for n in range(1001)]),
        ],
        print_progress=True,
    )
    backend = TpuBackendV2(seq, config=config)
    results = backend.run()
    assert results.get_result_times("state") != results.get_result_times(
        "energy"
    )
    out, _ = capfd.readouterr()
    assert out == "Emulating Trajectory 1/1\n"
    assert (
        results.get_result("energy", 0.0)
        == results.energy[0]
        == pytest.approx(0.0)
    )
    mid_state = results.state[len(results.state) // 2].to_qobj()
    h_mid = backend._sim_obj.get_hamiltonian(seq.get_duration() // 2)
    assert results.get_result("energy", 0.5) == pytest.approx(
        np.real(h_mid.expect(mid_state)), rel=1e-5
    )
    h_end = backend._sim_obj.get_hamiltonian(seq.get_duration())
    assert (
        results.get_result("energy", 1.0)
        == results.energy[-1]
        == pytest.approx(np.real(h_end.expect(results.state[-1].to_qobj())))
    )


@pytest.mark.parametrize("print_progress", [True, False])
def test_backend_v2_default_noise_model(capfd, print_progress):
    """prefer_device_noise_model routes the device's noise to the emulator."""
    noisy_device = dataclasses.replace(
        tpu.MockDevice,
        noise_model=tpu.NoiseModel(dephasing_rate=0.01, temperature=50),
    )

    config = TpuConfig(
        observables=[StateResult(evaluation_times=[1.0])],
        noise_model=tpu.NoiseModel(p_false_neg=0.1),
        prefer_device_noise_model=True,
        initial_state=TpuState(
            tensor([basis(2, 0) for _ in range(2)]),
            eigenstates=("r", "g"),
        ),
        n_trajectories=2,
        print_progress=print_progress,
    )

    backend = TpuBackendV2(sequence(noisy_device), config=config)

    # The emulator uses the device noise model, as requested
    assert backend._sim_obj._hamiltonian_data.noise_model.p_false_neg == 0.0
    assert backend._sim_obj._hamiltonian_data.noise_model.temperature == 50
    assert (
        backend._sim_obj._hamiltonian_data.noise_model.dephasing_rate == 0.01
    )
    # However, the config keeps the noise model it was given
    assert backend._config.noise_model.p_false_neg == 0.1

    backend.run()
    out, _ = capfd.readouterr()
    # TPU-native pipeline batches both trajectories into one solve
    assert out == (
        "Emulating Trajectories [1 - 2]/2 (batched, dissipative)\n"
        if print_progress
        else ""
    )


def test_backend_v2_stochastic_noise():
    """The V2 pipeline agrees with the legacy emulator API under noise."""
    def get_noise_model(samples_per_run: int) -> tpu.NoiseModel:
        return tpu.NoiseModel(
            temperature=50.0,
            p_false_neg=0.01,
            amp_sigma=1e-3,
            samples_per_run=samples_per_run,
        )

    config = TpuConfig(
        default_evaluation_times=(1.0,),
        observables=[
            StateResult(evaluation_times=[1.0]),
            Occupation(evaluation_times=[0.001 * n for n in range(1001)]),
        ],
        noise_model=get_noise_model(samples_per_run=1),
        n_trajectories=30,
    )
    seq = sequence()
    np.random.seed(123)
    backend = TpuBackendV2(seq, config=config)

    # The trajectory count must be forwarded to the emulator
    assert backend._sim_obj.n_trajectories == config.n_trajectories

    results = backend.run()

    # Same run through the legacy API (100 bitstring samples per
    # trajectory smooth out the sampled occupation staircase)
    np.random.seed(123)
    with pytest.warns(
        DeprecationWarning,
        match="Setting samples_per_run different to 1 is",
    ):
        emulator = TpuEmulator.from_sequence(
            seq,
            noise_model=get_noise_model(samples_per_run=100),
            n_trajectories=30,
        )
    results_old_api = emulator.run()

    times = results.get_result_times("occupation")
    occupation = np.array([x[0] for x in results.occupation])

    indices = np.searchsorted(
        results_old_api._sim_times,
        np.array([int(t * seq.get_duration()) * 1e-3 for t in times]),
    )
    occupation_old_api = np.asarray(
        results_old_api.expect(
            [tensor([basis(2, 0).proj(), qeye(2)])]
        )[0]
    )[indices]

    assert np.max(np.abs(occupation - occupation_old_api)) < 0.03


def test_backend_v2_eval_times_rounding():
    """Legacy eval times never exceed the duration due to rounding.

    Sweeps durations in multiples of the clock period, requesting 100
    evaluation points each time (reference sweeps 50 durations; a
    coarser sweep covers the same rounding classes).
    """
    n_points = 100

    for duration in range(400, 600, 20):
        reg = tpu.Register({"q0": (-5, 0), "q1": (5, 0)})
        seq = tpu.Sequence(reg, AnalogDevice)
        seq.declare_channel("rydberg_global", "rydberg_global")

        amp_wf = tpu.ConstantWaveform(duration, np.pi)
        det_wf = tpu.ConstantWaveform(duration, 0.0)
        seq.add(tpu.Pulse(amp_wf, det_wf, 0), "rydberg_global")

        evaluation_times = np.linspace(0, 1, n_points).tolist()
        obs = [StateResult(evaluation_times=evaluation_times)]
        config = tpu.backend.EmulationConfig(observables=obs)

        backend = TpuBackendV2(seq, config=config)
        result = backend.run().state
        assert len(result) == n_points


@pytest.mark.parametrize("amp_sigma", [0.0, 1.0])
def test_leakage(amp_sigma):
    """Leakage populations follow the analytic exponential decay law.

    With |x><r| and |x><g| effective collapse operators at equal rate,
    each atom leaks independently of the drive, so the no-/one-/two-
    leaked populations are exactly exp(-2rt), 2(1-exp(-rt))exp(-rt)
    and (1-exp(-rt))^2. Reference: test_qutip_backend_v2.py::test_leakage.
    """
    natoms = 2
    reg = tpu.Register.rectangle(1, natoms, spacing=1000.0, prefix="q")

    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    duration = 500
    seq.add(tpu.Pulse.ConstantPulse(duration, np.pi, 0.0, 0.0), "ch0")

    # pulser basis convention: index 0 = r, 1 = g, 2 = x
    basisx = np.array([0.0, 0.0, 1.0]).reshape(3, 1)
    basisg = np.array([0.0, 1.0, 0.0]).reshape(3, 1)
    basisr = np.array([1.0, 0.0, 0.0]).reshape(3, 1)

    rate = 0.5
    eff_rate = [rate, rate]
    eff_ops = [basisx @ basisr.T, basisx @ basisg.T]  # |x><r| and |x><g|

    noise_model = tpu.NoiseModel(
        eff_noise_rates=eff_rate,
        eff_noise_opers=eff_ops,
        with_leakage=True,
        amp_sigma=amp_sigma,
    )

    eval_times = [1.0]
    config = TpuConfig(
        default_evaluation_times=eval_times,
        observables=[StateResult(evaluation_times=eval_times)],
        noise_model=noise_model,
        solver=Solver.MESOLVER,
        n_trajectories=1,
    )

    result = TpuBackendV2(seq, config=config).run()
    eigenstates = ("r", "g", "x")

    both_leaked = TpuOperator(
        tensor([Qobj(basisx @ basisx.T), Qobj(basisx @ basisx.T)]),
        eigenstates,
    )
    p_no_leaked = np.zeros((3, 3))
    p_no_leaked[0, 0] = 1.0
    p_no_leaked[1, 1] = 1.0
    one_leaked = TpuOperator(
        tensor([Qobj(basisx @ basisx.T), Qobj(p_no_leaked)]), eigenstates
    ) + TpuOperator(
        tensor([Qobj(p_no_leaked), Qobj(basisx @ basisx.T)]), eigenstates
    )
    no_leaked = TpuOperator(
        tensor([Qobj(p_no_leaked), Qobj(p_no_leaked)]), eigenstates
    )

    p_leak = 1 - math.exp(-rate * duration / 1000)
    assert one_leaked.expect(result.final_state) == pytest.approx(
        2 * p_leak * (1 - p_leak)
    )
    assert no_leaked.expect(result.final_state) == pytest.approx(
        (1 - p_leak) ** 2
    )
    assert both_leaked.expect(result.final_state) == pytest.approx(p_leak**2)


def test_register_detuning_detection():
    """register+detuning noise yields a density-matrix aggregate."""
    natoms = 2
    reg = tpu.Register.rectangle(1, natoms, spacing=1000.0, prefix="q")

    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(500, np.pi, 0.0, 0.0), "ch0")

    noise_model = tpu.NoiseModel(
        trap_depth=1.0,
        trap_waist=1.0,
        temperature=50.0,
        disable_doppler=True,
        detuning_sigma=5.0,
    )
    assert set(noise_model.noise_types) == {"register", "detuning"}

    eval_times = [1.0]
    config = TpuConfig(
        default_evaluation_times=eval_times,
        observables=[StateResult(evaluation_times=eval_times)],
        noise_model=noise_model,
        n_trajectories=10,
    )
    result = TpuBackendV2(seq, config=config).run()
    assert result.final_state._state.shape == (4, 4)  # density matrix


def test_config_type():
    assert TpuBackendV2.config_type is TpuConfig


def test_aggregation():
    """Exact aggregation of SPAM trajectories, pinned via a mocked RNG.

    The bad atoms per trajectory are forced to (q0, q0, q1, q2, q2);
    with non-interacting atoms and a pi-pulse, every good atom ends in
    |r> and every bad atom stays dark, giving exact aggregated density
    matrix, occupations and bitstring counts.
    Reference: test_qutip_backend_v2.py::test_aggregation.
    """
    reg = tpu.Register({"q0": [-1e5, 0], "q1": [1e5, 0], "q2": [0, 1e5]})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(100, np.pi), 0.0, 0.0
        ),
        "ryd",
    )

    occup = Occupation(evaluation_times=[1.0])
    state = StateResult(evaluation_times=[1.0])
    bitstrings = BitStrings(evaluation_times=[1.0])
    variance = EnergyVariance(evaluation_times=[1.0])

    config = TpuConfig(
        observables=(occup, state, bitstrings, variance),
        n_trajectories=5,
        noise_model=tpu.NoiseModel(state_prep_error=1 / 3),
    )
    with pytest.warns(
        UserWarning, match="Skipping aggregation of `energy_variance`."
    ):
        with patch(
            "pulser_tpu.hamiltonian_data.hamiltonian_data"
            ".np.random.uniform"
        ) as bad_atoms_mock:
            # The bad qubits per trajectory (0, 0, 1, 1, 2), with spare
            # draws for any extra consumption
            bad_atoms_mock.side_effect = [
                np.array([0.1, 0.5, 0.6]),
                np.array([0.1, 0.5, 0.6]),
                np.array([0.5, 0.1, 0.6]),
                np.array([0.5, 0.1, 0.6]),
                np.array([0.5, 0.6, 0.1]),
                np.array([0.1, 0.2, 0.3]),
                np.array([0.1, 0.2, 0.3]),
                np.array([0.1, 0.2, 0.3]),
            ]
            backend = TpuBackendV2(seq, config=config)
            results = backend.run()

    # Mixed state: 0.4 |grr><grr| + 0.4 |rgr><rgr| + 0.2 |rrg><rrg|
    # (in the r=0/g=1 index convention: indices 4, 2 and 1)
    expected_state = np.zeros((8, 8))
    expected_state[1, 1] = 0.2
    expected_state[2, 2] = 0.4
    expected_state[4, 4] = 0.4
    assert np.allclose(
        results.final_state.to_qobj().full(), expected_state, atol=1e-4
    )
    assert np.allclose(
        results.occupation[-1], np.array([0.6, 0.6, 0.8]), atol=1e-4
    )
    assert results.final_bitstrings == {
        "011": 2000,
        "101": 2000,
        "110": 1000,
    }
    assert "energy_variance" not in results.get_result_tags()

    # The results stay accessible through the original observables,
    # i.e. the UUIDs were preserved in the aggregation
    for obs_ in (occup, state, bitstrings):
        assert results.get_result_times(obs_) == [1.0]


def test_rounding_error_eval_time_duplication():
    """A pathological float eval time must not duplicate results."""
    seq = tpu.Sequence(tpu.Register.square(1, prefix="q"), AnalogDevice)
    seq.declare_channel("rydberg_global", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(1000, 1, 0, 0), "rydberg_global")

    dt = 0.001
    evaluation_times = np.linspace(0.0, 1.0, int(1 / dt + 1))
    config = TpuConfig(
        observables=[
            BitStrings(evaluation_times=evaluation_times),
            BitStrings(
                # This value historically tripped a rounding error
                evaluation_times=[0.49299999999999994],
                tag_suffix="mod",
            ),
        ]
    )
    TpuBackendV2(seq, config=config).run()


@pytest.mark.parametrize("amp_sigma", [0.0, 0.5])
def test_output_state_normalization(amp_sigma):
    """The emulated output state never exceeds unit norm.

    To probe the noiseless path too, the amplitude fluctuation that
    originally triggered norm > 1 is applied manually when
    amp_sigma == 0. Reference:
    test_qutip_backend_v2.py::test_output_state_normalization.
    """
    factor = 1.2357175818662465 if not amp_sigma else 1.0

    r_interatomic = 5  # um
    register = tpu.Register.hexagon(1, r_interatomic, prefix="q")
    seq = tpu.Sequence(register, tpu.MockDevice)
    seq.declare_channel("rydberg_global", "rydberg_global")

    u = AnalogDevice.interaction_coeff / r_interatomic**6
    total_duration = 4000  # ns
    interp_pts = np.linspace(0, 1, 4)

    seq.add(
        tpu.Pulse(
            tpu.InterpolatedWaveform(
                total_duration,
                u * np.array([1e-9, 0.22, 0.2181, 1e-9]) * factor,
                times=interp_pts,
            ),
            tpu.InterpolatedWaveform(
                total_duration,
                u * np.array([-1, 0.0556, 0.332, 1]),
                times=interp_pts,
            ),
            0,
        ),
        "rydberg_global",
    )

    noise_model = tpu.NoiseModel(amp_sigma=amp_sigma)
    default_config = TpuBackendV2.default_config
    np.random.seed(1234)
    config = default_config.with_changes(noise_model=noise_model)
    results = TpuBackendV2(seq, config=config).run()
    final_state = results.final_state
    assert final_state._state.norm() < 1 + 1e-8

    np.random.seed(1234)
    config = default_config.with_changes(
        noise_model=noise_model,
        # easiest way to get a fidelity close to 1
        observables=[Fidelity(final_state)],
    )
    results = TpuBackendV2(seq, config=config).run()
    assert results.fidelity[-1] < 1 + 1e-8


def test_run_twice():
    """Two noisy runs consume fresh randomness and differ."""
    seq = sequence()
    noise_model = tpu.NoiseModel(
        trap_depth=1.0,
        trap_waist=1.0,
        temperature=50.0,
        disable_doppler=True,
        detuning_sigma=5.0,
    )

    eval_times = [1.0]
    config = TpuConfig(
        default_evaluation_times=eval_times,
        observables=[StateResult(evaluation_times=eval_times)],
        noise_model=noise_model,
        n_trajectories=10,
    )
    backend = TpuBackendV2(seq, config=config)
    results1 = backend.run()
    results2 = backend.run()
    s1 = results1.final_state._state
    s2 = results2.final_state._state
    assert s1.overlap(s2) / (s1.norm() * s2.norm()) != pytest.approx(1.0)


def test_dmm_temperature_without_spot_waist():
    """Register noise + DMM without a spot waist is rejected."""
    reg = tpu.Register.from_coordinates(
        [(0.0, 0.0), (6.0, 0.0)], center=False, prefix="q"
    )
    det_map = reg.define_detuning_map({"q0": 1.0, "q1": 0.5})

    mock_device = dataclasses.replace(
        AnalogDevice.to_virtual(),
        dmm_objects=(DMM(),),
        reusable_channels=True,
    )

    seq = tpu.Sequence(reg, mock_device)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(100, 1, -1, 0), "ch0")
    seq.config_detuning_map(det_map, "dmm_0")
    seq.add_dmm_detuning(tpu.ConstantWaveform(100, -10), "dmm_0")

    config = TpuConfig(
        noise_model=tpu.NoiseModel(
            trap_waist=1, trap_depth=1, temperature=0.5
        ),
        observables=[StateResult(evaluation_times=[1.0])],
    )
    with pytest.raises(
        ValueError, match="Combining register noise with a DMM requires"
    ):
        TpuBackendV2(seq, config=config)


@pytest.mark.parametrize("modulation", [True, False])
def test_run_from_sequence_samples(modulation):
    """The samples-based entry point matches the sequence-based one."""
    seq = tpu.Sequence(tpu.Register.square(1, prefix="q"), AnalogDevice)
    seq.declare_channel("rydberg_global", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(1000, 1, 0, 0), "rydberg_global")

    config: TpuConfig | None = None
    if modulation:
        initial_state = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"g": 1.0}
        )
        config = TpuConfig(
            with_modulation=modulation,
            observables=[StateResult()],
            initial_state=initial_state,
        )
    backend = TpuBackendV2(seq, config=config)

    results1 = backend.run()
    results2 = backend.run_from_sequence_samples(
        sample(
            seq,
            modulation=modulation,
            extended_duration=seq.get_duration(include_fall_time=modulation),
        ),
        seq.register,
        seq.device,
        config=config,
    )

    s1 = results1.final_state._state.full()
    s2 = results2.final_state._state.full()
    assert np.allclose(s1, s2, atol=0, rtol=1e-16)  # really the same
