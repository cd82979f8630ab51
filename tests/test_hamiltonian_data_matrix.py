"""HamiltonianData error matrix, interaction values, noisy samples.

Complements tests/test_hamiltonian_data.py with the reference's
init/from_sequence error matrices, exact two-atom interaction values,
bad-atom marking, and correlated detuning-fluctuation structure
(reference tests/test_hamiltonian_data.py:184-341, 377-535).
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.hamiltonian_data.hamiltonian_data import HamiltonianData
from pulser_tpu.noise_model import NoiseModel
from pulser_tpu.sampler import sample


def _seq_with_slm(channel="rydberg_global"):
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", channel)
    seq.config_slm_mask(["q0"])
    seq.add(tpu.Pulse.ConstantPulse(200, 1, 0, 0), "ch0")
    return seq


def _seq_local():
    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_local", initial_target="q0")
    seq.add(tpu.Pulse.ConstantPulse(200, 1, 0, 0), "ch0")
    return seq


class TestInitErrorMatrix:
    def test_samples_type(self):
        with pytest.raises(
            TypeError, match="valid SequenceSamples instance"
        ):
            HamiltonianData(None, None, None, None, None)

    def test_device_type(self):
        seq = _seq_with_slm()
        with pytest.raises(
            TypeError, match="must be a Device or BaseDevice"
        ):
            HamiltonianData(sample(seq), None, None, None, None)

    def test_slm_unsupported_by_device(self):
        seq = _seq_with_slm()
        with pytest.raises(
            ValueError,
            match="SLM mask but device does not have one",
        ):
            HamiltonianData(
                sample(seq), seq.register, tpu.AnalogDevice, None, None
            )

    def test_slm_targets_not_in_register(self):
        seq = _seq_with_slm()
        other_reg = tpu.Register.square(3, spacing=6, prefix="")
        with pytest.raises(
            ValueError, match="SLM mask should be defined in register"
        ):
            HamiltonianData(
                sample(seq),
                other_reg,
                tpu.DigitalAnalogDevice,
                None,
                None,
            )

    def test_local_targets_not_in_register(self):
        seq = _seq_local()
        other_reg = tpu.Register.square(3, spacing=6, prefix="")
        with pytest.raises(
            ValueError,
            match="Local channels should be defined in register",
        ):
            HamiltonianData(
                sample(seq),
                other_reg,
                tpu.DigitalAnalogDevice,
                None,
                None,
            )

    def test_noise_model_required(self):
        seq = _seq_with_slm()
        with pytest.raises(
            ValueError, match="not a valid `NoiseModel`"
        ):
            HamiltonianData(
                sample(seq), seq.register, tpu.MockDevice, None, None
            )

    def test_empty_samples(self):
        reg = tpu.Register.square(3, spacing=6, prefix="")
        seq = tpu.Sequence(reg, tpu.AnalogDevice)
        seq.declare_channel("ch0", "rydberg_global")
        with pytest.raises(ValueError, match="empty"):
            HamiltonianData(sample(seq), None, None, None, None)

    def test_basis_unsupported_by_device(self):
        seq = _seq_with_slm("mw_global")
        with pytest.raises(
            ValueError, match="supported by device"
        ):
            HamiltonianData(
                sample(seq),
                seq.register,
                tpu.DigitalAnalogDevice,
                None,
                None,
            )


class TestFromSequenceErrors:
    def test_sequence_type(self):
        with pytest.raises(
            TypeError, match="valid pulser.Sequence instance"
        ):
            HamiltonianData.from_sequence(None)

    def test_no_instructions(self):
        reg = tpu.Register.square(2, spacing=6.0, prefix="q")
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ch0", "rydberg_global")
        with pytest.raises(
            ValueError, match="No instructions given"
        ):
            HamiltonianData.from_sequence(seq)

    def test_slm_with_modulation_unsupported(self):
        with pytest.raises(
            NotImplementedError,
            match="SLM mask and output modulation",
        ):
            HamiltonianData.from_sequence(
                _seq_with_slm(), with_modulation=True
            )

    def test_register_property(self):
        seq = _seq_with_slm()
        assert (
            HamiltonianData.from_sequence(seq).register == seq.register
        )


def test_all_atoms_bad_at_unit_state_prep_error():
    seq = _seq_with_slm()
    noise = NoiseModel(state_prep_error=1.0)
    ham = HamiltonianData.from_sequence(
        seq, noise_model=noise, n_trajectories=1
    )
    traj = ham.noise_trajectories[0].trajectory
    for key in seq.register.qubit_ids:
        assert traj.bad_atoms[key]


class TestTwoAtomInteractionValues:
    """Exact C6/r^6 and C3/r^3 entries for an 8-um-separated pair."""

    def _two_atom_seq(self, channel_type):
        reg = tpu.Register(
            {"batman": [-4.0, 0.0], "superman": [4.0, 0.0]}
        )
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ch0", channel_type)
        seq.add(
            tpu.Pulse.ConstantDetuning(
                tpu.BlackmanWaveform(200, np.pi / 5), 0.0, 0.0
            ),
            "ch0",
        )
        return seq

    def test_rydberg_interaction(self):
        ham = HamiltonianData.from_sequence(
            self._two_atom_seq("rydberg_global")
        )
        u = tpu.MockDevice.interaction_coeff / 8.0**6
        # The Ising interaction comes stacked with a leading (1,) axis
        np.testing.assert_allclose(
            np.asarray(
                ham._interaction_matrix(
                    ham.noise_trajectories[0].trajectory.register
                ),
                dtype=float,
            ),
            [[[0.0, u], [u, 0.0]]],
        )

    def test_xy_interaction_stack(self):
        ham = HamiltonianData.from_sequence(
            self._two_atom_seq("mw_global")
        )
        u_xy = tpu.MockDevice.interaction_coeff_xy / 8.0**3
        u_ryd = tpu.MockDevice.interaction_coeff / 8.0**6
        np.testing.assert_allclose(
            np.asarray(
                ham._interaction_matrix(
                    ham.noise_trajectories[0].trajectory.register
                ),
                dtype=float,
            ),
            [
                [[0.0, u_xy], [u_xy, 0.0]],
                [[0.0, u_ryd], [u_ryd, 0.0]],
            ],
        )


def test_detuning_fluctuations_are_global_per_trajectory():
    """detuning_sigma draws one offset per trajectory, common to all
    qubits: the noisy-minus-clean detuning must be identical across
    qubits and nonzero (reference test_from_sequence:324-341)."""
    seq = _seq_with_slm()
    noise = NoiseModel(detuning_sigma=0.5)
    np.random.seed(42)
    ham = HamiltonianData.from_sequence(
        seq, noise_model=noise, n_trajectories=1
    )
    noiseless = ham.samples.to_nested_dict(all_local=True)
    noisy = next(iter(ham.noisy_samples)).samples.to_nested_dict()
    qids = list(seq.register.qubit_ids)
    diff0 = (
        noiseless["Local"]["ground-rydberg"][qids[0]]["det"]
        - noisy["Local"]["ground-rydberg"][qids[0]]["det"]
    )
    assert not np.any(np.isclose(diff0, 0.0))
    for qid in qids[1:]:
        diff = (
            noiseless["Local"]["ground-rydberg"][qid]["det"]
            - noisy["Local"]["ground-rydberg"][qid]["det"]
        )
        np.testing.assert_allclose(diff, diff0)


def test_noisy_interaction_matrix_zeroes_bad_atom_rows():
    np.random.seed(0xDEADBEEF)
    q_dict = {
        "batman": [-4.0, 0.0],
        "superman": [4.0, 0.0],
        "ironman": [0.0, 4.0],
        "aquaman": [0.0, -4.0],
    }
    reg = tpu.Register(q_dict)
    seq = tpu.Sequence(reg, tpu.AnalogDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(200, np.pi / 5), 0.0, 0.0
        ),
        "ch0",
    )
    noise = NoiseModel(state_prep_error=0.5)
    ham = HamiltonianData.from_sequence(
        seq, noise_model=noise, n_trajectories=3
    )
    for traj_w_reps in ham.noise_trajectories:
        traj = traj_w_reps.trajectory
        matrix = np.asarray(traj.interaction_matrix, dtype=float)[0]
        for i, qid in enumerate(q_dict):
            if traj.bad_atoms[qid]:
                assert np.all(matrix[i, :] == 0)
                assert np.all(matrix[:, i] == 0)
    # With p=0.5 over 4 qubits x 3 trajectories, some atom must have
    # been marked bad under this seed
    assert any(
        any(t.trajectory.bad_atoms.values())
        for t in ham.noise_trajectories
    )


def test_int_qubit_ids():
    with pytest.warns(DeprecationWarning, match="QubitId"):
        reg = tpu.Register({0: [-4.0, 0.0], 1: [4.0, 0.0]})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(200, 1, 0, 0), "ch0")
    ham = HamiltonianData.from_sequence(seq)
    assert ham.n_qudits == 2
    traj = ham.noise_trajectories[0].trajectory
    assert set(traj.bad_atoms) == {0, 1}
