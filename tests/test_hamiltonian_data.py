"""HamiltonianData behavior tests (validation, interactions, Lindblad).

Coverage modeled on the reference's ``tests/test_hamiltonian_data.py``;
physics expectations recomputed from the interaction and collapse-op
formulas (reference ``pulser-core/pulser/_hamiltonian_data/
hamiltonian_data.py:562-739``).
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.hamiltonian_data.hamiltonian_data import HamiltonianData
from pulser_tpu.noise_model import NoiseModel
from pulser_tpu.sampler import sample


def _seq_rydberg(reg=None):
    reg = reg or tpu.Register(
        {"a": [-4.0, 0.0], "b": [4.0, 0.0]}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ch0", "rydberg_global")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.BlackmanWaveform(200, np.pi / 5), 0.0, 0.0
        ),
        "ch0",
    )
    return seq


def _seq_xy(positions, mag_field=None):
    reg = tpu.Register(
        {f"q{i}": p for i, p in enumerate(positions)}
    )
    seq = tpu.Sequence(reg, tpu.MockDevice)
    if mag_field is not None:
        seq.set_magnetic_field(*mag_field)
    seq.declare_channel("mw", "mw_global")
    seq.add(
        tpu.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "mw"
    )
    return seq


class TestInitValidation:
    def test_rejects_non_samples(self):
        with pytest.raises(
            TypeError, match="valid SequenceSamples instance"
        ):
            HamiltonianData(None, None, None, None, None)

    def test_rejects_bad_device(self):
        seq = _seq_rydberg()
        with pytest.raises(
            TypeError, match="must be a Device or BaseDevice"
        ):
            HamiltonianData(
                sample(seq), seq.register, None, None, None
            )

    def test_rejects_unregistered_local_targets(self):
        seq = tpu.Sequence(
            tpu.Register({"q0": (0, 0), "q1": (0, 8)}),
            tpu.DigitalAnalogDevice,
        )
        seq.declare_channel("ram", "raman_local", initial_target="q0")
        seq.add(
            tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram"
        )
        other_reg = tpu.Register.square(3, spacing=6, prefix="")
        with pytest.raises(
            ValueError,
            match="targeted in Local channels should be defined",
        ):
            HamiltonianData(
                sample(seq),
                other_reg,
                tpu.DigitalAnalogDevice,
                None,
                None,
            )

    def test_rejects_empty_samples(self):
        seq = tpu.Sequence(
            tpu.Register.square(2, spacing=6, prefix="q"),
            tpu.AnalogDevice,
        )
        seq.declare_channel("ch0", "rydberg_global")
        with pytest.raises(
            ValueError, match="SequenceSamples is empty"
        ):
            HamiltonianData(sample(seq), None, None, None, None)

    def test_rejects_bad_noise_model(self):
        seq = _seq_rydberg()
        with pytest.raises(
            ValueError, match="not a valid `NoiseModel`"
        ):
            HamiltonianData(
                sample(seq),
                seq.register,
                tpu.MockDevice,
                None,
                None,
            )


def test_from_sequence_basis():
    hd = HamiltonianData.from_sequence(_seq_rydberg())
    assert hd.basis_data.basis_name == "ground-rydberg"
    assert hd.basis_data.eigenbasis == ["r", "g"]
    assert hd.basis_data.dim == 2
    assert hd.n_qudits == 2


def test_ising_interaction_matrix():
    hd = HamiltonianData.from_sequence(_seq_rydberg())
    mat = np.asarray(
        hd._interaction_matrix(
            hd.noise_trajectories[0].trajectory.register
        )
    )
    u = tpu.MockDevice.interaction_coeff / 8**6
    np.testing.assert_allclose(
        mat, [[[0.0, u], [u, 0.0]]], rtol=1e-12
    )


def test_xy_interaction_matrix_stacked():
    """XY mode: (2, N, N) with the C3 term on top, C6 below."""
    seq = _seq_xy([(-4.0, 0.0), (4.0, 0.0)])
    hd = HamiltonianData.from_sequence(seq)
    mat = np.asarray(
        hd._interaction_matrix(
            hd.noise_trajectories[0].trajectory.register
        )
    )
    assert mat.shape == (2, 2, 2)
    # Default B = (0, 0, 30): in-plane atoms are orthogonal to B, so
    # the angular factor (1 - 3cos^2) is 1
    u_xy = tpu.MockDevice.interaction_coeff_xy / 8**3
    u_ryd = tpu.MockDevice.interaction_coeff / 8**6
    np.testing.assert_allclose(mat[0, 0, 1], u_xy, rtol=1e-9)
    np.testing.assert_allclose(mat[1, 0, 1], u_ryd, rtol=1e-9)


def test_xy_angular_dependence():
    """With B along x, aligned atoms get (1 - 3cos^2 0) = -2."""
    seq = _seq_xy([(-4.0, 0.0), (4.0, 0.0)], mag_field=(30.0, 0, 0))
    hd = HamiltonianData.from_sequence(seq)
    mat = np.asarray(
        hd._interaction_matrix(
            hd.noise_trajectories[0].trajectory.register
        )
    )
    u_xy = tpu.MockDevice.interaction_coeff_xy / 8**3
    np.testing.assert_allclose(mat[0, 0, 1], -2 * u_xy, rtol=1e-9)
    # At the magic angle cos^2 = 1/3 the XY term vanishes
    magic = np.degrees(np.arccos(np.sqrt(1 / 3)))
    d = 8.0
    seq2 = _seq_xy(
        [
            (0.0, 0.0),
            (
                d * np.cos(np.radians(magic)),
                d * np.sin(np.radians(magic)),
            ),
        ],
        mag_field=(30.0, 0, 0),
    )
    hd2 = HamiltonianData.from_sequence(seq2)
    mat2 = np.asarray(
        hd2._interaction_matrix(
            hd2.noise_trajectories[0].trajectory.register
        )
    )
    assert abs(mat2[0, 0, 1]) < 1e-9 * u_xy


def test_noisy_interaction_matrix_masks_bad_atoms():
    nm = NoiseModel(
        state_prep_error=0.9, runs=1, samples_per_run=1
    )
    np.random.seed(0)
    hd = HamiltonianData.from_sequence(
        _seq_rydberg(), noise_model=nm
    )
    traj = hd.noise_trajectories[0].trajectory
    assert any(traj.bad_atoms.values())  # p=0.9 over 2 atoms
    mat = np.asarray(hd._noisy_interaction_matrix(
        traj.register, traj.bad_atoms
    ))
    for i, (q, bad) in enumerate(traj.bad_atoms.items()):
        if bad:
            assert np.all(mat[:, i, :] == 0)
            assert np.all(mat[:, :, i] == 0)


class TestLindbladData:
    """Collapse ops are stored as (coefficient, projector-name) pairs;
    projector names resolve against the eigenbasis [r, g]."""

    def _hd(self, nm):
        return HamiltonianData.from_sequence(
            _seq_rydberg(), noise_model=nm
        )

    def test_dephasing_collapse_op(self):
        rate = 0.25
        hd = self._hd(NoiseModel(dephasing_rate=rate))
        ops = hd.lindblad_data.local_collapse_ops
        assert len(ops) == 1
        coeff, name = ops[0]
        # sqrt(2*rate) * |r><r|
        assert name == "sigma_rr"
        assert np.isclose(float(coeff), np.sqrt(2 * rate))

    def test_relaxation_collapse_op(self):
        rate = 0.1
        hd = self._hd(NoiseModel(relaxation_rate=rate))
        ops = hd.lindblad_data.local_collapse_ops
        assert len(ops) == 1
        coeff, name = ops[0]
        # sqrt(rate) * |g><r|
        assert name == "sigma_gr"
        assert np.isclose(float(coeff), np.sqrt(rate))

    def test_depolarizing_pauli_decomposition(self):
        rate = 0.2
        hd = self._hd(NoiseModel(depolarizing_rate=rate))
        ld = hd.lindblad_data
        ops = ld.local_collapse_ops
        # sqrt(rate/4) * {X, Y, Z}, each expanded into projectors
        assert [name for _, name in ops] == ["x", "y", "z"]
        for coeff, _ in ops:
            assert np.isclose(float(coeff), np.sqrt(rate / 4))
        assert ld.depolarizing_pauli_2ds == {
            "x": [(1, "sigma_gr"), (1, "sigma_rg")],
            "y": [(1j, "sigma_gr"), (-1j, "sigma_rg")],
            "z": [(1, "sigma_rr"), (-1, "sigma_gg")],
        }

    def test_eff_noise_ops_forwarded(self):
        op = np.array([[0.0, 1.0], [0.0, 0.0]])
        hd = self._hd(
            NoiseModel(
                eff_noise_rates=[0.3], eff_noise_opers=[op]
            )
        )
        ops = hd.lindblad_data.local_collapse_ops
        assert len(ops) == 1
        coeff, mat = ops[0]
        assert np.isclose(float(coeff), np.sqrt(0.3))
        np.testing.assert_allclose(np.asarray(mat), op)


def test_trajectory_count_and_reps():
    """SPAM-only noise dedupes bad-atom configs into reps."""
    nm = NoiseModel(
        state_prep_error=0.1, runs=30, samples_per_run=1
    )
    np.random.seed(42)
    hd = HamiltonianData.from_sequence(
        _seq_rydberg(), noise_model=nm, n_trajectories=30
    )
    trajs = hd.noise_trajectories
    assert sum(t.reps for t in trajs) == 30
    assert len(trajs) <= 4  # only 2^2 distinct bad-atom configs


def test_shot_to_shot_disables_dedup():
    nm = NoiseModel(amp_sigma=0.05, runs=10, samples_per_run=1)
    np.random.seed(42)
    hd = HamiltonianData.from_sequence(
        _seq_rydberg(), noise_model=nm, n_trajectories=10
    )
    trajs = hd.noise_trajectories
    assert len(trajs) == 10
    assert all(t.reps == 1 for t in trajs)


def test_hf_detuning_generation_matches_formula():
    """δ_hf(t) = Σ_k sqrt(2·Δω_k·psd_k)·cos(ω_k t + φ_k) against a
    direct loop implementation (reference hamiltonian_data tests)."""
    from pulser_tpu.hamiltonian_data.hamiltonian_data import (
        _generate_detuning_fluctuations,
    )

    psd = (1.0, 2.0, 3.0)
    freqs = (3.0, 4.0, 5.0)
    times = np.arange(0, 10, 0.1)
    np.random.seed(21)
    phases = np.random.uniform(0, 2 * np.pi, size=(2,))
    nm = NoiseModel(
        detuning_hf_psd=psd, detuning_hf_omegas=freqs
    )
    out = _generate_detuning_fluctuations(nm, 0.5, phases, times)

    expected = np.full_like(times, 0.5)
    t_us = times * 1e-3
    for i, s in enumerate(psd[1:]):
        df = freqs[i + 1] - freqs[i]
        expected += np.sqrt(2 * df * s) * np.cos(
            freqs[i + 1] * t_us + phases[i]
        )
    np.testing.assert_allclose(out, expected, atol=1e-12)
    assert out.size == times.size


@pytest.mark.parametrize(
    "kwargs, expected",
    [
        (dict(temperature=30.0, runs=2, samples_per_run=1), True),
        (
            dict(amp_sigma=0.1, runs=2, samples_per_run=1),
            True,
        ),
        (dict(laser_waist=100.0), False),
        (
            dict(detuning_sigma=0.1, runs=2, samples_per_run=1),
            True,
        ),
        (
            dict(
                temperature=30.0,
                trap_waist=1.0,
                trap_depth=150.0,
                runs=2,
                samples_per_run=1,
            ),
            True,
        ),
        (dict(dephasing_rate=0.2), False),
        (dict(state_prep_error=0.1, runs=2, samples_per_run=1), False),
    ],
)
def test_has_shot_to_shot_except_spam(kwargs, expected):
    from pulser_tpu.hamiltonian_data import (
        has_shot_to_shot_except_spam,
    )

    nm = NoiseModel(**kwargs)
    assert has_shot_to_shot_except_spam(nm) is expected
