"""Register/layout + NoiseModel behavior parity vs the reference."""

from __future__ import annotations

import sys

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.register import RegisterLayout

sys.path.insert(0, "/root/reference/pulser-core")
ref = pytest.importorskip("pulser")


def _coords(reg):
    return np.stack(
        [np.asarray(v, dtype=float) for v in reg.qubits.values()]
    )


@pytest.mark.parametrize(
    "method,args",
    [
        ("square", (3,)),
        ("rectangle", (2, 4)),
        ("triangular_lattice", (3, 4)),
        ("hexagon", (2,)),
    ],
)
def test_register_generators_parity(method, args):
    mine = getattr(tpu.Register, method)(*args, spacing=5.0)
    theirs = getattr(ref.Register, method)(*args, spacing=5.0)
    np.testing.assert_allclose(_coords(mine), _coords(theirs))
    assert list(mine.qubits) == list(theirs.qubits)


def test_register_rotation_and_centering():
    mine = tpu.Register.square(2, spacing=4.0).rotated(45)
    theirs = ref.Register.square(2, spacing=4.0).rotated(45)
    np.testing.assert_allclose(
        _coords(mine), _coords(theirs), atol=1e-12
    )


def test_layout_define_register_and_hash():
    coords = [[0.0, 0.0], [5.0, 0.0], [0.0, 5.0], [5.0, 5.0]]
    mine = RegisterLayout(coords)
    theirs = ref.register.RegisterLayout(coords)
    assert mine.number_of_traps == theirs.number_of_traps
    # The static hash is part of the wire format
    assert mine.static_hash() == theirs.static_hash()
    reg_m = mine.define_register(0, 3, qubit_ids=["a", "b"])
    reg_t = theirs.define_register(0, 3, qubit_ids=["a", "b"])
    np.testing.assert_allclose(_coords(reg_m), _coords(reg_t))


def test_noise_model_relevant_params_parity():
    cases = [
        dict(dephasing_rate=0.1),
        dict(p_false_pos=0.1, p_false_neg=0.02),
        dict(temperature=30.0),
        dict(amp_sigma=0.1, laser_waist=100.0, runs=10,
             samples_per_run=1),
    ]
    for kw in cases:
        mine = tpu.NoiseModel(**kw)
        theirs = ref.NoiseModel(**kw)
        assert set(mine.noise_types) == set(theirs.noise_types)


def test_noise_model_validation_parity():
    for bad_kw in (
        dict(dephasing_rate=-1.0),
        dict(p_false_pos=1.5),
        dict(amp_sigma=-0.1),
    ):
        with pytest.raises(ValueError):
            tpu.NoiseModel(**bad_kw)
        with pytest.raises(ValueError):
            ref.NoiseModel(**bad_kw)


def test_noise_trajectory_draws_bit_exact():
    """Seeded noise trajectories must reproduce the reference draws."""
    from pulser_tpu.hamiltonian_data import HamiltonianData
    from pulser_tpu.sampler import sample as tpu_sample

    reg = tpu.Register.square(2, spacing=6.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
    nm = tpu.NoiseModel(
        temperature=30.0,
        amp_sigma=0.05,
        laser_waist=120.0,
        runs=3,
        samples_per_run=1,
    )
    samples = tpu_sample(seq).extend_duration(
        seq.get_duration() + 1
    )
    np.random.seed(42)
    hd_mine = HamiltonianData(
        samples, reg, tpu.MockDevice, nm, 3
    )
    trajs_mine = [
        traj for traj, _, _ in hd_mine.noisy_samples
    ]

    import pulser.sampler as ref_sampler
    from pulser._hamiltonian_data.hamiltonian_data import (
        HamiltonianData as RefHD,
    )

    ref_reg = ref.Register.square(2, spacing=6.0, prefix="q")
    ref_seq = ref.Sequence(ref_reg, ref.MockDevice)
    ref_seq.declare_channel("ryd", "rydberg_global")
    ref_seq.add(ref.Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
    ref_nm = ref.NoiseModel(
        temperature=30.0,
        amp_sigma=0.05,
        laser_waist=120.0,
        runs=3,
        samples_per_run=1,
    )
    ref_samples = ref_sampler.sample(ref_seq).extend_duration(
        ref_seq.get_duration() + 1
    )
    np.random.seed(42)
    hd_ref = RefHD(ref_samples, ref_reg, ref.MockDevice, ref_nm, 3)
    trajs_ref = [traj for traj, _, _ in hd_ref.noisy_samples]

    assert len(trajs_mine) == len(trajs_ref)
    for tm, tr in zip(trajs_mine, trajs_ref):
        dm = tm.doppler_detune
        dr = tr.doppler_detune
        assert list(dm) == list(dr)
        np.testing.assert_allclose(
            [float(dm[k]) for k in dm],
            [float(dr[k]) for k in dr],
        )
