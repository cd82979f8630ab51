"""Parity suite for the row-batched MCWF Pallas kernel.

The rows kernel is the DEFAULT noisy-emulation path for diagonal
collapse operators (``solver._mcsolve_pallas_rows``); these tests pin
it trajectory-for-trajectory against the vmapped XLA quantum-jump
solver (interpret mode — the CPU test mesh has no Mosaic), through
both the raw solver API and the public emulator, plus the
vmap-invariance of the shared RNG draws and the affine transfer
compression it rides on.
"""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pulser_tpu as tpu
from pulser_tpu.emulator import TpuEmulator
from pulser_tpu.ops import solver as S


def _mk_plans(rng, n, n_traj, knots_count=41, host_stage=False):
    knots = np.linspace(0.0, 2.0, knots_count)
    amp = np.stack(
        [
            (0.5 * (1.5 + 0.1 * rng.standard_normal((1, n, 1))))
            * np.exp(
                1j * 0.3 * rng.standard_normal((1, n, knots_count))
            )
            * np.sin(np.pi * knots / 2.0) ** 2
            for _ in range(n_traj)
        ]
    )
    det = np.stack(
        [
            2.0
            * rng.standard_normal((1, n, 1))
            * np.ones((1, n, knots_count))
            + np.linspace(-3, 3, knots_count)
            for _ in range(n_traj)
        ]
    )
    return S.build_plan_batched(
        knots,
        {"amp": amp, "det": det},
        np.array([0.0, 1.0, 2.0]),
        max_step=4e-3,
        host_stage=host_stage,
    )


@pytest.mark.parametrize("host_stage", [False, True])
def test_rows_kernel_matches_xla_vmap(monkeypatch, host_stage):
    """rows == XLA vmap, trajectory for trajectory, both staging
    modes (raw-knot fused program and pre-staged fallback)."""
    rng = np.random.default_rng(7)
    n, n_traj = 6, 5
    dim = 2**n
    plans = _mk_plans(rng, n, n_traj, host_stage=host_stage)
    diags = np.stack([rng.uniform(0, 5, dim) for _ in range(n_traj)])
    gamma = 0.05
    cop = np.sqrt(gamma) * np.diag([1.0, -1.0]).astype(complex)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    common = dict(
        pairs=((1, 0, 0),),
        d=2,
        n=n,
        collapse_ops=[cop],
        seeds=[11, 22, 33, 44, 55],
        dtype=np.complex64,
        mesh=None,
        ip=True,
    )

    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "0")
    ref = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    new = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    assert S.last_solve_info.get("kind") == "mcwf_rows_pallas"
    assert ref.shape == new.shape == (n_traj, 3, dim)
    np.testing.assert_allclose(np.abs(ref - new).max(), 0, atol=5e-5)
    for t in range(n_traj):
        fid = abs(np.vdot(ref[t, -1], new[t, -1])) ** 2
        assert fid > 1 - 1e-6


def test_rows_kernel_multiple_collapse_channels(monkeypatch):
    """Channel selection (searchsorted order, k outer / q inner)
    matches the XLA path with several diagonal collapse operators."""
    rng = np.random.default_rng(3)
    n, n_traj = 5, 4
    dim = 2**n
    plans = _mk_plans(rng, n, n_traj)
    diags = np.stack([rng.uniform(0, 4, dim) for _ in range(n_traj)])
    cops = [
        np.sqrt(0.25) * np.diag([1.0, -1.0]).astype(complex),
        np.sqrt(0.15) * np.diag([0.0, 1.0]).astype(complex),
    ]
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    common = dict(
        pairs=((1, 0, 0),),
        d=2,
        n=n,
        collapse_ops=cops,
        seeds=list(range(101, 101 + n_traj)),
        dtype=np.complex64,
        mesh=None,
        ip=True,
    )
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "0")
    ref = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    new = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    assert S.last_solve_info.get("kind") == "mcwf_rows_pallas"
    np.testing.assert_allclose(np.abs(ref - new).max(), 0, atol=5e-5)


def test_non_diagonal_cops_fall_back(monkeypatch):
    """A non-diagonal collapse operator must not take the rows path."""
    rng = np.random.default_rng(5)
    n, n_traj = 4, 3
    dim = 2**n
    plans = _mk_plans(rng, n, n_traj)
    diags = np.stack([rng.uniform(0, 4, dim) for _ in range(n_traj)])
    sx = 0.2 * np.array([[0.0, 1.0], [1.0, 0.0]], complex)
    psi0 = np.zeros(dim, complex)
    psi0[0] = 1.0
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    S.last_solve_info.clear()
    S.mcsolve_rk4_batched(
        psi0.astype(np.complex64),
        plans,
        diags,
        pairs=((1, 0, 0),),
        d=2,
        n=n,
        collapse_ops=[sx],
        seeds=[1, 2, 3],
        dtype=np.complex64,
        mesh=None,
        ip=False,
    )
    assert S.last_solve_info.get("kind") != "mcwf_rows_pallas"


def test_emulator_noisy_run_uses_rows_kernel(monkeypatch):
    """Public-API noisy run takes the rows path and its sampled
    populations match the XLA path exactly (same RNG draws).

    Sharding is disabled because the rows kernel is the SINGLE-chip
    trajectory path (on a multi-chip mesh the batch shards over
    devices instead — covered by test_parallel.py), and x64 is
    toggled off because the f32 kernel only engages at the TPU's
    native complex64 (the test suite enables x64 globally)."""
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    # Exact count parity requires the HOST sampler on both sides:
    # the fused on-device multinomial consumes the same uniforms in
    # state order instead of bitstring order (equal in distribution,
    # not draw for draw) — it has its own suite below.
    monkeypatch.setenv("PULSER_TPU_FUSED_SAMPLING", "0")
    jax.config.update("jax_enable_x64", False)
    try:
        _run_emulator_parity(monkeypatch)
    finally:
        jax.config.update("jax_enable_x64", True)


def _run_emulator_parity(monkeypatch):
    reg = tpu.Register.rectangle(2, 2, spacing=7.0, prefix="q")

    def run():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(400, 2 * np.pi, -1.0, 0.0), "ryd"
        )
        noise = tpu.NoiseModel(
            dephasing_rate=0.08,
            amp_sigma=0.02,
            temperature=40.0,
            runs=6,
            samples_per_run=4,
        )
        np.random.seed(77)
        sim = TpuEmulator.from_sequence(
            seq, noise_model=noise, evaluation_times="Minimal"
        )
        res = sim.run()
        return dict(res.results[-1])

    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    pops_rows = run()
    assert S.last_solve_info.get("kind") == "mcwf_rows_pallas"
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "0")
    pops_xla = run()
    assert S.last_solve_info.get("kind") != "mcwf_rows_pallas"
    assert set(pops_rows) == set(pops_xla)
    for k in pops_rows:
        assert pops_rows[k] == pytest.approx(pops_xla[k], abs=1e-9)


def test_uniforms_vmap_invariance():
    """The batched RNG program reproduces the per-seed serial draws
    bit for bit (threefry is counter-based, so vmap == loop)."""
    seeds = [11, 22, 33]
    seg_shape = (4, 6)
    r0_b, us_b = S._mcwf_uniforms(seeds, seg_shape, np.float32)
    for i, sd in enumerate(seeds):
        key = jax.random.split(
            jax.random.PRNGKey(jnp.asarray(sd, dtype=jnp.uint32)), 1
        )[0]
        key, k0, ku = jax.random.split(key, 3)
        r0 = np.asarray(jax.random.uniform(k0, dtype=np.float32))
        us = np.asarray(
            jax.random.uniform(
                ku, seg_shape + (2,), dtype=np.float32
            )
        )
        assert np.array_equal(np.asarray(r0_b)[i], r0)
        assert np.array_equal(np.asarray(us_b)[i], us)


def test_affine_compress_roundtrip_and_rejection():
    rng = np.random.default_rng(0)
    base = np.sin(np.linspace(0, 3, 50))[None, None, :] * np.ones(
        (1, 3, 50)
    )
    m = rng.uniform(0.5, 1.5, (8, 1, 3))
    c = rng.uniform(-0.2, 0.2, (8, 1, 3))
    arr = m[..., None] * base[None] + c[..., None]
    cache: dict = {}
    comp = S._affine_traj_compress(arr, np.float32, cache)
    assert comp is not None
    recon = np.asarray(S._affine_expand(comp))
    np.testing.assert_allclose(recon, arr, atol=1e-5)
    # cached-index spot path on a fresh draw
    arr2 = (m * 1.1)[..., None] * base[None] + c[..., None]
    comp2 = S._affine_traj_compress(arr2, np.float32, cache)
    assert comp2 is not None
    np.testing.assert_allclose(
        np.asarray(S._affine_expand(comp2)), arr2, atol=1e-5
    )
    # non-affine data is rejected (full transfer fallback)
    bad = arr.copy()
    bad[3, 0, 1, 25] += 1.0
    assert S._affine_traj_compress(bad, np.float32) is None
    # and rejected through the spot-check path too (the perturbed
    # column is a spot column only by luck, so perturb many)
    bad2 = arr + rng.uniform(0.1, 0.2, arr.shape)
    assert S._affine_traj_compress(bad2, np.float32, cache) is None


def test_affine_compress_handles_zero_rows():
    """All-zero coefficient rows (e.g. a dark channel) compress."""
    arr = np.zeros((4, 1, 2, 30))
    arr[:, 0, 0, :] = np.linspace(0, 1, 30)[None, :] * np.array(
        [1.0, 2.0, 3.0, 4.0]
    )[:, None]
    comp = S._affine_traj_compress(arr, np.float32)
    assert comp is not None
    np.testing.assert_allclose(
        np.asarray(S._affine_expand(comp)), arr, atol=1e-6
    )


def test_rows_kernel_trajectory_blocked(monkeypatch):
    """Trajectory-axis grid blocking (tb < T) and a smaller step
    chunk produce the same states as the unblocked kernel — the
    configuration larger-than-VMEM batches dispatch to."""
    rng = np.random.default_rng(11)
    n, n_traj = 5, 12
    dim = 2**n
    plans = _mk_plans(rng, n, n_traj)
    diags = np.stack(
        [rng.uniform(0, 4, dim) for _ in range(n_traj)]
    )
    cop = np.sqrt(0.1) * np.diag([1.0, -1.0]).astype(complex)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    common = dict(
        pairs=((1, 0, 0),),
        d=2,
        n=n,
        collapse_ops=[cop],
        seeds=list(range(7, 7 + n_traj)),
        dtype=np.complex64,
        mesh=None,
        ip=True,
    )
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    ref = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    assert S.last_solve_info.get("kind") == "mcwf_rows_pallas"
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS_TB", "8")
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS_CHUNK", "16")
    blocked = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    np.testing.assert_allclose(
        np.abs(ref - blocked).max(), 0, atol=1e-6
    )


def test_rows_sampled_codes_match_states_epilogue(monkeypatch):
    """The fused on-device multinomial samples the same distribution
    as host sampling of the rows-path states.

    With identical uniforms, the device epilogue (f32 cumsum +
    strict-less count) and a float64 host replay over the SAME
    states may only disagree on draws whose uniform lands within
    f32 rounding of a cumsum boundary — asserted to be a <2%
    minority — and the state-index histograms must agree closely.
    """
    rng = np.random.default_rng(19)
    n, n_traj = 5, 6
    dim = 2**n
    plans = _mk_plans(rng, n, n_traj)
    diags = np.stack(
        [rng.uniform(0, 4, dim) for _ in range(n_traj)]
    )
    cop = np.sqrt(0.08) * np.diag([1.0, -1.0]).astype(complex)
    psi0 = np.zeros(dim, complex)
    psi0[-1] = 1.0
    seeds = list(range(51, 51 + n_traj))
    common = dict(
        pairs=((1, 0, 0),),
        d=2,
        n=n,
        collapse_ops=[cop],
        seeds=seeds,
        dtype=np.complex64,
        mesh=None,
        ip=True,
    )
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PULSER_TPU_MCWF_ROWS", "1")
    states = S.mcsolve_rk4_batched(
        psi0.astype(np.complex64), plans, diags, **common
    )
    assert S.last_solve_info.get("kind") == "mcwf_rows_pallas"

    n_eval = states.shape[1]
    draws_per_row = 40
    n_entries = n_traj * n_eval
    row_traj = np.repeat(
        np.arange(n_traj, dtype=np.int64), n_eval
    )
    row_ti = np.tile(np.arange(n_eval, dtype=np.int64), n_traj)
    rng2 = np.random.default_rng(5)
    samp_u = rng2.random((n_entries, draws_per_row))
    codes = S.mcsolve_rows_codes(
        psi0.astype(np.complex64),
        plans,
        diags,
        sample_spec=(samp_u, row_traj, row_ti),
        **common,
    )
    assert codes is not None
    assert codes.shape == (n_entries, draws_per_row)
    assert S.last_solve_info.get("sampled") is True

    # Host replay in float64 over the same (rows-path) states
    probs = np.abs(states.astype(np.complex128)) ** 2
    expected = np.empty_like(codes, dtype=np.int64)
    for e in range(n_entries):
        p = probs[row_traj[e], row_ti[e]]
        cum = np.cumsum(p)
        expected[e] = np.searchsorted(cum, samp_u[e] * cum[-1])
    mismatch = np.mean(codes.astype(np.int64) != expected)
    assert mismatch < 0.02, f"boundary mismatches: {mismatch:.3f}"
    # Histogram agreement over all draws
    n_draws = codes.size
    h_dev = np.bincount(codes.ravel(), minlength=dim)
    h_exp = np.bincount(expected.ravel(), minlength=dim)
    assert np.abs(h_dev - h_exp).sum() <= 0.04 * n_draws

    # Determinism
    codes2 = S.mcsolve_rows_codes(
        psi0.astype(np.complex64),
        plans,
        diags,
        sample_spec=(samp_u, row_traj, row_ti),
        **common,
    )
    np.testing.assert_array_equal(codes, codes2)


def test_counts_rows_fused_fallback_matches_host_sampler():
    """With the rows kernel unavailable, the fused-counts entry falls
    back internally to host sampling and reproduces
    ``_sample_runs_vectorized`` draw for draw (same RNG stream)."""
    reg = tpu.Register.rectangle(1, 3, spacing=7.0, prefix="q")

    def build():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantDetuning(
                tpu.RampWaveform(400, 0.0, 2 * np.pi * 1.5),
                -4.0,
                0.0,
            ),
            "ryd",
        )
        return seq

    noise = tpu.NoiseModel(
        state_prep_error=0.005,
        p_false_pos=0.01,
        p_false_neg=0.02,
        temperature=50.0,
        amp_sigma=0.02,
        laser_waist=175.0,
        dephasing_rate=0.05,
        runs=8,
        samples_per_run=5,
    )

    def run(kill_fused):
        np.random.seed(7)
        sim = TpuEmulator.from_sequence(
            build(), noise_model=noise, evaluation_times="Minimal"
        )
        assert sim._can_batch_lindblad()
        if kill_fused:
            sim._counts_rows_fused = lambda **kw: None
        return sim.run().results[-1]

    fused = run(kill_fused=False)
    host = run(kill_fused=True)
    assert fused == host


def test_counts_rows_fused_device_sampling_distribution(monkeypatch):
    """Public-API noisy run through the fused on-device sampler:
    deterministic under a fixed seed and distribution-compatible
    with the host sampler."""
    monkeypatch.setenv("PULSER_TPU_DISABLE_SHARDING", "1")
    monkeypatch.setenv("PULSER_TPU_PALLAS_INTERPRET", "1")
    jax.config.update("jax_enable_x64", False)
    try:
        reg = tpu.Register.rectangle(2, 2, spacing=7.0, prefix="q")

        def run(fused):
            monkeypatch.setenv(
                "PULSER_TPU_FUSED_SAMPLING", "1" if fused else "0"
            )
            seq = tpu.Sequence(reg, tpu.MockDevice)
            seq.declare_channel("ryd", "rydberg_global")
            seq.add(
                tpu.Pulse.ConstantPulse(400, 2 * np.pi, -1.0, 0.0),
                "ryd",
            )
            noise = tpu.NoiseModel(
                dephasing_rate=0.08,
                amp_sigma=0.02,
                temperature=40.0,
                p_false_pos=0.05,
                runs=10,
                samples_per_run=40,
            )
            np.random.seed(77)
            sim = TpuEmulator.from_sequence(
                seq, noise_model=noise, evaluation_times="Minimal"
            )
            res = sim.run()
            return dict(res.results[-1])

        pops = run(fused=True)
        assert S.last_solve_info.get("sampled") is True
        assert sum(pops.values()) == pytest.approx(1.0)
        pops2 = run(fused=True)
        assert pops == pops2
        ref = run(fused=False)
        assert S.last_solve_info.get("sampled") is not True
        l1 = sum(
            abs(pops.get(k, 0) - ref.get(k, 0))
            for k in set(pops) | set(ref)
        )
        # 400 samples: generous statistical tolerance
        assert l1 < 0.35
    finally:
        jax.config.update("jax_enable_x64", True)


def test_counts_rows_fused_varying_reps_matches_host_sampler():
    """SPAM-only stochastic noise dedupes trajectories into varying
    repetition counts — the row-padded draw layout must reproduce
    the host sampler exactly through the internal fallback."""
    reg = tpu.Register.rectangle(1, 3, spacing=7.0, prefix="q")

    def build():
        seq = tpu.Sequence(reg, tpu.MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            tpu.Pulse.ConstantPulse(300, 2 * np.pi, -1.0, 0.0),
            "ryd",
        )
        return seq

    noise = tpu.NoiseModel(
        state_prep_error=0.25,  # heavy: many duplicate bad-atom sets
        dephasing_rate=0.05,
        runs=12,
        samples_per_run=3,
    )

    def run(kill_fused):
        np.random.seed(31)
        sim = TpuEmulator.from_sequence(
            build(), noise_model=noise, evaluation_times="Minimal"
        )
        assert sim._can_batch_lindblad()
        if kill_fused:
            sim._counts_rows_fused = lambda **kw: None
        res = sim.run()
        return res.results[-1]

    np.random.seed(31)
    sim_probe = TpuEmulator.from_sequence(
        build(), noise_model=noise, evaluation_times="Minimal"
    )
    sim_probe._refresh_trajectories()
    reps = [r for _, r in sim_probe._hamiltonian_data.noise_trajectories]
    assert max(reps) > 1, f"dedup must produce reps > 1, got {reps}"

    assert run(kill_fused=False) == run(kill_fused=True)
