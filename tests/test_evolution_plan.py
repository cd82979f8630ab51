"""Evolution-plan compiler unit tests (grid, staging, segments).

The plan builder is the host-side "compiler" every solver consumes
(``pulser_tpu/ops/solver.py::build_plan``, with a C++ fast path in
``pulser_tpu/native``); these tests pin its contract directly.
"""

from __future__ import annotations

import numpy as np

from pulser_tpu.ops.solver import (
    BatchedPlan,
    build_plan,
    build_plan_batched,
)


def _plan(duration_ns=10, eval_times=(0.005, 0.01), max_step=None):
    knots = np.arange(duration_ns) / 1000.0
    coeffs = {
        "amp": np.linspace(0, 1, duration_ns).reshape(1, 1, -1)
        * (1 + 0j),
        "det": np.zeros((1, 1, duration_ns)),
    }
    return build_plan(
        knots, coeffs, np.asarray(eval_times), max_step=max_step
    )


def test_grid_contains_knots_and_eval_times():
    plan = _plan(eval_times=(0.0042, 0.009))
    for t in (0.0042, 0.009):
        assert np.any(np.isclose(plan.grid, t))
    # Knots all present
    for t in np.arange(10) / 1000.0:
        assert np.any(np.isclose(plan.grid, t))


def test_max_step_subdivides_intervals():
    plan = _plan(max_step=0.00025)
    dts = np.diff(plan.grid)
    assert np.all(dts <= 0.00025 * (1 + 1e-9))


def test_eval_map_handles_duplicate_times():
    plan = _plan(eval_times=(0.005, 0.005 + 1e-12, 0.009))
    # Both near-identical inputs map to one unique slot
    assert plan.n_eval == 2
    assert plan.eval_map.tolist() == [0, 0, 1]


def test_segments_end_at_eval_times():
    plan = _plan(eval_times=(0.003, 0.007))
    n_seg, seg_len = plan.seg_dts.shape
    assert n_seg == 2
    # Segment sums = inter-eval durations
    np.testing.assert_allclose(
        plan.seg_dts.sum(axis=1), [0.003, 0.004], atol=1e-12
    )
    # Padding is start-aligned: zero dts only at segment starts
    for s in range(n_seg):
        nz = np.nonzero(plan.seg_dts[s])[0]
        if len(nz):
            assert np.all(plan.seg_dts[s][nz[0] :] > 0)


def test_stage_values_interpolate_linearly():
    plan = _plan()
    amp = plan.seg_stage("amp")  # (n_seg, L, 3, 1, 1)
    # The half-step stage is the midpoint of the endpoints
    stage = amp[..., 0, 0]
    mid = 0.5 * (stage[..., 0] + stage[..., 2])
    np.testing.assert_allclose(
        stage[..., 1].real, mid.real, atol=1e-12
    )


def test_eval_time_at_zero():
    plan = _plan(eval_times=(0.0, 0.009))
    assert plan.n_eval == 2
    # t=0 is a zero-length segment
    assert np.isclose(plan.seg_dts[0].sum(), 0.0)


def test_stage_knots_match_host_staging():
    """The knot gather indices + fractions reproduce the host-staged
    values exactly (they drive the on-device staging)."""
    plan = _plan(max_step=0.0004)
    assert plan.stage_knots is not None
    idx0, idx1, frac = plan.stage_knots
    knots = np.arange(10) / 1000.0
    raw = np.linspace(0, 1, 10)
    staged = raw[idx0] * (1 - frac) + raw[idx1] * frac
    expected = plan.stage_arrays["amp"][..., 0, 0].real
    np.testing.assert_allclose(staged, expected, atol=1e-12)


def test_batched_plan_matches_per_trajectory_plans():
    knots = np.arange(10) / 1000.0
    eval_times = np.asarray([0.004, 0.009])
    rng = np.random.RandomState(0)
    coeffs = [
        {
            "amp": rng.random((1, 2, 10)) * (1 + 0j),
            "det": rng.random((1, 2, 10)),
        }
        for _ in range(3)
    ]
    singles = [
        build_plan(knots, c, eval_times, max_step=0.0004)
        for c in coeffs
    ]
    batched = build_plan_batched(
        knots,
        {
            "amp": np.stack([c["amp"] for c in coeffs]),
            "det": np.stack([c["det"] for c in coeffs]),
        },
        eval_times,
        max_step=0.0004,
    )
    assert isinstance(batched, BatchedPlan)
    assert batched.n_traj == 3
    stacked = batched.seg_stage_b("amp")
    for t, single in enumerate(singles):
        np.testing.assert_allclose(
            stacked[t], single.seg_stage("amp"), atol=1e-12
        )
    np.testing.assert_array_equal(
        batched.plan.seg_dts, singles[0].seg_dts
    )


def test_host_stage_skip():
    knots = np.arange(10) / 1000.0
    bp = build_plan_batched(
        knots,
        {
            "amp": np.ones((2, 1, 1, 10), complex),
            "det": np.zeros((2, 1, 1, 10)),
        },
        np.asarray([0.009]),
        max_step=0.0005,
        host_stage=False,
    )
    # No staged arrays beyond t_stage, but raw coeffs + knots kept
    assert set(bp.plan.stage_arrays) == {"t_stage"}
    assert bp.raw_coeffs is not None
    idx0, idx1, frac = bp.seg_knots()
    assert idx0.shape == bp.plan.seg_dts.shape + (3,)
