"""NoiseModel construction matrix: params -> noise types, warnings.

Mirrors the reference's tests/test_noise_model.py TestNoiseModel init
matrix, unused-param warnings, bool-like validation and repr checks.
"""

from __future__ import annotations

import contextlib
import re
import warnings

import numpy as np
import pytest

from pulser_tpu.noise_model import _PARAM_TO_NOISE_TYPE, NoiseModel


@pytest.mark.parametrize(
    "params, noise_types",
    [
        (set(), set()),
        ({"disable_doppler"}, set()),
        ({"p_false_pos", "dephasing_rate"}, {"SPAM", "dephasing"}),
        (
            {
                "state_prep_error",
                "relaxation_rate",
                "runs",
                "samples_per_run",
            },
            {"SPAM", "relaxation"},
        ),
        (
            {
                "temperature",
                "depolarizing_rate",
                "runs",
                "samples_per_run",
            },
            {"doppler", "depolarizing"},
        ),
        (
            {
                "temperature",
                "depolarizing_rate",
                "runs",
                "samples_per_run",
                "disable_doppler",
            },
            {"depolarizing"},
        ),
        ({"amp_sigma", "runs", "samples_per_run"}, {"amplitude"}),
        (
            {"laser_waist", "hyperfine_dephasing_rate"},
            {"amplitude", "dephasing"},
        ),
        (
            {"detuning_sigma", "runs", "samples_per_run"},
            {"detuning"},
        ),
        (
            {
                "temperature",
                "trap_waist",
                "trap_depth",
                "runs",
                "samples_per_run",
            },
            {"doppler", "register"},
        ),
        (
            {
                "temperature",
                "trap_waist",
                "trap_depth",
                "runs",
                "samples_per_run",
                "disable_doppler",
            },
            {"register"},
        ),
        ({"dmm_sigma", "runs", "samples_per_run"}, {"dmm_sigma"}),
        ({"detuning_map_spot_waist"}, {"dmm_crosstalk"}),
    ],
)
def test_init_param_to_noise_types(params, noise_types):
    with (
        pytest.deprecated_call(match="NoiseModel.runs")
        if "runs" in params
        else contextlib.nullcontext()
    ):
        noise_model = NoiseModel(
            **{
                p: (1.0 if p != "disable_doppler" else True)
                for p in params
            }
        )
    assert set(noise_model.noise_types) == noise_types
    relevant_params = NoiseModel._find_relevant_params(
        noise_types,
        noise_model.state_prep_error,
        noise_model.amp_sigma,
        noise_model.laser_waist,
    )
    assert "disable_doppler" not in relevant_params
    assert noise_model.disable_doppler == (
        "disable_doppler" in params
    )
    params = params - {"disable_doppler"}
    assert all(getattr(noise_model, p) == 1.0 for p in params)
    assert all(
        not getattr(noise_model, p) for p in relevant_params - params
    )


@pytest.mark.parametrize(
    "noise_param", ["relaxation_rate", "p_false_neg", "laser_waist"]
)
@pytest.mark.parametrize(
    "unused_param", ["runs", "samples_per_run"]
)
@pytest.mark.filterwarnings(
    "ignore:.*'NoiseModel.runs' is deprecated:DeprecationWarning"
)
def test_unused_params_warn(unused_param, noise_param):
    with pytest.warns(
        UserWarning,
        match=re.escape(
            f"'{unused_param}' is not used by any active noise type in"
            f" {(_PARAM_TO_NOISE_TYPE[noise_param],)} when the only"
        ),
    ):
        if unused_param == "samples_per_run":
            with pytest.deprecated_call(
                match="samples_per_run"
            ):
                NoiseModel(**{unused_param: 100, noise_param: 1.0})
        else:
            NoiseModel(**{unused_param: 100, noise_param: 1.0})


class TestBoolLike:
    @pytest.mark.parametrize("value", [False, True])
    def test_valid_bools(self, value):
        noise_model = NoiseModel(
            eff_noise_rates=[0.1],
            eff_noise_opers=[np.eye(3) if value else np.eye(2)],
            with_leakage=value,
        )
        assert noise_model.with_leakage == value
        noise_model = NoiseModel(disable_doppler=value)
        assert noise_model.disable_doppler == value

    @pytest.mark.parametrize("value", [0, 1, 0.1])
    def test_non_bools_rejected(self, value):
        with pytest.raises(
            ValueError, match="'with_leakage' must be a boolean"
        ):
            NoiseModel(
                eff_noise_rates=[0.1],
                eff_noise_opers=[np.eye(3) if value else np.eye(2)],
                with_leakage=value,
            )
        with pytest.raises(
            ValueError, match="'disable_doppler' must be a boolean"
        ):
            NoiseModel(disable_doppler=value)


class TestRelevantParams:
    def test_spam_with_state_prep(self):
        # With state_prep_error > 0, runs/samples become relevant
        params = NoiseModel._find_relevant_params(
            {"SPAM"}, 0.005, 0.0, None
        )
        assert {
            "state_prep_error",
            "p_false_pos",
            "p_false_neg",
            "runs",
            "samples_per_run",
        } <= params
        # Without it, they aren't
        params = NoiseModel._find_relevant_params(
            {"SPAM"}, 0.0, 0.0, None
        )
        assert params == {
            "state_prep_error",
            "p_false_pos",
            "p_false_neg",
        }

    def test_amplitude_sigma_controls_runs(self):
        # A stochastic amplitude (sigma > 0) makes runs relevant
        params = NoiseModel._find_relevant_params(
            {"amplitude"}, 0.0, 0.5, None
        )
        assert {"amp_sigma", "runs", "samples_per_run"} <= params
        # A deterministic waist-only amplitude profile does not
        params = NoiseModel._find_relevant_params(
            {"amplitude"}, 0.0, 0.0, 100.0
        )
        assert params == {"amp_sigma", "laser_waist"}

    def test_doppler_and_register(self):
        assert NoiseModel._find_relevant_params(
            {"doppler"}, 0.0, 0.0, None
        ) >= {"temperature", "runs", "samples_per_run"}
        assert NoiseModel._find_relevant_params(
            {"register"}, 0.0, 0.0, None
        ) >= {
            "trap_waist",
            "trap_depth",
            "temperature",
            "runs",
            "samples_per_run",
        }


def test_repr_shows_only_relevant_params():
    assert repr(NoiseModel(p_false_pos=0.1)) == (
        "NoiseModel(noise_types=('SPAM',), state_prep_error=0.0, "
        "p_false_pos=0.1, p_false_neg=0.0)"
    )
    assert repr(NoiseModel(dephasing_rate=0.2)) == (
        "NoiseModel(noise_types=('dephasing',), dephasing_rate=0.2, "
        "hyperfine_dephasing_rate=0.0)"
    )


def test_samples_per_run_deprecation():
    with pytest.deprecated_call(match="samples_per_run"):
        with warnings.catch_warnings():
            warnings.simplefilter(
                "ignore", UserWarning
            )  # unused-param warning
            NoiseModel(samples_per_run=5)


class TestRegisterNoiseParams:
    def test_all_params_defined_no_warning(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with pytest.deprecated_call(match="NoiseModel.runs"):
                nm = NoiseModel(
                    temperature=30.0,
                    trap_waist=1.0,
                    trap_depth=150.0,
                    runs=1,
                    samples_per_run=1,
                )
        assert "register" in nm.noise_types

    @pytest.mark.filterwarnings(
        "ignore:.*'NoiseModel.runs' is deprecated:DeprecationWarning"
    )
    def test_partial_trap_params_invalid(self):
        # Defining only one of waist/depth cannot activate register
        # noise consistently: it must raise or leave it inactive.
        try:
            nm = NoiseModel(
                temperature=30.0,
                trap_waist=1.0,
                runs=1,
                samples_per_run=1,
            )
        except ValueError:
            return
        assert "register" not in nm.noise_types

    def test_register_sigmas_positive(self):
        from pulser_tpu.noise_model import _register_sigma_xy_z

        sigma_xy, sigma_z = _register_sigma_xy_z(
            temperature=30.0, trap_waist=1.0, trap_depth=150.0
        )
        assert sigma_xy > 0 and sigma_z > sigma_xy
        # Hotter atoms fluctuate more; deeper traps confine better
        hot_xy, _ = _register_sigma_xy_z(60.0, 1.0, 150.0)
        deep_xy, _ = _register_sigma_xy_z(30.0, 1.0, 300.0)
        assert hot_xy > sigma_xy > deep_xy
