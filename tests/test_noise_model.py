"""NoiseModel validation, derivation and serialization tests.

Coverage modeled on the reference's ``tests/test_noise_model.py``
(parameter registry, auto-derived noise types, value validation,
effective-noise operator rules, relevant-params logic, summaries).
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.noise_model import (
    _NOISE_TYPE_PARAMS,
    _PARAM_TO_NOISE_TYPE,
    NoiseModel,
    _doppler_sigma,
)


def test_param_registry_is_consistent():
    """Every parameter maps back to exactly one noise type."""
    seen: dict[str, str] = {}
    for noise_type, params in _NOISE_TYPE_PARAMS.items():
        for p in params:
            assert p not in seen, f"{p} owned by two noise types"
            seen[p] = noise_type
    assert seen == _PARAM_TO_NOISE_TYPE


@pytest.mark.parametrize(
    "kwargs, expected_types",
    [
        ({}, set()),
        ({"disable_doppler": True}, set()),
        (
            {"p_false_pos": 0.1, "dephasing_rate": 0.2},
            {"SPAM", "dephasing"},
        ),
        (
            {
                "state_prep_error": 0.05,
                "relaxation_rate": 0.01,
                "runs": 10,
                "samples_per_run": 2,
            },
            {"SPAM", "relaxation"},
        ),
        (
            {
                "temperature": 50.0,
                "depolarizing_rate": 0.05,
                "runs": 10,
                "samples_per_run": 2,
            },
            {"doppler", "depolarizing"},
        ),
        (
            {
                "temperature": 50.0,
                "depolarizing_rate": 0.05,
                "runs": 10,
                "samples_per_run": 2,
                "disable_doppler": True,
            },
            {"depolarizing"},
        ),
        (
            {"amp_sigma": 0.1, "runs": 10, "samples_per_run": 2},
            {"amplitude"},
        ),
        (
            {"laser_waist": 100.0, "hyperfine_dephasing_rate": 0.2},
            {"amplitude", "dephasing"},
        ),
        (
            {"detuning_sigma": 0.3, "runs": 5, "samples_per_run": 1},
            {"detuning"},
        ),
        (
            {
                "temperature": 50.0,
                "trap_waist": 1.0,
                "trap_depth": 150.0,
                "runs": 5,
                "samples_per_run": 1,
            },
            {"doppler", "register"},
        ),
        (
            {"dmm_sigma": 0.2, "runs": 5, "samples_per_run": 1},
            {"dmm_sigma"},
        ),
        ({"detuning_map_spot_waist": 1.5}, {"dmm_crosstalk"}),
    ],
)
def test_noise_types_derived_from_params(kwargs, expected_types):
    nm = NoiseModel(**kwargs)
    assert set(nm.noise_types) == expected_types


def test_noise_types_are_sorted_and_hashable():
    nm = NoiseModel(
        dephasing_rate=0.1, relaxation_rate=0.2, p_false_neg=0.3
    )
    assert nm.noise_types == tuple(sorted(nm.noise_types))
    assert hash(nm) == hash(
        NoiseModel(
            dephasing_rate=0.1, relaxation_rate=0.2, p_false_neg=0.3
        )
    )


@pytest.mark.parametrize("param", ["runs", "samples_per_run"])
def test_strict_positive_params(param):
    base = {"amp_sigma": 0.1, "runs": 5, "samples_per_run": 2}
    base[param] = 0
    with pytest.raises(
        ValueError, match=f"'{param}' must be greater than zero"
    ):
        NoiseModel(**base)


@pytest.mark.parametrize(
    "param",
    [
        "dephasing_rate",
        "hyperfine_dephasing_rate",
        "relaxation_rate",
        "depolarizing_rate",
        "temperature",
        "detuning_sigma",
    ],
)
def test_rate_like_params_reject_negatives(param):
    kwargs = {param: -1.0}
    if param in ("temperature", "detuning_sigma"):
        kwargs.update(runs=5, samples_per_run=2)
    with pytest.raises(
        ValueError,
        match=f"'{param}' must be greater than or equal to zero",
    ):
        NoiseModel(**kwargs)


@pytest.mark.parametrize(
    "param", ["state_prep_error", "p_false_pos", "p_false_neg", "amp_sigma"]
)
@pytest.mark.parametrize("value", [-0.1, 1.1])
def test_probability_like_params_bounded(param, value):
    kwargs = {param: value}
    if param in ("state_prep_error", "amp_sigma"):
        kwargs.update(runs=5, samples_per_run=2)
    with pytest.raises(ValueError, match=f"'{param}' must be"):
        NoiseModel(**kwargs)


class TestEffNoise:
    def test_requires_matching_lengths(self):
        with pytest.raises(ValueError, match="must be equal"):
            NoiseModel(
                eff_noise_rates=[0.1, 0.2],
                eff_noise_opers=[np.eye(2)],
            )

    def test_rejects_negative_rates(self):
        with pytest.raises(
            ValueError, match="rates must be greater than 0"
        ):
            NoiseModel(
                eff_noise_rates=[-0.1], eff_noise_opers=[np.eye(2)]
            )

    def test_rejects_non_numeric_rates(self):
        with pytest.raises(TypeError, match="list of floats"):
            NoiseModel(
                eff_noise_rates=["0.1"], eff_noise_opers=[np.eye(2)]
            )

    def test_rejects_empty_contents(self):
        # noise_types is derived, so the constructor can't request
        # eff_noise without parameters — but the legacy SimConfig can
        with pytest.raises(ValueError, match="have not been filled"):
            NoiseModel._check_eff_noise([], [], True, False)
        from pulser_tpu.emulator import SimConfig

        with pytest.warns(DeprecationWarning), pytest.raises(
            ValueError, match="have not been filled"
        ):
            SimConfig(noise=("eff_noise",))

    @pytest.mark.parametrize(
        "dim, with_leakage, ok",
        [
            (2, False, True),
            (3, False, True),
            (4, False, False),
            (2, True, False),
            (3, True, True),
            (4, True, True),
            (5, True, False),
        ],
    )
    def test_operator_shapes(self, dim, with_leakage, ok):
        kwargs = dict(
            eff_noise_rates=[0.1],
            eff_noise_opers=[np.eye(dim)],
            with_leakage=with_leakage,
        )
        if ok:
            nm = NoiseModel(**kwargs)
            assert "eff_noise" in nm.noise_types
            assert nm.with_leakage == with_leakage
        else:
            with pytest.raises(ValueError, match="operator's shape"):
                NoiseModel(**kwargs)

    def test_rejects_non_2d(self):
        with pytest.raises(ValueError, match="not a 2D array"):
            NoiseModel(
                eff_noise_rates=[0.1],
                eff_noise_opers=[np.ones(4)],
            )

    def test_rejects_uncastable(self):
        with pytest.raises(TypeError, match="not castable"):
            NoiseModel(
                eff_noise_rates=[0.1],
                eff_noise_opers=[{"not": "an array"}],
            )

    def test_leakage_requires_eff_noise(self):
        with pytest.raises(
            ValueError,
            match="At least one effective noise operator must be "
            "defined to simulate leakage",
        ):
            NoiseModel(with_leakage=True)


def test_doppler_sigma_physics():
    """sigma = KEFF * sqrt(kB * T / m) with T in Kelvin."""
    import pulser_tpu.constants as constants

    t_k = 50e-6
    expected = constants.KEFF * np.sqrt(
        constants.KB * t_k / constants.MASS
    )
    assert np.isclose(_doppler_sigma(t_k), expected)


def test_register_sigma_xy_z_relation():
    """sigma_z/sigma_xy = (pi/lambda)*sqrt(2)*waist (position spread
    is larger along the optical axis)."""
    nm = NoiseModel(
        temperature=50.0,
        trap_waist=1.0,
        trap_depth=150.0,
        runs=1,
        samples_per_run=1,
    )
    import pulser_tpu.constants as constants

    sxy = np.sqrt(
        (nm.temperature * nm.trap_waist**2) / (4 * nm.trap_depth)
    )
    sz = (
        (np.pi / constants.TRAP_WAVELENGTH)
        * np.sqrt(2)
        * nm.trap_waist
        * sxy
    )
    assert sz > sxy  # axial spread dominates


def test_relevant_params_spam():
    relevant = NoiseModel._find_relevant_params(
        {"SPAM"}, 0.1, 0.0, None
    )
    assert relevant == {
        "state_prep_error",
        "p_false_pos",
        "p_false_neg",
        "runs",
        "samples_per_run",
    }
    # Without state-prep error there's nothing stochastic: runs and
    # samples_per_run are irrelevant
    relevant = NoiseModel._find_relevant_params({"SPAM"}, 0.0, 0.0, None)
    assert relevant == {
        "state_prep_error",
        "p_false_pos",
        "p_false_neg",
    }


def test_relevant_params_amplitude():
    # An undefined laser waist is discarded from the relevant set
    assert NoiseModel._find_relevant_params(
        {"amplitude"}, 0.0, 0.5, None
    ) == {"amp_sigma", "runs", "samples_per_run"}
    # Deterministic waist-only amplitude noise needs no averaging
    assert NoiseModel._find_relevant_params(
        {"amplitude"}, 0.0, 0.0, 100.0
    ) == {"amp_sigma", "laser_waist"}


def test_relevant_params_doppler_and_register():
    assert NoiseModel._find_relevant_params(
        {"doppler"}, 0.0, 0.0, None
    ) == {"temperature", "runs", "samples_per_run"}
    assert NoiseModel._find_relevant_params(
        {"register"}, 0.0, 0.0, None
    ) == {
        "temperature",
        "trap_waist",
        "trap_depth",
        "runs",
        "samples_per_run",
    }


def test_repr_shows_only_relevant_params():
    nm = NoiseModel(p_false_pos=0.1)
    r = repr(nm)
    assert "p_false_pos=0.1" in r
    assert "dephasing_rate" not in r
    assert r.startswith("NoiseModel(noise_types=('SPAM',)")


def test_equality_ignores_irrelevant_differences():
    a = NoiseModel(dephasing_rate=0.5)
    b = NoiseModel(dephasing_rate=0.5)
    c = NoiseModel(dephasing_rate=0.6)
    assert a == b
    assert a != c
    assert a != "not a noise model"


def test_eq_with_eff_noise_operators():
    op = np.array([[0, 1], [0, 0]], dtype=complex)
    a = NoiseModel(eff_noise_rates=[0.2], eff_noise_opers=[op])
    b = NoiseModel(
        eff_noise_rates=[0.2], eff_noise_opers=[op.copy()]
    )
    assert a == b
    assert hash(a) == hash(b)


def test_abstract_repr_roundtrip():
    nm = NoiseModel(
        state_prep_error=0.05,
        p_false_pos=0.01,
        p_false_neg=0.02,
        temperature=30.0,
        laser_waist=120.0,
        amp_sigma=0.03,
        dephasing_rate=0.1,
        runs=12,
        samples_per_run=3,
    )
    s = nm.to_abstract_repr()
    back = NoiseModel.from_abstract_repr(s)
    assert back == nm


def test_abstract_repr_roundtrip_eff_noise():
    nm = NoiseModel(
        eff_noise_rates=[0.1, 0.2],
        eff_noise_opers=[
            np.eye(2),
            np.array([[0, 1j], [-1j, 0]]),
        ],
    )
    back = NoiseModel.from_abstract_repr(nm.to_abstract_repr())
    assert back == nm
    np.testing.assert_array_equal(
        np.asarray(back.eff_noise_opers[1]),
        np.array([[0, 1j], [-1j, 0]]),
    )


def test_from_abstract_repr_rejects_non_string():
    with pytest.raises(TypeError, match="must be given as a string"):
        NoiseModel.from_abstract_repr({"noise_types": []})


def test_noise_table_and_summary():
    nm = NoiseModel(
        dephasing_rate=0.3, p_false_pos=0.1, state_prep_error=0.05
    )
    table = nm.get_noise_table()
    # Rate params are reported as coherence times (T2* = 1/rate µs)
    assert table["T2* (r-g)"] == (pytest.approx(1 / 0.3), "µs")
    assert table["p_false_pos"] == (0.1, "")
    assert table["state_prep_error"] == (0.05, "")
    text = nm.summary()
    # Dephasing appears as its coherence time, SPAM as probabilities
    assert "T2* (r-g)" in text
    assert re.search(r"False Positive Meas. Probability: 0\.1", text)
    assert "State Preparation Error" in text


def test_used_by_device():
    """A device can embed a default noise model."""
    dev = tpu.MockDevice
    assert dev.default_noise_model is None


def test_noise_model_in_emulation_config():
    from pulser_tpu.backend import EmulationConfig

    nm = NoiseModel(dephasing_rate=0.2)
    with pytest.warns(UserWarning, match="without any observables"):
        cfg = EmulationConfig(noise_model=nm)
    assert cfg.noise_model == nm
    with pytest.warns(UserWarning, match="without any observables"):
        with pytest.raises(TypeError, match="must be a NoiseModel"):
            EmulationConfig(noise_model="dephasing")
