"""SimConfig construction/conversion suite.

Mirrors the reference's
``tests/pulser_simulation/test_simconfig.py`` (172 LoC): string
rendering, temperature conversion, effective-noise operator
validation incl. leakage shapes, and NoiseModel round-trip conversion
(reference ``pulser-simulation/pulser_simulation/simconfig.py``).
"""

from __future__ import annotations

import numpy as np
import pytest

from pulser_tpu.emulator.qobj import Qobj, qeye
from pulser_tpu.emulator.simconfig import SimConfig
from pulser_tpu.noise_model import NoiseModel, _doppler_sigma

pytestmark = pytest.mark.filterwarnings(
    "ignore:'SimConfig' has been deprecated:DeprecationWarning",
    "ignore:.*'NoiseModel.runs' is deprecated:DeprecationWarning",
    "ignore:Setting samples_per_run different to 1"
    " is:DeprecationWarning",
)


@pytest.fixture
def matrices():
    pauli = {}
    pauli["I"] = qeye(2)
    pauli["X"] = Qobj(np.array([[0.0, 1.0], [1.0, 0.0]]))
    pauli["Zh"] = 0.5 * Qobj(np.diag([1.0, -1.0]))
    pauli["ket"] = Qobj(np.array([[1.0], [2.0]]))
    pauli["I3"] = qeye(3)
    pauli["I4"] = qeye(4)
    return pauli


def test_init():
    with pytest.deprecated_call(
        match="'SimConfig' has been deprecated"
    ):
        config = SimConfig(
            noise=("SPAM", "doppler", "dephasing", "amplitude"),
            temperature=1000.0,
            runs=100,
        )
    expected_temperature = 1000.0
    runs = 100

    assert config.temperature == expected_temperature * 1e-6  # in K
    str_config = config.__str__(True)
    assert "SPAM, doppler, dephasing, amplitude" in str_config
    assert (
        f"{expected_temperature}µK" in str_config
        and f"{runs}" in str_config
        and "Solver Options" in str_config
    )
    assert (
        config.to_noise_model().temperature == expected_temperature
    )
    config = SimConfig(
        noise=("depolarizing", "relaxation", "doppler")
    )
    expected_temperature = 50.0
    assert config.temperature == pytest.approx(
        expected_temperature * 1.0e-6
    )
    assert (
        config.to_noise_model().temperature == expected_temperature
    )
    str_config = config.__str__(True)
    assert (
        "depolarizing" in str_config and "relaxation" in str_config
    )
    assert (
        f"Depolarizing rate: {config.depolarizing_rate}"
        in str_config
    )
    assert (
        f"Relaxation rate: {config.relaxation_rate}" in str_config
    )
    config = SimConfig(
        noise="eff_noise",
        eff_noise_opers=[qeye(2), Qobj(np.array([[0, 1], [1, 0]]))],
        eff_noise_rates=[0.3, 0.7],
    )
    str_config = config.__str__(True)
    assert config.doppler_sigma == _doppler_sigma(
        expected_temperature * 1e-6
    )
    assert (
        "Effective noise rates" in str_config
        and "Effective noise operators" in str_config
    )

    with pytest.raises(
        TypeError, match="'temperature' must be a float"
    ):
        SimConfig(temperature="0.0")
    with pytest.raises(ValueError, match="SPAM parameter"):
        SimConfig(eta=-1.0)
    with pytest.raises(
        ValueError,
        match="'amp_sigma' must be greater than or equal to zero",
    ):
        SimConfig(amp_sigma=-0.001)

    with pytest.raises(
        ValueError, match="'bad_noise' is not a valid noise type."
    ):
        SimConfig(noise=("bad_noise",))


def test_eff_noise_opers(matrices):
    with pytest.raises(
        ValueError, match="The operators list length"
    ):
        SimConfig(noise=("eff_noise"), eff_noise_rates=[1.0])
    with pytest.raises(
        TypeError, match="eff_noise_rates is a list of floats"
    ):
        SimConfig(
            noise=("eff_noise"),
            eff_noise_rates=["0.1"],
            eff_noise_opers=[qeye(2)],
        )
    with pytest.raises(
        ValueError,
        match="The effective noise parameters have not been filled.",
    ):
        SimConfig(noise=("eff_noise"))
    with pytest.raises(TypeError, match="is not a Qobj."):
        SimConfig(
            noise=("eff_noise"),
            eff_noise_opers=[2.0],
            eff_noise_rates=[1.0],
        )
    with pytest.raises(
        TypeError, match="to be of Qutip type 'oper'."
    ):
        SimConfig(
            noise=("eff_noise"),
            eff_noise_opers=[matrices["ket"]],
            eff_noise_rates=[1.0],
        )
    with pytest.raises(
        ValueError, match="With leakage, operator's shape"
    ):
        SimConfig(
            noise=("eff_noise", "leakage"),
            eff_noise_opers=[matrices["I"]],
            eff_noise_rates=[1.0],
        )
    with pytest.raises(
        ValueError, match="With leakage, operator's shape"
    ):
        SimConfig(
            noise=("eff_noise", "leakage"),
            eff_noise_opers=[qeye(5)],
            eff_noise_rates=[1.0],
        )
    with pytest.raises(
        ValueError, match="Without leakage, operator's shape"
    ):
        SimConfig(
            noise=("eff_noise",),
            eff_noise_opers=[matrices["I4"]],
            eff_noise_rates=[1.0],
        )
    SimConfig(
        noise=("eff_noise"),
        eff_noise_opers=[matrices["X"], matrices["I"]],
        eff_noise_rates=[0.5, 0.5],
    )


def test_noise_model_conversion():
    noise_model = NoiseModel(
        p_false_neg=0.4,
        p_false_pos=0.1,
        amp_sigma=1e-3,
        runs=10,
        samples_per_run=1,
    )
    expected_simconfig = SimConfig(
        noise=("SPAM", "amplitude"),
        epsilon=0.1,
        epsilon_prime=0.4,
        eta=0.0,
        amp_sigma=1e-3,
        laser_waist=float("inf"),
        runs=10,
        samples_per_run=1,
    )
    assert (
        SimConfig.from_noise_model(noise_model) == expected_simconfig
    )
    assert expected_simconfig.to_noise_model() == noise_model
