"""Shared test configuration.

Runs JAX on CPU with 8 virtual devices so multi-chip sharding code paths
are exercised without TPU hardware, and enables x64 for numerical
reference comparisons.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: the env var JAX_PLATFORMS is overridden by the axon TPU plugin in
# this image; the config flag below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from pulser_tpu.channels import DMM, Raman, Rydberg
from pulser_tpu.channels.eom import RydbergBeam, RydbergEOM
from pulser_tpu.devices import Device


@pytest.fixture
def mod_device() -> Device:
    """A maximal Device with modulated+EOM channels and two DMMs.

    Mirrors the reference's tests/conftest.py `mod_device` fixture.
    """
    return Device(
        name="ModDevice",
        dimensions=3,
        rydberg_level=70,
        max_atom_num=2000,
        max_radial_distance=1000,
        min_atom_distance=1,
        supports_slm_mask=True,
        channel_objects=(
            Rydberg.Global(
                1000,
                200,
                clock_period=1,
                min_duration=1,
                mod_bandwidth=4.0,
                eom_config=RydbergEOM(
                    mod_bandwidth=30.0,
                    limiting_beam=RydbergBeam.RED,
                    max_limiting_amp=50 * 2 * np.pi,
                    intermediate_detuning=800 * 2 * np.pi,
                    controlled_beams=(RydbergBeam.BLUE,),
                ),
            ),
            Rydberg.Local(
                2 * np.pi * 20,
                2 * np.pi * 10,
                max_targets=2,
                fixed_retarget_t=0,
                clock_period=4,
                mod_bandwidth=4.0,
                min_retarget_interval=220,
                eom_config=RydbergEOM(
                    mod_bandwidth=20.0,
                    limiting_beam=RydbergBeam.RED,
                    max_limiting_amp=60 * 2 * np.pi,
                    intermediate_detuning=700 * 2 * np.pi,
                    controlled_beams=tuple(RydbergBeam),
                ),
            ),
            Raman.Local(
                2 * np.pi * 20,
                2 * np.pi * 10,
                max_targets=2,
                fixed_retarget_t=0,
                min_retarget_interval=220,
                clock_period=4,
                mod_bandwidth=4.0,
            ),
        ),
        dmm_objects=(
            DMM(bottom_detuning=-100, total_bottom_detuning=-10000),
            DMM(
                clock_period=4,
                mod_bandwidth=4.0,
                bottom_detuning=-50,
                total_bottom_detuning=-5000,
            ),
        ),
    )


@pytest.fixture
def patch_plt_show(monkeypatch):
    """Prevents matplotlib windows from opening during tests.

    Also closes every figure on teardown: with warnings promoted to
    errors, letting >20 figures accumulate across draw-happy tests
    turns matplotlib's open-figure RuntimeWarning into order-dependent
    failures.
    """
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda: None)
    yield
    plt.close("all")
