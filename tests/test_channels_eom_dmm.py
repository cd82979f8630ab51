"""Channel, EOM-physics and DMM behavior tests.

Coverage modeled on the reference's ``tests/test_channels.py``,
``tests/test_eom.py`` and ``tests/test_dmm.py``; the detuning-off
expectations are recomputed from the EOM lightshift formulas
(reference ``pulser-core/pulser/channels/eom.py:227-330``).
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels import DMM, Microwave, Raman, Rydberg
from pulser_tpu.channels.base_channel import EIGENSTATES, STATES_RANK
from pulser_tpu.channels.eom import RydbergBeam, RydbergEOM
from pulser_tpu.devices import AnalogDevice, MockDevice
from pulser_tpu.pulse import Pulse
from pulser_tpu.waveforms import BlackmanWaveform


class TestChannelValidation:
    @pytest.mark.parametrize(
        "kwargs, msg",
        [
            ({"clock_period": 0}, "must be greater than zero"),
            ({"min_duration": -2}, "must be greater than zero"),
            ({"max_duration": -1}, "must be greater than zero"),
            ({"mod_bandwidth": -1e4}, "must be greater than zero"),
            (
                {"min_avg_amp": -1e-3},
                "must be greater than or equal to zero",
            ),
        ],
    )
    def test_bad_global_channel(self, kwargs, msg):
        with pytest.raises(ValueError, match=msg):
            Rydberg.Global(2 * np.pi * 20, 2 * np.pi * 2.5, **kwargs)

    def test_bad_local_channel(self):
        with pytest.raises(
            ValueError, match="'max_targets' must be greater than zero"
        ):
            Raman.Local(10, 2, max_targets=0)
        with pytest.raises(
            ValueError,
            match="must be greater than or equal to zero",
        ):
            Raman.Local(10, 2, min_retarget_interval=-1)

    def test_duration_ordering(self):
        with pytest.raises(
            ValueError,
            match="must be greater than or equal to 'min_duration'",
        ):
            Rydberg.Global(10, 2, min_duration=100, max_duration=10)

    def test_virtual_none_fields(self):
        ch = Rydberg.Global(None, None, max_duration=None)
        assert ch.is_virtual()
        concrete = Rydberg.Global(10, 5)
        assert not concrete.is_virtual()

    def test_mod_bandwidth_cap(self):
        with pytest.raises(
            NotImplementedError, match="must be lower than"
        ):
            Rydberg.Global(10, 5, mod_bandwidth=1e6)


def test_eigenstates_registry():
    assert EIGENSTATES == {
        "ground-rydberg": ["r", "g"],
        "digital": ["g", "h"],
        "XY": ["u", "d"],
    }
    # Energy-ranked global ordering
    assert STATES_RANK == ("u", "d", "r", "g", "h", "x")
    assert Rydberg.Global(1, 1).eigenstates == ["r", "g"]
    assert Raman.Local(1, 1).eigenstates == ["g", "h"]
    assert Microwave.Global(1, 1).eigenstates == ["u", "d"]


def test_validate_duration_rounding():
    ch = Rydberg.Global(10, 5, clock_period=4, min_duration=16)
    with pytest.raises(ValueError, match="at least 16 ns"):
        ch.validate_duration(12)
    with pytest.warns(
        UserWarning, match="not a multiple of the channel's clock"
    ):
        assert ch.validate_duration(18) == 20
    assert ch.validate_duration(16) == 16
    with pytest.raises(TypeError, match="castable to an int"):
        ch.validate_duration("twenty")


def test_rise_time_from_mod_bandwidth():
    ch = Rydberg.Global(10, 5, mod_bandwidth=4)
    # Amplitude rise time = sqrt(2) * intensity rise time
    # = sqrt(2) * 0.48/bw µs (reference channels/modulation.py:98)
    assert ch.rise_time == int(round(np.sqrt(2) * 0.48 / 4 * 1e3))
    assert ch.phase_jump_time == 2 * ch.rise_time
    assert Rydberg.Global(10, 5).rise_time == 0


def test_modulate_errors_without_bandwidth():
    ch = Rydberg.Global(10, 5)
    with pytest.warns(
        UserWarning, match="No modulation bandwidth defined"
    ):
        out = ch.modulate(np.ones(100))
    np.testing.assert_array_equal(np.asarray(out, dtype=float), np.ones(100))


def test_modulation_preserves_area():
    ch = Rydberg.Global(10, 5, mod_bandwidth=5)
    samples = np.asarray(
        BlackmanWaveform(500, np.pi).samples, dtype=float
    )
    out = np.asarray(ch.modulate(samples), dtype=float)
    assert len(out) == 500 + 2 * ch.rise_time
    assert np.isclose(np.sum(out), np.sum(samples), rtol=1e-3)
    assert out.max() <= samples.max() + 1e-9


class TestRydbergEOM:
    @pytest.fixture
    def params(self):
        return dict(
            mod_bandwidth=1,
            limiting_beam=RydbergBeam.RED,
            max_limiting_amp=60,
            intermediate_detuning=700,
            controlled_beams=tuple(RydbergBeam),
        )

    @pytest.mark.parametrize(
        "bad_param, bad_value",
        [
            ("mod_bandwidth", 0),
            ("mod_bandwidth", -3),
            ("max_limiting_amp", 0),
            ("intermediate_detuning", -500),
            ("intermediate_detuning", 0),
            ("custom_buffer_time", 0),
            ("blue_shift_coeff", 0),
            ("red_shift_coeff", -1.1),
        ],
    )
    def test_bad_values(self, params, bad_param, bad_value):
        params[bad_param] = bad_value
        with pytest.raises((ValueError, TypeError)):
            RydbergEOM(**params)

    def test_controlled_beams_validation(self, params):
        params["controlled_beams"] = tuple()
        with pytest.raises(
            ValueError, match="at least one beam"
        ):
            RydbergEOM(**params)
        params["controlled_beams"] = list(RydbergBeam)
        assert RydbergEOM(**params).controlled_beams == tuple(
            RydbergBeam
        )

    @pytest.mark.parametrize(
        "limiting_beam", [RydbergBeam.RED, RydbergBeam.BLUE]
    )
    @pytest.mark.parametrize("multiple_beam_control", [True, False])
    @pytest.mark.parametrize("limit_amp_fraction", [0.5, 2.0])
    def test_detuning_off_options_physics(
        self, params, limiting_beam, multiple_beam_control,
        limit_amp_fraction,
    ):
        params["limiting_beam"] = limiting_beam
        params["multiple_beam_control"] = multiple_beam_control
        eom = RydbergEOM(**params)
        limit_amp = params["max_limiting_amp"] ** 2 / (
            2 * params["intermediate_detuning"]
        )
        amp = limit_amp_fraction * limit_amp

        # Manually compute the lightshift offset above the limit amp
        if amp <= limit_amp:
            zero_det = 0.0
        else:
            lim = params["max_limiting_amp"]
            non_lim = 2 * params["intermediate_detuning"] * amp / lim
            red = lim if limiting_beam == RydbergBeam.RED else non_lim
            blue = lim if limiting_beam == RydbergBeam.BLUE else non_lim
            zero_det = -(blue**2 - red**2) / (
                4 * params["intermediate_detuning"]
            )

        assert np.isclose(
            float(eom._lightshift(tpu.math.AbstractArray(amp), *RydbergBeam)),
            -zero_det,
        )
        assert float(eom._lightshift(tpu.math.AbstractArray(amp))) == 0.0

        options = eom.detuning_off_options(amp, 0.0)
        opts = np.sort(np.asarray(options.as_array(detach=True)))
        # One option per controllable switching combo: each single
        # beam, plus both-off when multiple_beam_control
        assert len(opts) == 2 + multiple_beam_control
        assert opts[0] < zero_det  # only RED on shifts down
        if multiple_beam_control:
            assert np.isclose(opts[1], zero_det)  # both beams off
        assert opts[-1] > zero_det  # only BLUE on shifts up

    def test_calculate_detuning_off_picks_closest(self, params):
        eom = RydbergEOM(**params)
        options = np.asarray(
            eom.detuning_off_options(10.0, 0.0).as_array(detach=True)
        )
        for target in (options[0] - 1, np.mean(options), 1e6):
            chosen = eom.calculate_detuning_off(10.0, 0.0, target)
            best = options[np.argmin(np.abs(options - target))]
            assert np.isclose(float(chosen), best)


def test_analog_device_eom_channel():
    ch = AnalogDevice.channels["rydberg_global"]
    assert ch.supports_eom()
    eom = ch.eom_config
    assert eom is not None
    assert eom.mod_bandwidth > ch.mod_bandwidth


class TestDMM:
    @pytest.fixture
    def physical_dmm(self):
        return DMM(
            clock_period=4,
            min_duration=16,
            max_duration=2**26,
            mod_bandwidth=8,
            bottom_detuning=-2 * np.pi * 20,
            total_bottom_detuning=-2 * np.pi * 2000,
        )

    def test_basic_properties(self, physical_dmm):
        assert physical_dmm.basis == "ground-rydberg"
        assert physical_dmm.addressing == "Global"
        assert physical_dmm.max_amp == 0
        with pytest.raises(
            ValueError, match="'bottom_detuning' must be negative"
        ):
            DMM(bottom_detuning=1.0)
        with pytest.raises(
            ValueError,
            match="must be lower than 'bottom_detuning'",
        ):
            DMM(
                bottom_detuning=-2 * np.pi * 1000,
                total_bottom_detuning=-2 * np.pi * 20,
            )

    def test_validate_pulse_rejects_amplitude(self, physical_dmm):
        pulse = Pulse.ConstantPulse(100, 1.0, -1.0, 0.0)
        with pytest.raises(
            ValueError, match="amplitude goes over the maximum"
        ):
            physical_dmm.validate_pulse(pulse)

    def test_validate_pulse_rejects_positive_detuning(
        self, physical_dmm
    ):
        pulse = Pulse.ConstantPulse(100, 0.0, 1.0, 0.0)
        with pytest.raises(
            ValueError,
            match="detuning in a DMM must not be positive",
        ):
            physical_dmm.validate_pulse(pulse)

    def test_validate_pulse_bottom_detuning(self, physical_dmm):
        too_deep = Pulse.ConstantPulse(
            100, 0.0, physical_dmm.bottom_detuning * 1.01, 0.0
        )
        reg = tpu.Register.square(1, spacing=5, prefix="q")
        det_map = reg.define_detuning_map({"q0": 1.0})
        with pytest.raises(
            ValueError, match="maximum weight of 1.0"
        ):
            physical_dmm.validate_pulse(too_deep, det_map)
        # With a fractional weight the per-qubit detuning is scaled
        # back inside the limit
        half_map = tpu.Register.square(
            2, spacing=5, prefix="q"
        ).define_detuning_map({"q0": 0.5, "q1": 0.5})
        ok = Pulse.ConstantPulse(
            100, 0.0, physical_dmm.bottom_detuning * 1.5, 0.0
        )
        physical_dmm.validate_pulse(ok, half_map)

    def test_validate_pulse_total_bottom_detuning(self):
        dmm = DMM(
            bottom_detuning=-2 * np.pi * 50,
            total_bottom_detuning=-2 * np.pi * 80,
        )
        reg = tpu.Register.square(2, spacing=5, prefix="q")
        det_map = reg.define_detuning_map(
            {f"q{i}": 1.0 for i in range(4)}
        )
        pulse = Pulse.ConstantPulse(100, 0.0, -2 * np.pi * 30, 0.0)
        with pytest.raises(
            ValueError, match="total summed weight"
        ):
            dmm.validate_pulse(pulse, det_map)


class TestWeightMaps:
    def test_exact_qubit_matching(self):
        reg = tpu.Register.square(2, spacing=5, prefix="q")
        dmap = reg.define_detuning_map(
            {"q0": 1.0, "q1": 0.25, "q2": 0.0, "q3": 0.0}
        )
        wm = dmap.get_qubit_weight_map(reg.qubits)
        assert wm["q0"] == pytest.approx(1.0)
        assert wm["q1"] == pytest.approx(0.25)
        assert wm["q3"] == pytest.approx(0.0)

    def test_gaussian_crosstalk_kernel(self):
        """Off-spot qubits pick up weight exp(-d^2 / (2 w^2))."""
        reg = tpu.Register({"a": (0.0, 0.0)})
        dmap = reg.define_detuning_map({"a": 1.0})
        waist = 2.0
        d = 1.5
        probe = {"probe": (d, 0.0)}
        wm = dmap.get_qubit_weight_map(probe, spot_waist=waist)
        assert wm["probe"] == pytest.approx(
            np.exp(-(d**2) / (2 * waist**2)), rel=1e-6
        )

    def test_trap_weights_sum_check(self):
        reg = tpu.Register.square(2, spacing=5, prefix="q")
        with pytest.raises(
            ValueError, match="weights must be between 0 and 1"
        ):
            reg.define_detuning_map({"q0": -0.5})


def test_device_channel_catalog():
    assert set(MockDevice.channels) >= {
        "rydberg_global",
        "rydberg_local",
        "raman_global",
        "raman_local",
        "mw_global",
    }
    for name, ch in MockDevice.channels.items():
        basis = {
            "rydberg": "ground-rydberg",
            "raman": "digital",
            "mw": "XY",
        }[name.split("_")[0]]
        assert ch.basis == basis
