"""Modulation-bandwidth utility tests.

Mirrors the reference's ``tests/test_modulation.py`` (129 LoC):
rise-time/bandwidth conversions, validation bounds, and the
deprecated ``MODBW_TO_TR`` re-exports (reference
``pulser-core/pulser/channels/modulation.py``).
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from pulser_tpu.channels.modulation import (
    calculate_amplitude_rise_time,
    calculate_mod_bandwidth_from_amplitude_rise_time,
    calculate_mod_bandwidth_from_intensity_rise_time,
    validate_mod_bandwidth,
)


class TestModulationConversions:
    def test_intensity_rise_time_roundtrip(self):
        # MODBW_TO_TR = 0.48: mod_bw=1 MHz <-> 480 ns intensity rise
        mod_bw = calculate_mod_bandwidth_from_intensity_rise_time(480)
        assert np.isclose(mod_bw, 1.0, rtol=1e-3)

    def test_amplitude_rise_time_calculation(self):
        # Amplitude rise time = intensity rise time * sqrt(2)
        rise_time = calculate_amplitude_rise_time(1.0)
        expected = int(round(480 * np.sqrt(2)))
        assert rise_time == expected

    def test_amplitude_to_mod_bandwidth_roundtrip(self):
        original_rise_time = 100  # ns
        mod_bw = calculate_mod_bandwidth_from_amplitude_rise_time(
            original_rise_time
        )
        recovered_rise_time = calculate_amplitude_rise_time(mod_bw)
        assert abs(recovered_rise_time - original_rise_time) <= 1

    def test_intensity_vs_amplitude_rise_time_relationship(self):
        mod_bw = 5.0  # MHz
        amp_rise_time = calculate_amplitude_rise_time(mod_bw)
        int_rise_time = 0.48 / mod_bw * 1e3
        expected_amp_rise_time = int(
            round(int_rise_time * np.sqrt(2))
        )
        assert amp_rise_time == expected_amp_rise_time


class TestValidateModBandwidth:
    def test_valid_mod_bandwidth(self):
        validate_mod_bandwidth(1.0)
        validate_mod_bandwidth(100.0)
        validate_mod_bandwidth(0.001)

    @pytest.mark.parametrize("bad_bw", [0.0, -5.0])
    def test_nonpositive_mod_bandwidth_raises(self, bad_bw):
        with pytest.raises(
            ValueError,
            match="'mod_bandwidth' must be greater than zero",
        ):
            validate_mod_bandwidth(bad_bw)

    def test_excessive_mod_bandwidth_raises(self):
        max_bw = calculate_mod_bandwidth_from_amplitude_rise_time(1)
        with pytest.raises(
            NotImplementedError,
            match=f"'mod_bandwidth' must be lower than {max_bw:.0f}"
            " MHz",
        ):
            validate_mod_bandwidth(max_bw + 1)


class TestDeprecatedReExports:
    def test_modbw_to_tr_deprecation_from_eom(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            from pulser_tpu.channels.eom import MODBW_TO_TR

            assert len(w) == 1
            assert issubclass(w[0].category, DeprecationWarning)
            assert "MODBW_TO_TR" in str(w[0].message)
            assert "pulser_tpu.channels.eom" in str(w[0].message)
            assert MODBW_TO_TR == 0.48

    def test_modbw_to_tr_deprecation_from_base_channel(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            from pulser_tpu.channels.base_channel import MODBW_TO_TR

            assert len(w) == 1
            assert issubclass(w[0].category, DeprecationWarning)
            assert "MODBW_TO_TR" in str(w[0].message)
            assert "pulser_tpu.channels.base_channel" in str(
                w[0].message
            )
            assert MODBW_TO_TR == 0.48

    def test_unknown_attribute_raises(self):
        import pulser_tpu.channels.eom as eom_mod

        with pytest.raises(AttributeError, match="no attribute"):
            eom_mod.not_a_real_name
