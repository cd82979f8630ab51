"""DetuningMap/WeightMap semantics and the DMM validation matrix.

Mirrors the reference's tests/test_dmm.py: weight-map definition from
layouts/registers/mappable registers, Gaussian spot-waist weighting,
static hashing, position offsets, and DMM pulse validation bounds.
"""

from __future__ import annotations

import numpy as np
import pytest

import pulser_tpu as tpu
from pulser_tpu.channels.dmm import DMM
from pulser_tpu.register.register_layout import RegisterLayout
from pulser_tpu.register.special_layouts import (
    TriangularLatticeLayout,
)
from pulser_tpu.register.weight_maps import DetuningMap, WeightMap


@pytest.fixture
def layout():
    return RegisterLayout([[0, 0], [1, 0], [0, 1], [1, 1]])


@pytest.fixture
def register(layout):
    return layout.define_register(
        0, 1, 2, 3, qubit_ids=("0", "1", "2", "3")
    )


@pytest.fixture
def map_reg(layout):
    return layout.make_mappable_register(4)


@pytest.fixture
def det_dict():
    return {0: 1.0, 1: 0.3, 2: 0}


@pytest.fixture
def det_map(layout, det_dict):
    return layout.define_detuning_map(det_dict)


class TestDetuningMap:
    @pytest.mark.parametrize("bad_key", [{4: 1.0}, {"4": 1.0}])
    def test_define_detuning_map_bad_keys(
        self, layout, register, map_reg, bad_key
    ):
        for reg in (layout, map_reg):
            with pytest.raises(
                ValueError, match=r"integers in \[0, 3\]"
            ):
                reg.define_detuning_map(bad_key)
        with pytest.raises(
            ValueError, match="defined in the register"
        ):
            register.define_detuning_map(bad_key)

    def test_qubit_weight_map(self, register):
        qid_weight_map = {"1": 1.0, "0": 0.1, "3": 0.4}
        sorted_qids = sorted(qid_weight_map)
        det_map = register.define_detuning_map(qid_weight_map)
        qubits = register.qubits
        coords = [
            np.asarray(qubits[qid], dtype=float)
            for qid in sorted_qids
        ]
        weights = [qid_weight_map[qid] for qid in sorted_qids]

        np.testing.assert_equal(
            np.asarray(det_map.sorted_coords, dtype=float), coords
        )
        np.testing.assert_equal(
            np.asarray(det_map.sorted_weights, dtype=float), weights
        )

        # Without spot waist: exact recovery, undefined qubits at 0
        assert det_map.get_qubit_weight_map(qubits) == {
            **qid_weight_map,
            "2": 0.0,
        }

        # With spot waist: Gaussian trap profile
        spot_waist = 1.2
        expected = {}
        for qid, q_coord in qubits.items():
            eff_weight = 0.0
            for trap_coord, trap_weight in zip(coords, weights):
                dist = np.linalg.norm(
                    np.asarray(q_coord, dtype=float) - trap_coord
                )
                expected_w = (
                    np.exp(-(dist**2) / (2 * spot_waist**2))
                    * trap_weight
                )
                eff_weight += expected_w
            expected[qid] = eff_weight
        assert det_map.get_qubit_weight_map(
            qubits, spot_waist
        ) == pytest.approx(expected)

    def test_static_hash_and_repr(self, det_map, det_dict, layout):
        disordered = {
            i: det_dict[i] for i in sorted(det_dict, reverse=True)
        }
        assert disordered == det_dict
        assert list(disordered) != list(det_dict)
        det_map2 = layout.define_detuning_map(disordered)

        # Differ in raw ordering but equal in sorted content
        assert np.any(
            np.asarray(det_map.trap_coordinates, dtype=float)
            != np.asarray(det_map2.trap_coordinates, dtype=float)
        )
        np.testing.assert_equal(
            np.asarray(det_map.sorted_coords, dtype=float),
            np.asarray(det_map2.sorted_coords, dtype=float),
        )
        assert det_map == det_map2
        static_hash = det_map.static_hash()
        assert static_hash == det_map2.static_hash()
        assert (
            repr(det_map)
            == repr(det_map2)
            == f"DetuningMap_{static_hash}"
        )

        # A WeightMap with the same content is NOT equal: type counts
        w_map = WeightMap(
            det_map.trap_coordinates, det_map.weights
        )
        np.testing.assert_equal(
            np.asarray(det_map.sorted_coords, dtype=float),
            np.asarray(w_map.sorted_coords, dtype=float),
        )
        assert static_hash != w_map.static_hash()
        assert repr(w_map) == f"WeightMap_{w_map.static_hash()}"
        assert w_map != det_map

    def test_bad_init(self, layout, register, map_reg):
        with pytest.raises(
            ValueError, match="traps and weights don't match"
        ):
            DetuningMap([(0, 0), (1, 0)], [0])

        for reg in (layout, map_reg, register):
            is_register = reg is register
            bad_weights = (
                {"0": -1.0, "1": 1.0, "2": 1.0}
                if is_register
                else {0: -1.0, 1: 1.0, 2: 1.0}
            )
            zero_weights = (
                {"0": 0.0} if is_register else {0: 0.0}
            )
            with pytest.raises(
                ValueError, match="between 0 and 1"
            ):
                reg.define_detuning_map(bad_weights)
            with pytest.warns(
                UserWarning, match="non-zero weight"
            ):
                reg.define_detuning_map(zero_weights)

    def test_weights_follow_trap_order(
        self, layout, register, map_reg, det_dict
    ):
        for reg in (layout, map_reg, register):
            weights_dict = (
                {str(k): v for k, v in det_dict.items()}
                if reg is register
                else det_dict
            )
            detuning_map = reg.define_detuning_map(weights_dict)
            got_weights = np.asarray(
                detuning_map.weights, dtype=float
            )
            got_coords = np.asarray(
                detuning_map.trap_coordinates, dtype=float
            )
            for i in range(len(det_dict)):
                assert det_dict[i] == got_weights[i]
                np.testing.assert_array_equal(
                    np.asarray(layout.coords, dtype=float)[i],
                    got_coords[i],
                )

    @pytest.mark.parametrize(
        "offset", [(0, 1.23), (-2.34, 0), (1.2, -3.4)]
    )
    def test_pos_offset(self, det_map, offset):
        og_coords = np.asarray(
            det_map.trap_coordinates, dtype=float
        )
        new_det_map = det_map.with_pos_offset(*offset)
        np.testing.assert_equal(
            np.asarray(det_map.trap_coordinates, dtype=float),
            og_coords,
        )
        assert det_map != new_det_map
        np.testing.assert_allclose(
            np.asarray(new_det_map.trap_coordinates, dtype=float),
            og_coords + np.array(offset),
        )


class TestDMM:
    @pytest.fixture
    def physical_dmm(self):
        return DMM(
            bottom_detuning=-1,
            total_bottom_detuning=-10,
            min_avg_abs_detuning=0.1,
            clock_period=1,
            min_duration=1,
            max_duration=1e6,
            mod_bandwidth=20,
        )

    def test_init(self, physical_dmm):
        assert DMM().is_virtual()
        dmm = physical_dmm
        assert not dmm.is_virtual()
        assert dmm.basis == "ground-rydberg"
        assert dmm.addressing == "Global"
        assert dmm.bottom_detuning == -1
        assert dmm.total_bottom_detuning == -10
        assert dmm.max_amp == 0
        for value in (
            dmm.max_abs_detuning,
            dmm.min_retarget_interval,
            dmm.fixed_retarget_t,
            dmm.max_targets,
        ):
            assert value is None

    @pytest.mark.parametrize(
        "kwargs, msg",
        [
            ({"bottom_detuning": 1}, "'bottom_detuning' must be"),
            (
                {"total_bottom_detuning": 10},
                "'total_bottom_detuning' must be",
            ),
            (
                {"total_bottom_detuning": -1, "bottom_detuning": -10},
                "must be lower than",
            ),
            (
                {"min_avg_abs_detuning": -0.5},
                "must be non-negative",
            ),
            (
                {
                    "min_avg_abs_detuning": 10.1,
                    "bottom_detuning": -10,
                },
                "must be lower than or equal",
            ),
        ],
    )
    def test_init_value_errors(self, kwargs, msg):
        with pytest.raises(ValueError, match=msg):
            DMM(**kwargs)

    def test_no_global_local_constructors(self):
        with pytest.raises(
            NotImplementedError, match="`Global` method"
        ):
            DMM.Global(None, None, bottom_detuning=1)
        with pytest.raises(
            NotImplementedError, match="`Local` method"
        ):
            DMM.Local(None, None, bottom_detuning=1)

    def test_validate_pulse_matrix(self, physical_dmm):
        virtual_local_dmm = DMM(bottom_detuning=-1)
        virtual_dmm = DMM(total_bottom_detuning=-10)
        assert virtual_local_dmm.is_virtual()
        assert virtual_dmm.is_virtual()

        # Positive detuning is always invalid
        pos_det_pulse = tpu.Pulse.ConstantPulse(100, 0, 1e-3, 0)
        with pytest.raises(
            ValueError, match="must not be positive"
        ):
            physical_dmm.validate_pulse(pos_det_pulse)

        # Local bottom-detuning bound (max weight 1)
        det_value = physical_dmm.bottom_detuning - 0.01
        too_low_pulse = tpu.Pulse.ConstantPulse(
            100, 0, det_value, 0
        )
        with pytest.raises(
            ValueError, match="local bottom detuning"
        ):
            physical_dmm.validate_pulse(too_low_pulse)
        # No local bound on the virtual DMM
        virtual_dmm.validate_pulse(too_low_pulse)

        # Total bottom-detuning bound, weights < 1
        det_map = TriangularLatticeLayout(
            100, 10
        ).define_detuning_map(
            {i: 0.5 if i < 20 else 0.0 for i in range(100)}
        )
        with pytest.raises(
            ValueError, match="total bottom detuning"
        ):
            physical_dmm.validate_pulse(too_low_pulse, det_map)
        virtual_local_dmm.validate_pulse(too_low_pulse, det_map)

        # Minimum average absolute detuning bound
        min_weight = 0.05
        det_map = TriangularLatticeLayout(
            100, 10
        ).define_detuning_map({1: min_weight})
        assert (
            min_weight * abs(det_value)
            < physical_dmm.min_avg_abs_detuning
        )
        with pytest.raises(
            ValueError, match="average absolute detuning"
        ):
            physical_dmm.validate_pulse(too_low_pulse, det_map)

        # All-zero weights validate trivially
        with pytest.warns(
            UserWarning, match="non-zero weight"
        ):
            det_map = TriangularLatticeLayout(
                100, 10
            ).define_detuning_map({0: 0.0})
        physical_dmm.validate_pulse(too_low_pulse, det_map)
