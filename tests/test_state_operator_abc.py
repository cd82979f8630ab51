"""State/Operator ABC validation tests.

Coverage modeled on the reference's ``tests/test_operator.py`` and
``tests/test_state.py`` (wire-format validation of the FullOp
structure and basis-amplitude maps; reference
``pulser-core/pulser/backend/operator.py`` / ``backend/state.py``),
plus TpuOperator algebra.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from pulser_tpu.backend.operator import Operator
from pulser_tpu.backend.state import State
from pulser_tpu.emulator import TpuOperator, TpuState


class TestOperatorValidation:
    def test_nonexistent_qubits(self):
        with pytest.raises(
            ValueError,
            match="Got invalid indices for a system with 2 qudits",
        ):
            Operator._validate_operations(
                eigenstates=("r", "g"),
                n_qudits=2,
                operations=[
                    (1.0, [({"gg": 1.0, "rr": -1.0}, {3, 5, 9})])
                ],
            )

    def test_reoccurring_qubit(self):
        with pytest.raises(
            ValueError,
            match=re.escape(
                "Got invalid indices for a system with 5 qudits:"
                " {3}. For TensorOp #0, only indices {0, 1, 4} were"
                " still available."
            ),
        ):
            Operator._validate_operations(
                eigenstates=("r", "g"),
                n_qudits=5,
                operations=[
                    (
                        1.0,
                        [
                            ({"gg": 1.0, "rr": -1.0}, {2, 3}),
                            ({"gg": 1.0, "rr": -1.0}, {3}),
                        ],
                    )
                ],
            )

    def test_valid_operations(self):
        Operator._validate_operations(
            eigenstates=("r", "g"),
            n_qudits=5,
            operations=[
                (
                    1.0,
                    [
                        ({"gg": 1.0, "rr": -1.0}, {3}),
                        ({"gg": 1.0, "rr": -1.0}, {1, 2}),
                    ],
                )
            ],
        )

    @pytest.mark.parametrize(
        "eigenstates, bad_key",
        [(("r", "g"), "gggg"), (("r", "g", "x"), "gggg")],
    )
    def test_wrong_eigenstate_count(self, eigenstates, bad_key):
        with pytest.raises(
            ValueError,
            match="Every QuditOp key must be made up of two"
            " eigenstates",
        ):
            Operator._validate_operations(
                eigenstates=eigenstates,
                n_qudits=2,
                operations=[
                    (1.0, [({bad_key: 1.0, "rr": -1.0}, {0})])
                ],
            )

    def test_nonexistent_eigenstates(self):
        with pytest.raises(
            ValueError,
            match="Every QuditOp key must be made up of two"
            " eigenstates",
        ):
            Operator._validate_operations(
                eigenstates=("r", "g"),
                n_qudits=2,
                operations=[(1.0, [({"hh": 1.0}, {0})])],
            )


class TestStateValidation:
    @pytest.mark.parametrize(
        "amplitudes",
        [
            {"rrh": 1.0},
            {"rr": 0.5, "rgg": math.sqrt(0.75)},
        ],
    )
    def test_bad_amplitudes(self, amplitudes):
        with pytest.raises(
            ValueError,
            match="All basis states must be combinations of"
            " eigenstates with the same length",
        ):
            State._validate_amplitudes(
                eigenstates=("r", "g"), amplitudes=amplitudes
            )

    def test_valid_amplitudes(self):
        n_qudits = State._validate_amplitudes(
            eigenstates=("r", "g", "x"),
            amplitudes={"rrgg": 0.5, "rggr": math.sqrt(0.75)},
        )
        assert n_qudits == 4

    def test_validate_eigenstates(self):
        with pytest.raises(
            ValueError,
            match="eigenstates must be represented by single"
            " characters",
        ):
            State._validate_eigenstates(
                eigenstates=["ground", "rydberg"]
            )
        with pytest.raises(
            ValueError, match="can't contain repeated entries"
        ):
            State._validate_eigenstates(eigenstates=["r", "g", "r"])
        State._validate_eigenstates(eigenstates=("r", "g"))

    def test_infer_one_state(self):
        s = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"gg": 1.0}
        )
        assert s.infer_one_state() == "r"
        # XY basis measures the 'd' state as 1
        s2 = TpuState.from_state_amplitudes(
            eigenstates=("u", "d"), amplitudes={"dd": 1.0}
        )
        assert s2.infer_one_state() == "d"


class TestTpuOperatorAlgebra:
    def _n0(self):
        return TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=2,
            operations=[(1.0, [({"rr": 1.0}, [0])])],
        )

    def _n1(self):
        return TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=2,
            operations=[(1.0, [({"rr": 1.0}, [1])])],
        )

    def test_add_and_scale(self):
        tot = self._n0() + self._n1()
        ghz = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"),
            amplitudes={"gg": 1 / np.sqrt(2), "rr": 1 / np.sqrt(2)},
        )
        assert np.isclose(float(np.real(tot.expect(ghz))), 1.0)
        doubled = 2 * self._n0()
        assert np.isclose(
            float(np.real(doubled.expect(ghz))), 1.0
        )

    def test_matmul(self):
        prod = self._n0() @ self._n1()  # n0 n1 = |rr><rr|
        rr = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"rr": 1.0}
        )
        gg = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"gg": 1.0}
        )
        assert np.isclose(float(np.real(prod.expect(rr))), 1.0)
        assert np.isclose(float(np.real(prod.expect(gg))), 0.0)

    def test_apply_to(self):
        flip = TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=1,
            operations=[(1.0, [({"rg": 1.0, "gr": 1.0}, [0])])],
        )
        g = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"g": 1.0}
        )
        r = flip.apply_to(g)
        probs = r.bitstring_probabilities()
        assert np.isclose(probs.get("1", 0.0), 1.0)

    def test_multi_qudit_tensor_op(self):
        """One TensorOp applies its QuditOp to several qudits."""
        tot = TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=3,
            operations=[(2.0, [({"rr": 1.0}, [0, 1, 2])])],
        )
        rrr = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"rrr": 1.0}
        )
        # The QuditOp acts on every listed qudit (tensor product)
        assert np.isclose(float(np.real(tot.expect(rrr))), 2.0)

    def test_repr_roundtrip_through_abstract(self):
        import json

        from pulser_tpu.json.abstract_repr.backend import (
            _deserialize_operator,
        )
        from pulser_tpu.json.abstract_repr.serializer import (
            AbstractReprEncoder,
        )

        # Only operators built via from_operator_repr serialize
        # (composition drops the recorded repr, like the reference)
        with pytest.raises(Exception, match="not created via"):
            (self._n0() + self._n1())._to_abstract_repr()
        op = TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=2,
            operations=[
                (1.0, [({"rr": 1.0}, [0])]),
                (0.5, [({"rr": 1.0}, [1])]),
            ],
        )
        s = json.dumps(
            op._to_abstract_repr(), cls=AbstractReprEncoder
        )
        back = _deserialize_operator(json.loads(s), TpuOperator)
        ghz = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"),
            amplitudes={"gg": 1 / np.sqrt(2), "rr": 1 / np.sqrt(2)},
        )
        assert np.isclose(
            complex(back.expect(ghz)).real,
            complex(op.expect(ghz)).real,
        )
