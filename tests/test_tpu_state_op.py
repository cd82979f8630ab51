"""TpuState/TpuOperator behavioral suite.

Mirrors the reference's
``tests/pulser_simulation/test_qutip_state_op.py`` (605 LoC) with the
dense :class:`~pulser_tpu.emulator.qobj.Qobj` standing in for
``qutip.Qobj``: construction/validation, one-state inference, basis
indexing, overlaps, probabilities, sampling, operator algebra over the
Pauli group, ``from_operator_repr`` edge cases, and abstract-repr wire
format (reference ``pulser-simulation/pulser_simulation/qutip_state.py``
and ``qutip_op.py``).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pytest

from pulser_tpu.emulator import TpuOperator, TpuState
from pulser_tpu.emulator.qobj import Qobj, basis, qeye, tensor
from pulser_tpu.exceptions.serialization import AbstractReprError
from pulser_tpu.json.abstract_repr.serializer import AbstractReprEncoder


@pytest.fixture
def ket_r():
    return TpuState(basis(2, 0), eigenstates=("r", "g"))


@pytest.fixture
def dm_g():
    return TpuState(basis(2, 1).proj(), eigenstates=("r", "g"))


@pytest.fixture
def ket_plus():
    return TpuState.from_state_amplitudes(
        eigenstates=("r", "g"),
        amplitudes={"r": 1 / np.sqrt(2), "g": 1 / np.sqrt(2)},
    )


class TestTpuState:
    def test_init_validation(self):
        with pytest.raises(
            ValueError,
            match="eigenstates must be represented by single characters",
        ):
            TpuState(basis(2, 0), eigenstates=["ground", "rydberg"])
        with pytest.raises(
            ValueError, match="can't contain repeated entries"
        ):
            TpuState(basis(2, 0), eigenstates=["r", "g", "r"])
        with pytest.raises(
            TypeError, match="must be a 'collections.Sequence'"
        ):
            TpuState(basis(2, 0), eigenstates={"r", "g"})
        with pytest.raises(TypeError, match="must be a Qobj"):
            TpuState(np.arange(16), eigenstates=["r", "g"])
        with pytest.raises(
            ValueError,
            match="incompatible with a system of 3-level qudits",
        ):
            TpuState(basis(2, 0), eigenstates=["r", "g", "h"])

    def test_init_bra_becomes_ket(self):
        state = TpuState(
            basis(3, 0).dag(), eigenstates=["r", "g", "h"]
        )
        assert state.n_qudits == 1
        assert state.qudit_dim == 3
        assert state.eigenstates == ("r", "g", "h")
        assert state.to_qobj() == basis(3, 0)
        with pytest.raises(
            RuntimeError, match="Failed to infer the 'one state'"
        ):
            state.infer_one_state()

    def test_init_multi_qudit(self):
        three_qubit = tensor([basis(2, 1)] * 3)
        state = TpuState(three_qubit, eigenstates=("r", "g"))
        assert state.n_qudits == 3
        assert state.qudit_dim == 2
        assert state.eigenstates == ("r", "g")
        assert state.to_qobj() == three_qubit
        assert state.infer_one_state() == "r"

        two_qutrit_dm = tensor([basis(3, 0)] * 2).proj()
        state = TpuState(two_qutrit_dm, eigenstates=["r", "g", "h"])
        assert state.n_qudits == 2
        assert state.qudit_dim == 3
        assert state.to_qobj() == two_qutrit_dm

    @pytest.mark.parametrize(
        "eigenstates",
        [("g", "r"), ("g", "r", "x"), ("g", "h"), ("u", "d"), ("0", "1")],
    )
    def test_infer_one_state(self, eigenstates):
        state = TpuState(
            basis(len(eigenstates), 0), eigenstates=eigenstates
        )
        assert state.infer_one_state() == eigenstates[1]

    def test_get_basis_state(self):
        n_qudits = 3
        state = TpuState.from_state_amplitudes(
            eigenstates=("r", "g", "h"),
            amplitudes={"g" * n_qudits: 1.0},
        )
        assert state.get_basis_state_from_index(0) == "rrr"
        assert state.get_basis_state_from_index(1) == "rrg"
        assert state.get_basis_state_from_index(2) == "rrh"
        assert state.get_basis_state_from_index(3) == "rgr"
        assert state.get_basis_state_from_index(4) == "rgg"
        assert state.get_basis_state_from_index(9) == "grr"
        assert (
            state.get_basis_state_from_index(3**n_qudits - 1) == "hhh"
        )
        with pytest.raises(
            ValueError, match="'index' must be a non-negative integer"
        ):
            state.get_basis_state_from_index(-1)

    def test_overlap(self, ket_r, dm_g, ket_plus):
        assert np.isclose(ket_r.overlap(ket_r), 1.0)
        assert dm_g.overlap(ket_r) == ket_r.overlap(dm_g) == 0.0
        assert ket_plus.overlap(ket_r) == ket_r.overlap(ket_plus)
        assert np.isclose(ket_plus.overlap(ket_r), 0.5)
        assert dm_g.overlap(ket_plus) == ket_plus.overlap(dm_g)
        assert np.isclose(dm_g.overlap(ket_plus), 0.5)

    def test_overlap_dm_dm(self, dm_g, ket_plus):
        dm_plus = TpuState(
            ket_plus.to_qobj().proj(),
            eigenstates=ket_plus.eigenstates,
        )
        assert np.isclose(dm_g.overlap(dm_plus), 0.5)

    def test_overlap_errors(self, ket_r, dm_g):
        with pytest.raises(
            TypeError, match="expects another 'TpuState'"
        ):
            dm_g.overlap(ket_r.to_qobj())
        with pytest.raises(
            ValueError,
            match=re.escape(
                "Can't calculate the overlap between a state with 1 "
                "2-dimensional qudits and another with 2 3-dimensional"
                " qudits"
            ),
        ):
            ket_r.overlap(
                TpuState.from_state_amplitudes(
                    eigenstates=("r", "g", "h"), amplitudes={"rr": 1.0}
                )
            )
        err_msg = (
            "Can't calculate the overlap between states with"
            " eigenstates ('r', 'g') and {}."
        )
        with pytest.raises(
            ValueError, match=re.escape(err_msg.format(("u", "d")))
        ):
            ket_r.overlap(
                TpuState(basis(2, 0), eigenstates=("u", "d"))
            )
        with pytest.raises(
            NotImplementedError,
            match=re.escape(err_msg.format(("g", "r"))),
        ):
            ket_r.overlap(
                TpuState(basis(2, 0), eigenstates=("g", "r"))
            )

    def test_probabilities(self, ket_plus):
        amps = {
            "rr": np.sqrt(0.5),
            "gg": 1j * np.sqrt(0.5 - 1e-12),
            "gr": 1e-6,
        }
        state = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes=amps
        )
        probs = {k: np.abs(a) ** 2 for k, a in amps.items()}
        state_probs = state.probabilities(cutoff=9e-13)
        assert set(state_probs) == set(probs)
        assert all(
            np.isclose(probs[k], state_probs[k]) for k in probs
        )
        # Default cutoff drops 'gr' and renormalizes the rest
        probs.pop("gr")
        total = sum(probs.values())
        probs = {k: v / total for k, v in probs.items()}
        state_probs = state.probabilities()
        assert set(state_probs) == set(probs)
        assert all(
            np.isclose(probs[k], state_probs[k]) for k in probs
        )
        assert state.infer_one_state() == "r"
        bit_probs = state.bitstring_probabilities()
        assert set(bit_probs) == {"11", "00"}
        assert np.isclose(bit_probs["11"], probs["rr"])
        assert np.isclose(bit_probs["00"], probs["gg"])
        flipped = state.bitstring_probabilities(one_state="g")
        assert np.isclose(flipped["11"], probs["gg"])
        assert np.isclose(flipped["00"], probs["rr"])

        dm_plus = TpuState(
            ket_plus.to_qobj().proj(),
            eigenstates=ket_plus.eigenstates,
        )
        dm_probs = dm_plus.probabilities()
        assert set(dm_probs) == {"r", "g"}
        assert np.isclose(dm_probs["r"], 0.5)
        assert np.isclose(dm_probs["g"], 0.5)
        dm_bits = dm_plus.bitstring_probabilities()
        assert np.isclose(dm_bits["0"], 0.5)
        assert np.isclose(dm_bits["1"], 0.5)

    def test_sample(self, ket_r, dm_g):
        shots = 2000
        assert ket_r.sample(num_shots=shots) == {"1": shots}
        assert ket_r.sample(num_shots=shots, one_state="g") == {
            "0": shots
        }
        assert ket_r.sample(num_shots=shots, p_false_pos=0.1) == {
            "1": shots
        }
        assert ket_r.sample(num_shots=shots, p_false_neg=0.1)["0"] > 0

        assert dm_g.sample(num_shots=shots) == {"0": shots}
        assert dm_g.sample(num_shots=shots, one_state="g") == {
            "1": shots
        }
        assert dm_g.sample(num_shots=shots, p_false_neg=0.1) == {
            "0": shots
        }
        assert dm_g.sample(num_shots=shots, p_false_pos=0.1)["1"] > 0

    @pytest.mark.parametrize(
        "amplitudes",
        [
            {"rrh": 1.0},
            {"rr": 0.5, "rgg": np.sqrt(0.75)},
        ],
    )
    def test_from_state_amplitudes_error(self, amplitudes):
        with pytest.raises(
            ValueError,
            match=re.escape(
                "All basis states must be combinations of eigenstates"
                " with the same length. Expected combinations of"
                " ('r', 'g'), each with"
                f" {len(list(amplitudes)[0])} elements."
            ),
        ):
            TpuState.from_state_amplitudes(
                eigenstates=("r", "g"), amplitudes=amplitudes
            )

    def test_from_state_amplitudes(self):
        assert TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"g": 1.0}
        ).to_qobj() == basis(2, 1)
        assert TpuState.from_state_amplitudes(
            eigenstates=("g", "r"), amplitudes={"g": 1.0}
        ).to_qobj() == basis(2, 0)
        assert TpuState.from_state_amplitudes(
            eigenstates=("r", "g", "h"), amplitudes={"g": 1.0}
        ).to_qobj() == basis(3, 1)

        r, g = basis(2, 0), basis(2, 1)
        built = TpuState.from_state_amplitudes(
            eigenstates=("r", "g"),
            amplitudes={"rr": -0.5j, "gr": 0.5, "rg": 0.5j, "gg": -0.5},
        ).to_qobj()
        expected = (
            -0.5j * tensor([r, r])
            + 0.5 * tensor([g, r])
            + 0.5j * tensor([r, g])
            - 0.5 * tensor([g, g])
        )
        assert built == expected

    def test_repr(self, ket_r):
        assert repr(ket_r) == (
            "TpuState\n"
            + "-" * len("TpuState")
            + f"\nEigenstates: {ket_r.eigenstates}\n"
            + repr(ket_r.to_qobj())
        )

    def test_eq(self, ket_r, dm_g):
        assert ket_r == TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"r": 1.0}
        )
        assert dm_g != TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"g": 1.0}
        )
        assert dm_g != basis(2, 1).proj()

    def test_abstract_repr(self, ket_r):
        kwargs = dict(eigenstates=("r", "g"), amplitudes={"g": 1.0})
        state = TpuState.from_state_amplitudes(**kwargs)
        assert json.dumps(
            state, cls=AbstractReprEncoder
        ) == json.dumps(kwargs)

        with pytest.raises(
            AbstractReprError,
            match=re.escape(
                "Failed to serialize state of type 'TpuState' because"
                " it was not created via"
                " 'TpuState.from_state_amplitudes()'"
            ),
        ):
            json.dumps(
                TpuState(
                    state.to_qobj(), eigenstates=state.eigenstates
                ),
                cls=AbstractReprEncoder,
            )

        # In-place mutation after creation is detected at serialization
        state._state = ket_r._state
        with pytest.raises(
            AbstractReprError,
            match="modified in place after its creation",
        ):
            json.dumps(state, cls=AbstractReprEncoder)


def _qobj_sigma(which: str) -> Qobj:
    mats = {
        "i": np.eye(2),
        "x": np.array([[0, 1], [1, 0]]),
        "y": np.array([[0, -1j], [1j, 0]]),
        "z": np.array([[1, 0], [0, -1]]),
    }
    return Qobj(np.asarray(mats[which], dtype=complex))


class TestTpuOperator:
    @pytest.fixture
    def pauli_i(self):
        return TpuOperator(_qobj_sigma("i"), eigenstates=("r", "g"))

    @pytest.fixture
    def pauli_x(self):
        return TpuOperator(_qobj_sigma("x"), eigenstates=("r", "g"))

    @pytest.fixture
    def pauli_y(self):
        return TpuOperator(_qobj_sigma("y"), eigenstates=("r", "g"))

    @pytest.fixture
    def pauli_z(self):
        return TpuOperator(_qobj_sigma("z"), eigenstates=("r", "g"))

    def test_init(self):
        with pytest.raises(
            ValueError,
            match="eigenstates must be represented by single characters",
        ):
            TpuOperator(
                _qobj_sigma("z"), eigenstates=["ground", "rydberg"]
            )
        with pytest.raises(
            ValueError, match="can't contain repeated entries"
        ):
            TpuOperator(_qobj_sigma("z"), eigenstates=["r", "g", "r"])
        with pytest.raises(
            TypeError, match="must be a Qobj with type 'oper'"
        ):
            TpuOperator(
                _qobj_sigma("z").full(), eigenstates=["r", "g"]
            )
        with pytest.raises(
            TypeError, match="must be a Qobj with type 'oper'"
        ):
            TpuOperator(basis(2, 0), eigenstates=["r", "g"])
        with pytest.raises(
            ValueError,
            match="incompatible with a system of 3-level qudits",
        ):
            TpuOperator(_qobj_sigma("z"), eigenstates=["r", "g", "h"])

        pauli_z = TpuOperator(_qobj_sigma("z"), eigenstates=("r", "g"))
        assert pauli_z.eigenstates == ("r", "g")
        assert (
            pauli_z.to_qobj()
            == basis(2, 0).proj() - basis(2, 1).proj()
        )

    @pytest.mark.parametrize("op_name", ["apply_to", "expect"])
    def test_errors_on_state(self, pauli_x, op_name):
        op = getattr(pauli_x, op_name)
        with pytest.raises(
            TypeError, match="expects a 'TpuState' instance"
        ):
            op(basis(2, 0))
        err_msg = (
            f"Can't apply TpuOperator.{op_name}() between a"
            " TpuOperator with eigenstates ('r', 'g') and a TpuState"
            " with {}."
        )
        with pytest.raises(
            ValueError, match=re.escape(err_msg.format(("g", "h")))
        ):
            op(TpuState(basis(2, 0), eigenstates=("g", "h")))
        with pytest.raises(
            NotImplementedError,
            match=re.escape(err_msg.format(("g", "r"))),
        ):
            op(TpuState(basis(2, 0), eigenstates=("g", "r")))

    @pytest.mark.parametrize("op_name", ["__add__", "__matmul__"])
    def test_errors_on_operator(self, pauli_x, op_name, ket_r):
        op = getattr(pauli_x, op_name)
        with pytest.raises(
            TypeError, match="expects a 'TpuOperator' instance"
        ):
            op(ket_r)
        err_msg = (
            f"Can't apply {op_name} between a TpuOperator with"
            " eigenstates ('r', 'g') and a TpuOperator with {}."
        )
        with pytest.raises(
            ValueError, match=re.escape(err_msg.format(("g", "h")))
        ):
            op(
                TpuOperator(
                    basis(2, 0).proj(), eigenstates=("g", "h")
                )
            )
        with pytest.raises(
            NotImplementedError,
            match=re.escape(err_msg.format(("g", "r"))),
        ):
            op(
                TpuOperator(
                    basis(2, 0).proj(), eigenstates=("g", "r")
                )
            )

    def test_apply_to(self, ket_r, dm_g, pauli_x):
        assert pauli_x.apply_to(ket_r) == TpuState.from_state_amplitudes(
            eigenstates=("r", "g"), amplitudes={"g": 1.0}
        )
        # Density matrices conjugate: X |g><g| X = |r><r|
        assert pauli_x.apply_to(dm_g) == TpuState(
            basis(2, 0).proj(), eigenstates=dm_g.eigenstates
        )

    def test_expect(
        self, pauli_x, pauli_y, pauli_z, ket_r, dm_g, ket_plus
    ):
        assert pauli_x.expect(ket_r) == 0.0
        assert pauli_x.expect(dm_g) == 0.0
        assert np.isclose(pauli_x.expect(ket_plus), 1.0)
        ket_minus = pauli_y.apply_to(ket_plus)
        assert np.isclose(pauli_x.expect(ket_minus), -1.0)

        assert pauli_z.expect(ket_r) == 1.0
        assert pauli_z.expect(dm_g) == -1.0
        assert np.isclose(pauli_z.expect(ket_plus), 0.0)

    def test_add(self, pauli_x, pauli_y, pauli_z):
        r, g = basis(2, 0), basis(2, 1)
        assert pauli_x + pauli_y == TpuOperator(
            (1 - 1j) * (r @ g.dag()) + (1 + 1j) * (g @ r.dag()),
            eigenstates=pauli_x.eigenstates,
        )
        assert TpuOperator(
            qeye(2), eigenstates=pauli_z.eigenstates
        ) + pauli_z == TpuOperator(
            2 * r.proj(), eigenstates=pauli_z.eigenstates
        )

    def test_rmul(self, pauli_i, pauli_z):
        assert (1 - 2j) * pauli_i == TpuOperator(
            (1 - 2j) * qeye(2), eigenstates=pauli_z.eigenstates
        )
        assert 0.5 * (pauli_i + pauli_z) == TpuOperator(
            basis(2, 0).proj(), eigenstates=pauli_z.eigenstates
        )

    def test_matmul(self, pauli_i, pauli_x, pauli_y, pauli_z):
        assert (
            pauli_x @ pauli_x
            == pauli_y @ pauli_y
            == pauli_z @ pauli_z
            == pauli_i
        )
        assert pauli_x @ pauli_z == -1j * pauli_y
        assert pauli_z @ pauli_x == 1j * pauli_y

    def test_from_operator_repr_key_errors(self):
        for bad_key in ("gggg", "hh"):
            with pytest.raises(
                ValueError,
                match=re.escape(
                    "Every QuditOp key must be made up of two"
                    " eigenstates among ('r', 'g'); instead, got"
                    f" '{bad_key}'."
                ),
            ):
                TpuOperator.from_operator_repr(
                    eigenstates=("r", "g"),
                    n_qudits=2,
                    operations=[
                        (1.0, [({bad_key: 1.0, "rr": -1.0}, {0})])
                    ],
                )

    def test_from_operator_repr_index_errors(self):
        with pytest.raises(
            ValueError,
            match="Got invalid indices for a system with 2 qudits",
        ):
            TpuOperator.from_operator_repr(
                eigenstates=("r", "g"),
                n_qudits=2,
                operations=[
                    (1.0, [({"gg": 1.0, "rr": -1.0}, {3, 5, 9})])
                ],
            )
        with pytest.raises(
            ValueError,
            match=re.escape("only indices {1} were still available"),
        ):
            TpuOperator.from_operator_repr(
                eigenstates=("r", "g"),
                n_qudits=2,
                operations=[
                    (
                        1.0,
                        [
                            ({"gg": 1.0, "rr": -1.0}, {0}),
                            ({"rg": 1.0}, {0}),
                        ],
                    )
                ],
            )

    def test_from_operator_repr(self, pauli_i):
        # Qutrit system, operators on a subset of qudits
        built = TpuOperator.from_operator_repr(
            eigenstates=("r", "g", "h"),
            n_qudits=3,
            operations=[
                (
                    1.0,
                    [
                        ({"rr": 1.0, "hh": -1.0}, {0}),
                        ({"gr": -1j}, {2}),
                    ],
                )
            ],
        )
        assert built == TpuOperator(
            tensor(
                [
                    basis(3, 0).proj() - basis(3, 2).proj(),
                    qeye(3),
                    -1j * (basis(3, 1) @ basis(3, 0).dag()),
                ]
            ),
            eigenstates=("r", "g", "h"),
        )

        # An empty TensorOp gives the identity
        assert (
            TpuOperator.from_operator_repr(
                eigenstates=("r", "g"),
                n_qudits=1,
                operations=[(1, [])],
            )
            == pauli_i
        )

        # Unlisted qudits default to the identity
        assert TpuOperator.from_operator_repr(
            eigenstates=("r", "g"),
            n_qudits=2,
            operations=[
                (0.5, [({"rr": 1.0, "gg": -1.0}, {0})]),
                (0.5, []),
            ],
        ) == TpuOperator(
            tensor([basis(2, 0).proj(), qeye(2)]),
            eigenstates=("r", "g"),
        )

    def test_repr(self, pauli_z):
        assert repr(pauli_z) == (
            "TpuOperator\n"
            + "-" * len("TpuOperator")
            + f"\nEigenstates: {pauli_z.eigenstates}\n"
            + repr(pauli_z.to_qobj())
        )

    def test_eq(self, pauli_i, pauli_z, dm_g):
        g_proj = 0.5 * (pauli_i + (-1) * pauli_z)
        assert g_proj == TpuOperator(
            basis(2, 1).proj(), eigenstates=pauli_i.eigenstates
        )
        assert g_proj != dm_g

    def test_abstract_repr(self):
        kwargs = dict(
            eigenstates=("r", "g"),
            n_qudits=3,
            operations=[
                (0.5, [({"rr": 1.0, "gg": 1.0j}, {0})]),
                (0.5, []),
            ],
        )
        op = TpuOperator.from_operator_repr(**kwargs)
        ser_ops = [
            (
                0.5,
                [
                    (
                        {
                            "rr": 1.0,
                            "gg": {"real": 0.0, "imag": 1.0},
                        },
                        [0],
                    )
                ],
            ),
            (0.5, []),
        ]
        assert json.dumps(op, cls=AbstractReprEncoder) == json.dumps(
            {**kwargs, "operations": ser_ops}
        )

        with pytest.raises(
            AbstractReprError,
            match=re.escape(
                "Failed to serialize state of type 'TpuOperator'"
                " because it was not created via"
                " 'TpuOperator.from_operator_repr()'"
            ),
        ):
            json.dumps(
                TpuOperator(op.to_qobj(), eigenstates=op.eigenstates),
                cls=AbstractReprEncoder,
            )
