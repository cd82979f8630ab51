"""TpuBackendV2 observable pipeline + TpuState/TpuOperator API."""

from __future__ import annotations

import numpy as np

import pulser_tpu as tpu
from pulser_tpu.backend.default_observables import (
    BitStrings,
    CorrelationMatrix,
    Energy,
    Fidelity,
    Occupation,
    StateResult,
)
from pulser_tpu.emulator import (
    TpuBackendV2,
    TpuConfig,
    TpuOperator,
    TpuState,
)


def _seq():
    reg = tpu.Register.square(2, spacing=7.0, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(300, np.pi, 0.0, 0.0), "ryd")
    return seq


def test_backend_v2_observable_pipeline():
    ggg = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"gggg": 1.0}
    )
    config = TpuConfig(
        observables=[
            BitStrings(evaluation_times=[1.0], num_shots=500),
            Occupation(evaluation_times=[0.5, 1.0]),
            CorrelationMatrix(evaluation_times=[1.0]),
            Energy(evaluation_times=[1.0]),
            Fidelity(ggg, evaluation_times=[1.0]),
            StateResult(evaluation_times=[1.0]),
        ],
    )
    backend = TpuBackendV2(_seq(), config=config)
    results = backend.run()
    occ = results.occupation[-1]
    assert len(occ) == 4
    assert all(0 <= float(o) <= 1 for o in occ)
    corr = results.correlation_matrix[-1]
    assert np.asarray(corr).shape == (4, 4)
    counts = results.bitstrings[-1]
    assert sum(counts.values()) == 500
    fid = float(np.real(results.fidelity[-1]))
    assert 0.0 <= fid <= 1.0
    state = results.state[-1]
    assert isinstance(state, TpuState)
    # overlap(self, self) = 1 for a normalized pure state
    assert abs(float(np.real(state.overlap(state))) - 1) < 1e-6
    energy = float(np.real(results.energy[-1]))
    assert np.isfinite(energy)


def test_backend_v2_default_config():
    backend = TpuBackendV2(_seq())
    results = backend.run()
    counts = results.bitstrings[-1]
    assert sum(counts.values()) > 0


def test_tpu_state_api():
    st = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"),
        amplitudes={"gg": 1 / np.sqrt(2), "rr": 1 / np.sqrt(2)},
    )
    assert st.n_qudits == 2
    probs = st.bitstring_probabilities()
    assert abs(probs["00"] - 0.5) < 1e-9
    assert abs(probs["11"] - 0.5) < 1e-9
    samples = st.sample(num_shots=200)
    assert sum(samples.values()) == 200
    other = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"gg": 1.0}
    )
    # overlap already returns |<a|b>|^2 for pure states
    ov = float(np.real(st.overlap(other)))
    assert abs(ov - 0.5) < 1e-9


def test_tpu_operator_api():
    op = TpuOperator.from_operator_repr(
        eigenstates=("r", "g"),
        n_qudits=2,
        operations=[(1.0, [({"rr": 1.0}, [0])])],
    )
    st = TpuState.from_state_amplitudes(
        eigenstates=("r", "g"), amplitudes={"rg": 1.0}
    )
    applied = op.apply_to(st)
    exp = float(np.real(st.overlap(applied)))
    assert abs(exp - 1.0) < 1e-9
