"""Aggregation of trajectory states into a density matrix.

Behavioral parity with reference
``pulser-simulation/pulser_simulation/aggregators.py:19``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pulser_tpu.emulator.qobj import Qobj
from pulser_tpu.emulator.tpu_state import TpuState


def density_matrix_aggregator(
    states: Sequence[TpuState],
) -> TpuState:
    """Averages pure trajectory states into a mixed density matrix."""
    if not states:
        raise ValueError("Cannot aggregate an empty list of states.")
    eigenstates = states[0].eigenstates
    dms = []
    for st in states:
        if st.eigenstates != eigenstates:
            raise ValueError(
                "All states must share the same eigenstates to be"
                " aggregated."
            )
        q = st._state
        if q.isket:
            dms.append(q.full() @ q.full().conj().T)
        else:
            dms.append(q.full())
    avg = np.mean(np.stack(dms), axis=0)
    dims = [states[0]._state.dims[0], states[0]._state.dims[0]]
    return TpuState(Qobj(avg, dims=dims), eigenstates=eigenstates)
