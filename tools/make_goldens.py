"""Generates golden final states for the BASELINE configs.

The goldens are produced WITHOUT any pulser_tpu code: sequences are
built and sampled with the REFERENCE pulser-core package
(/root/reference), the dense Hamiltonian is assembled here from the
reference's own nested-dict samples and interaction matrices following
the conventions of the reference emulator
(``pulser-simulation/pulser_simulation/hamiltonian.py:246-439``:
basis orderings [r,g]/[g,h]/[u,d], drive terms
0.5*amp*e^{-i*phase}*sigma_{ab} - 0.5*det*sigma_{cc} + h.c., VdW term
0.5*U*n_i*n_j + h.c., XY term U_xy*sigma_ud*sigma_du + h.c.), and the
Schrodinger/Lindblad equation is integrated with scipy DOP853 at
rtol=1e-11 — far tighter than QuTiP's defaults, so the result is the
exact solution to > 1e-8.

Run: python tools/make_goldens.py   (writes tests/goldens/*.npz)
"""

from __future__ import annotations

import os
import sys

import numpy as np
from scipy.integrate import solve_ivp

sys.path.insert(0, "/root/reference/pulser-core")
import pulser  # noqa: E402
import pulser.sampler as psampler  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)

# Single-qudit basis orderings, as in the reference emulator
BASIS = {
    "ground-rydberg": ["r", "g"],
    "digital": ["g", "h"],
    "XY": ["u", "d"],
}


def kron_all(mats):
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def embed(op, q, n, d):
    mats = [np.eye(d, dtype=complex)] * n
    mats[q] = op
    return kron_all(mats)


def sigma(basis, a, b):
    """|a><b| over the single-qudit basis."""
    d = len(basis)
    m = np.zeros((d, d), dtype=complex)
    m[basis.index(a), basis.index(b)] = 1.0
    return m


def ising_interaction(reg, device):
    """U_ij = C6 / r_ij^6 for every pair, as a diagonal (2^N,)."""
    qubits = list(reg.qubits.keys())
    pos = np.array(
        [np.asarray(reg.qubits[q], dtype=float) for q in qubits]
    )
    n = len(qubits)
    nr = [
        embed(sigma(BASIS["ground-rydberg"], "r", "r"), q, n, 2)
        for q in range(n)
    ]
    h = np.zeros((2**n, 2**n), dtype=complex)
    for i in range(n):
        for j in range(i + 1, n):
            rij = np.linalg.norm(pos[i] - pos[j])
            h += device.interaction_coeff / rij**6 * (nr[i] @ nr[j])
    return h


def xy_interaction(reg, device, mag_field):
    """U_ij^XY (sigma_ud sigma_du + h.c.) with the angular factor."""
    qubits = list(reg.qubits.keys())
    pos = np.array(
        [np.asarray(reg.qubits[q], dtype=float) for q in qubits]
    )
    if pos.shape[1] == 2:
        pos = np.pad(pos, ((0, 0), (0, 1)))
    n = len(qubits)
    basis = BASIS["XY"]
    s_ud = [embed(sigma(basis, "u", "d"), q, n, 2) for q in range(n)]
    s_du = [embed(sigma(basis, "d", "u"), q, n, 2) for q in range(n)]
    s_uu = [embed(sigma(basis, "u", "u"), q, n, 2) for q in range(n)]
    bnorm = np.array(mag_field) / np.linalg.norm(mag_field)
    h = np.zeros((2**n, 2**n), dtype=complex)
    for i in range(n):
        for j in range(i + 1, n):
            dvec = pos[i] - pos[j]
            r = np.linalg.norm(dvec)
            cos2 = (
                (dvec @ bnorm) / r
            ) ** 2 if r else 0.0
            u = device.interaction_coeff_xy * (1 - 3 * cos2) / r**3
            h += u * (s_ud[i] @ s_du[j] + s_du[i] @ s_ud[j])
            # Stacked C6 term between 'u' states (reference
            # hamiltonian_data.py:608-611, hamiltonian.py:276-295:
            # 0.5*U_ryd*sigma_uu*sigma_uu + h.c.)
            u6 = device.interaction_coeff / r**6
            h += u6 * (s_uu[i] @ s_uu[j])
    return h


def drive_terms(nested, qubits, eigenbasis, n):
    """Per-basis per-qubit (amp, det, phase) arrays + their operators.

    Returns a list of (amp[t], det[t], phase[t], op_ab, op_cc) with the
    convention H(t) += 0.5*amp*e^{-i*phase} op_ab - det * op_cc + h.c.
    on op_ab only (op_cc is Hermitian).
    """
    d = len(eigenbasis)
    terms = []
    # The second basis state is the "ground"-like one: drives couple
    # basis[1] -> basis[0] and the detuning projects on basis[0]
    # (reference hamiltonian.py:333-389 op choices per basis).
    ops_of_basis = {
        "ground-rydberg": (("g", "r"), ("r", "r")),
        "digital": (("h", "g"), ("g", "g")),
        "XY": (("u", "d"), ("d", "d")),
    }
    for basis_name, by_addr in nested.items():
        pass
    for addr in nested:  # {"Global", "Local"}
        for basis_name in nested[addr]:
            (a, b), (c, c2) = ops_of_basis[basis_name]
            local_basis = BASIS[basis_name]
            op_ab_local = sigma(local_basis, a, b)
            op_cc_local = sigma(local_basis, c, c2)
            if addr == "Global":
                entries = {
                    q: nested[addr][basis_name] for q in qubits
                }
            else:
                entries = nested[addr][basis_name]
            for q, data in entries.items():
                qi = qubits.index(q)
                terms.append(
                    (
                        np.asarray(data["amp"], dtype=float),
                        np.asarray(data["det"], dtype=float),
                        np.asarray(data["phase"], dtype=float),
                        embed(op_ab_local, qi, len(qubits), d),
                        embed(op_cc_local, qi, len(qubits), d),
                    )
                )
    return terms


def golden_solve(
    seq,
    eval_times_us,
    lindblad_ops=(),
    initial=None,
    with_modulation=False,
):
    """Integrates the sequence at rtol 1e-11, returning the states."""
    samples = psampler.sample(seq, modulation=with_modulation)
    # The reference emulator extends the samples by one slot
    # (pulser-simulation simulation.py:173) so t = T is well-defined
    samples = samples.extend_duration(seq.get_duration() + 1)
    nested = samples.to_nested_dict()
    qubits = list(seq.register.qubits.keys())
    n = len(qubits)
    bases = samples.used_bases
    if len(bases) != 1:
        raise NotImplementedError(f"golden needs one basis: {bases}")
    basis_name = next(iter(bases))
    d = 2
    dim = d**n

    if basis_name == "XY":
        h_static = xy_interaction(
            seq.register, seq.device, seq.magnetic_field
        )
    elif basis_name == "digital":
        # No interaction term in the digital basis (reference
        # hamiltonian.py:396: skipped when "digital" in basis_name)
        h_static = np.zeros((dim, dim), dtype=complex)
    else:
        h_static = ising_interaction(seq.register, seq.device)

    terms = drive_terms(nested, qubits, BASIS[basis_name], n)
    duration = len(terms[0][0])  # ns

    def h_at(t_us):
        # Reference QobjEvo interpolation: coefficient arrays sampled
        # at integer ns, linearly interpolated in between
        t = t_us * 1e3
        i0 = min(int(np.floor(t)), duration - 1)
        i1 = min(i0 + 1, duration - 1)
        frac = np.clip(t - i0, 0.0, 1.0)

        h = h_static.astype(complex).copy()
        for amp, det, phase, op_ab, op_cc in terms:
            a = amp[i0] * (1 - frac) + amp[i1] * frac
            dt_ = det[i0] * (1 - frac) + det[i1] * frac
            ph = phase[i0] * (1 - frac) + phase[i1] * frac
            half = 0.5 * a * np.exp(-1j * ph) * op_ab
            h += half + half.conj().T - dt_ * op_cc
        return h

    if initial is None:
        # Reference "all-ground": every atom in 'g' (or 'u' for XY)
        # (pulser-simulation simulation.py:498-505)
        ground = "u" if basis_name == "XY" else "g"
        k = BASIS[basis_name].index(ground)
        initial = np.zeros(dim, dtype=complex)
        initial[int(k * (dim - 1) / (d - 1))] = 1.0

    if lindblad_ops:
        rho0 = np.outer(initial, initial.conj())

        def rhs(t, y):
            rho = y.reshape(dim, dim)
            h = h_at(t)
            out = -1j * (h @ rho - rho @ h)
            for lop in lindblad_ops:
                out += lop @ rho @ lop.conj().T - 0.5 * (
                    lop.conj().T @ lop @ rho + rho @ lop.conj().T @ lop
                )
            return out.reshape(-1)

        y0 = rho0.reshape(-1)
    else:

        def rhs(t, y):
            return -1j * (h_at(t) @ y)

        y0 = initial

    sol = solve_ivp(
        rhs,
        (0.0, eval_times_us[-1]),
        y0,
        t_eval=eval_times_us,
        rtol=1e-11,
        atol=1e-13,
        method="DOP853",
    )
    return sol.y.T  # (n_eval, dim or dim^2)


def config_bell():
    """2-atom Bell-state blockade pulse."""
    reg = pulser.Register({"q0": (-2.5, 0.0), "q1": (2.5, 0.0)})
    seq = pulser.Sequence(reg, pulser.AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        pulser.Pulse.ConstantDetuning(
            pulser.BlackmanWaveform(1000, np.pi * np.sqrt(2)), 0.0, 0.0
        ),
        "ryd",
    )
    return seq, {}


def config_afm9():
    """3x3 AFM adiabatic sweep with an evaluation-times grid."""
    reg = pulser.Register.square(3, spacing=6.0, prefix="q")
    seq = pulser.Sequence(reg, pulser.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = 2 * np.pi * 1.8
    seq.add(
        pulser.Pulse.ConstantDetuning(
            pulser.RampWaveform(252, 0.0, om), -2 * np.pi * 5, 0.0
        ),
        "ryd",
    )
    seq.add(
        pulser.Pulse.ConstantAmplitude(
            om,
            pulser.RampWaveform(2000, -2 * np.pi * 5, 2 * np.pi * 2),
            0.0,
        ),
        "ryd",
    )
    seq.add(
        pulser.Pulse.ConstantDetuning(
            pulser.RampWaveform(252, om, 0.0), 2 * np.pi * 2, 0.0
        ),
        "ryd",
    )
    return seq, {"eval_fracs": np.linspace(0.25, 1.0, 4)}


def config_xy():
    """XY spin-exchange chain."""
    reg = pulser.Register(
        {"q0": (0.0, 0.0), "q1": (8.0, 0.0), "q2": (16.0, 0.0)}
    )
    seq = pulser.Sequence(reg, pulser.MockDevice)
    seq.declare_channel("mw", "mw_global")
    seq.add(
        pulser.Pulse.ConstantPulse(400, 2 * np.pi * 0.5, 0.0, 0.0), "mw"
    )
    seq.delay(600, "mw")
    return seq, {}


def config_digital():
    """Digital-basis local raman addressing."""
    reg = pulser.Register({"q0": (0.0, 0.0), "q1": (0.0, 8.0)})
    seq = pulser.Sequence(reg, pulser.DigitalAnalogDevice)
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(
        pulser.Pulse.ConstantPulse(200, np.pi * 2.5, 1.0, 0.3), "ram"
    )
    seq.target("q1", "ram")
    seq.add(
        pulser.Pulse.ConstantPulse(300, np.pi * 2.0, -1.0, 1.1), "ram"
    )
    return seq, {}


def config_lindblad():
    """Deterministic Lindblad: rydberg dephasing on a driven pair."""
    reg = pulser.Register({"q0": (-3.0, 0.0), "q1": (3.0, 0.0)})
    seq = pulser.Sequence(reg, pulser.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        pulser.Pulse.ConstantPulse(800, 2 * np.pi, -1.0, 0.0), "ryd"
    )
    rate = 0.25
    n = 2
    basis = BASIS["ground-rydberg"]
    # Reference convention: sqrt(2*rate) * sigma_rr per qubit
    # (pulser-core _hamiltonian_data/hamiltonian_data.py:678)
    lops = [
        np.sqrt(2 * rate) * embed(sigma(basis, "r", "r"), q, n, 2)
        for q in range(n)
    ]
    return seq, {"lindblad_ops": lops, "rate": rate}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    configs = {
        "bell": config_bell,
        "afm9": config_afm9,
        "xy_chain": config_xy,
        "digital_raman": config_digital,
        "lindblad_dephasing": config_lindblad,
    }
    for name, build in configs.items():
        seq, extra = build()
        t_total = seq.get_duration() * 1e-3
        fracs = extra.get("eval_fracs", np.array([1.0]))
        eval_times = np.asarray(fracs) * t_total
        states = golden_solve(
            seq,
            eval_times,
            lindblad_ops=extra.get("lindblad_ops", ()),
        )
        out = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez(
            out,
            states=states,
            eval_times_us=eval_times,
            rate=extra.get("rate", 0.0),
        )
        print(f"{name}: wrote {states.shape} -> {out}")


if __name__ == "__main__":
    main()
