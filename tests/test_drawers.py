"""Drawer smoke + structure tests (Agg backend, no display).

Checks figure structure: panel counts, EOM shading patches, target
bars, phase/area annotations, interpolation points, per-qubit figures
with a legend, detuning-map panels and register drawing (with blockade
radius graph). All figures are closed after each assertion.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

import pulser_tpu as tpu  # noqa: E402
from pulser_tpu.sampler import sample  # noqa: E402
from pulser_tpu.sequence._seq_drawer import (  # noqa: E402
    draw_samples,
    draw_sequence,
)


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


def _basic_sequence():
    reg = tpu.Register({"q0": (0, 0), "q1": (0, 8)})
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_local", initial_target="q0")
    seq.add(
        tpu.Pulse.ConstantDetuning(
            tpu.InterpolatedWaveform(300, [0.0, 2.0, 0.0]), -1.0, 0.5
        ),
        "ryd",
    )
    seq.add(tpu.Pulse.ConstantPulse(200, 1.0, 0.0, 0.0), "ram")
    seq.phase_shift(0.4, "q0", basis="digital")
    seq.target("q1", "ram")
    seq.phase_shift(0.6, "q1", basis="digital")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
    return seq


def test_basic_figure_structure():
    seq = _basic_sequence()
    fig_reg, fig, fig_qubit, fig_legend = draw_sequence(seq)
    assert fig_reg is None and fig_qubit is None and fig_legend is None
    # Two channels x (amp, det) rows
    assert len(fig.axes) == 4


def test_phase_curve_adds_a_row_per_channel():
    seq = _basic_sequence()
    _, fig, _, _ = draw_sequence(seq, draw_phase_curve=True)
    assert len(fig.axes) == 6


def test_register_figure_and_masked_qubits():
    seq = _basic_sequence()
    fig_reg, _, _, _ = draw_sequence(seq, draw_register=True)
    assert fig_reg is not None
    assert len(fig_reg.axes) == 1
    assert fig_reg.axes[0].get_title() == "Register"


def test_phase_area_annotations():
    seq = _basic_sequence()
    _, fig, _, _ = draw_sequence(seq, draw_phase_area=True)
    notes = [
        t.get_text()
        for ax in fig.axes
        for t in ax.texts
        if "A:" in t.get_text()
    ]
    assert notes, "pulse area annotations missing"
    assert any("φ" in n for n in notes)


def test_interp_points_scatter():
    seq = _basic_sequence()
    _, fig, _, _ = draw_sequence(seq, draw_interp_pts=True)
    # The amp panel of 'ryd' carries a scatter with the control points
    assert any(len(ax.collections) > 1 for ax in fig.axes)


def test_phase_shift_marks():
    seq = _basic_sequence()
    _, fig, _, _ = draw_sequence(seq, draw_phase_shifts=True)
    vlines = [
        ln
        for ax in fig.axes
        for ln in ax.lines
        if ln.get_linestyle() == ":"
    ]
    assert vlines, "phase-shift vertical markers missing"


def test_target_bars_name_the_targets():
    seq = _basic_sequence()
    _, fig, _, _ = draw_sequence(seq)
    texts = [t.get_text() for ax in fig.axes for t in ax.texts]
    assert "q0" in texts and "q1" in texts


def test_eom_interval_shading():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 10)}), tpu.AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
    seq.add_eom_pulse("ryd", duration=100, phase=0.0)
    seq.disable_eom_mode("ryd")
    _, fig, _, _ = draw_sequence(seq)
    spans = [p for ax in fig.axes for p in ax.patches]
    assert spans, "EOM interval shading missing"
    labels = [t.get_text() for ax in fig.axes for t in ax.texts]
    assert "EOM" in labels


def test_modulated_output_overlay():
    seq = tpu.Sequence(
        tpu.Register({"q0": (0, 0), "q1": (0, 10)}), tpu.AnalogDevice
    )
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(tpu.Pulse.ConstantPulse(120, 2.0, 0.0, 0.0), "ryd")
    _, fig, _, _ = draw_sequence(seq, draw_modulation=True)
    labels = {
        ln.get_label() for ax in fig.axes for ln in ax.lines
    }
    assert {"input", "output"} <= labels


def test_per_qubit_figures_and_legend():
    seq = _basic_sequence()
    _, _, fig_qubit, fig_legend = draw_sequence(
        seq, draw_qubit_amp=True, draw_qubit_det=True
    )
    assert fig_qubit is not None and fig_legend is not None
    # 2 bases x 2 quantities
    assert len(fig_qubit.axes) == 4
    legend_texts = [
        t.get_text()
        for leg in fig_legend.legends
        for t in leg.get_texts()
    ]
    assert "q0" in legend_texts and "q1" in legend_texts


def test_detuning_map_panels():
    reg = tpu.Register.square(2, spacing=6, prefix="q")
    seq = tpu.Sequence(reg, tpu.MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    dmap = reg.define_detuning_map({"q0": 1.0, "q3": 0.5})
    seq.config_detuning_map(dmap, "dmm_0")
    seq.add_dmm_detuning(tpu.ConstantWaveform(100, -2.0), "dmm_0")
    seq.add(tpu.Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    fig_reg, _, _, _ = draw_sequence(
        seq, draw_register=True, draw_detuning_maps=True
    )
    assert fig_reg is not None
    assert len(fig_reg.axes) >= 2  # register + 1 map (+ colorbars)
    titles = {ax.get_title() for ax in fig_reg.axes}
    assert any("Detuning map" in t for t in titles)


def test_draw_samples_standalone():
    seq = _basic_sequence()
    fig = draw_samples(
        sample(seq), draw_phase_curve=True, draw_phase_area=True
    )
    assert len(fig.axes) == 6


def test_sequence_draw_entrypoint_modes(tmp_path):
    import warnings

    seq = _basic_sequence()
    for mode in ("input", "output", "input+output"):
        with warnings.catch_warnings():
            # 'output' mode warns about input-only decorations
            warnings.simplefilter("ignore", UserWarning)
            seq.draw(mode=mode, show=False)
    with pytest.raises(ValueError, match="'mode' must be one of"):
        seq.draw(mode="sideways", show=False)
    # Saving writes the pulse figure (+ suffixed figures when present)
    out = tmp_path / "drawing.png"
    seq.draw(
        show=False,
        fig_name=str(out),
        draw_qubit_amp=True,
        draw_register=True,
    )
    saved = {p.name for p in tmp_path.iterdir()}
    assert {
        "drawing.png",
        "drawing_register.png",
        "drawing_per_qubit.png",
        "drawing_per_qubit_legend.png",
    } <= saved


def test_register_draw_with_blockade_radius(tmp_path):
    reg = tpu.Register.square(2, spacing=6, prefix="q")
    reg.draw(
        blockade_radius=8.0,
        draw_graph=True,
        draw_half_radius=True,
        show=False,
    )
    layout = tpu.register.TriangularLatticeLayout(20, 6.0)
    layout.draw(blockade_radius=8.0, draw_half_radius=True, show=False)


def test_waveform_and_pulse_draw():
    wf = tpu.BlackmanWaveform(500, np.pi)
    wf.draw(output_channel=tpu.AnalogDevice.channels["rydberg_global"])
    tpu.Pulse.ConstantDetuning(wf, -1.0, 0.2).draw()
