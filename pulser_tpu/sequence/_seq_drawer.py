"""Drawing of sequences and samples with matplotlib.

Functional counterpart of reference
``pulser-core/pulser/sequence/_seq_drawer.py`` (input vs modulated
output curves, phase curves, per-channel panels, target bars).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Optional

import numpy as np

if TYPE_CHECKING:
    from matplotlib.figure import Figure

    from pulser_tpu.register.base_register import BaseRegister
    from pulser_tpu.sampler.samples import SequenceSamples
    from pulser_tpu.sequence.sequence import Sequence


def _draw_channel_samples(
    ax_amp: Any,
    ax_det: Any,
    ax_phase: Any | None,
    t: np.ndarray,
    amp: np.ndarray,
    det: np.ndarray,
    phase: np.ndarray | None,
    label: str,
    style: str = "-",
    alpha: float = 1.0,
) -> None:
    ax_amp.plot(t, amp, style, color="darkgreen", alpha=alpha, label=label)
    ax_amp.fill_between(t, 0, amp, color="darkgreen", alpha=0.2 * alpha)
    ax_det.plot(t, det, style, color="indigo", alpha=alpha, label=label)
    ax_det.fill_between(t, 0, det, color="indigo", alpha=0.2 * alpha)
    if ax_phase is not None and phase is not None:
        ax_phase.plot(
            t, phase / np.pi, style, color="crimson", alpha=alpha
        )


def draw_samples(
    sampled_seq: SequenceSamples,
    register: Optional[BaseRegister] = None,
    sampling_rate: float = 1.0,
    draw_phase_area: bool = False,
    draw_phase_shifts: bool = False,
    draw_phase_curve: bool = False,
) -> Figure:
    """Draws a SequenceSamples object, one panel row per channel."""
    import matplotlib.pyplot as plt

    n_channels = len(sampled_seq.channels)
    rows_per_ch = 3 if draw_phase_curve else 2
    fig, axes = plt.subplots(
        nrows=n_channels * rows_per_ch,
        ncols=1,
        sharex=True,
        figsize=(12, 2.2 * n_channels * rows_per_ch),
        squeeze=False,
    )
    for i, (ch, cs) in enumerate(
        zip(sampled_seq.channels, sampled_seq.samples_list)
    ):
        ax_amp = axes[i * rows_per_ch][0]
        ax_det = axes[i * rows_per_ch + 1][0]
        ax_phase = (
            axes[i * rows_per_ch + 2][0] if draw_phase_curve else None
        )
        t = np.arange(cs.duration)
        _draw_channel_samples(
            ax_amp,
            ax_det,
            ax_phase,
            t,
            cs.amp.as_array(detach=True),
            cs.det.as_array(detach=True),
            (
                cs.centered_phase.as_array(detach=True)
                if draw_phase_curve
                else None
            ),
            label=ch,
        )
        ax_amp.set_ylabel(r"$\Omega$ (rad/µs)")
        ax_det.set_ylabel(r"$\delta$ (rad/µs)")
        if ax_phase is not None:
            ax_phase.set_ylabel(r"$\phi$ ($\pi$ rad)")
        ax_amp.set_title(f"Channel: {ch}", loc="left", fontsize=10)
    axes[-1][0].set_xlabel("t (ns)")
    fig.tight_layout()
    return fig


def draw_sequence(
    seq: Sequence,
    sampling_rate: Optional[float] = None,
    draw_phase_area: bool = False,
    draw_interp_pts: bool = True,
    draw_phase_shifts: bool = False,
    draw_register: bool = False,
    draw_input: bool = True,
    draw_modulation: bool = False,
    draw_phase_curve: bool = False,
    draw_detuning_maps: bool = False,
    draw_qubit_amp: bool = False,
    draw_qubit_det: bool = False,
    phase_modulated: bool = False,
) -> tuple[
    Figure | None, Figure, Figure | None, Figure | None
]:
    """Draws a sequence: input and/or expected-output curves per channel.

    Returns:
        (register figure or None, pulses figure, per-qubit figure or
        None, per-qubit legend figure or None)
    """
    import matplotlib.pyplot as plt

    from pulser_tpu.sampler import sample

    fig_reg = None
    fig_qubit = None
    fig_legend = None

    if draw_register and not seq.is_register_mappable():
        reg = seq.register
        pos = reg._coords_arr.as_array(detach=True)
        fig_reg, ax_reg = plt.subplots(figsize=(5, 5))
        reg._draw_2D(
            ax_reg,
            pos,
            list(reg.qubit_ids),
            masked_qubits=seq._slm_mask_targets,
        )
        ax_reg.set_title("Register")

    channels = list(seq.declared_channels.keys())
    n_channels = max(len(channels), 1)
    rows_per_ch = 3 if draw_phase_curve else 2
    fig, axes = plt.subplots(
        nrows=n_channels * rows_per_ch,
        ncols=1,
        sharex=True,
        figsize=(12, 2.2 * n_channels * rows_per_ch),
        squeeze=False,
    )

    if channels and seq.get_duration() > 0:
        input_samples = sample(seq)
        mod_samples = (
            sample(
                seq,
                modulation=True,
                extended_duration=seq.get_duration(
                    include_fall_time=True
                ),
            )
            if draw_modulation
            else None
        )
        for i, ch in enumerate(channels):
            ax_amp = axes[i * rows_per_ch][0]
            ax_det = axes[i * rows_per_ch + 1][0]
            ax_phase = (
                axes[i * rows_per_ch + 2][0]
                if draw_phase_curve
                else None
            )
            if draw_input:
                cs = input_samples.channel_samples[ch]
                t = np.arange(cs.duration)
                phase = (
                    cs.phase_modulation.as_array(detach=True)
                    if phase_modulated
                    else cs.centered_phase.as_array(detach=True)
                )
                _draw_channel_samples(
                    ax_amp,
                    ax_det,
                    ax_phase,
                    t,
                    cs.amp.as_array(detach=True),
                    cs.det.as_array(detach=True),
                    phase if draw_phase_curve else None,
                    label="input",
                )
            if mod_samples is not None:
                csm = mod_samples.channel_samples[ch]
                if seq.declared_channels[ch].mod_bandwidth:
                    tm = np.arange(csm.duration)
                    phase_m = (
                        csm.phase_modulation.as_array(detach=True)
                        if phase_modulated
                        else csm.centered_phase.as_array(detach=True)
                    )
                    _draw_channel_samples(
                        ax_amp,
                        ax_det,
                        ax_phase,
                        tm,
                        csm.amp.as_array(detach=True),
                        csm.det.as_array(detach=True),
                        phase_m if draw_phase_curve else None,
                        label="output",
                        style="--",
                        alpha=0.7,
                    )
            ax_amp.set_ylabel(r"$\Omega$ (rad/µs)")
            ax_det.set_ylabel(r"$\delta$ (rad/µs)")
            if ax_phase is not None:
                ax_phase.set_ylabel(r"$\phi$ ($\pi$ rad)")
            ax_amp.set_title(f"Channel: {ch}", loc="left", fontsize=10)
            if draw_phase_area:
                # Annotate pulse areas on the amplitude panel
                cs = input_samples.channel_samples[ch]
                for slot in cs.slots:
                    area = (
                        float(
                            np.sum(
                                cs.amp.as_array(detach=True)[
                                    slot.ti: slot.tf
                                ]
                            )
                        )
                        * 1e-3
                        / np.pi
                    )
                    if area:
                        ax_amp.annotate(
                            f"{area:.2g}π",
                            ((slot.ti + slot.tf) / 2, 0),
                            ha="center",
                            va="bottom",
                            fontsize=8,
                        )
    axes[-1][0].set_xlabel("t (ns)")
    fig.tight_layout()

    return fig_reg, fig, fig_qubit, fig_legend
