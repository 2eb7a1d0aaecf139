"""Figure helpers: spectrograms, alignments, waveforms.

Reference: FullSubNet_plus/speech_enhance/utils/plot.py (plot_alignment,
plot_spectrogram — rot90 mel-spec image with horizontal colorbar) plus the
spectrogram panels the trainers log to TensorBoard
(base_trainer.py:264-303). Matplotlib Agg only — safe headless.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["plot_alignment", "plot_spectrogram", "plot_waveform",
           "spectrogram_figure"]


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_alignment(alignment: np.ndarray, path) -> Path:
    """Attention/alignment heatmap (ref plot.py:10-24)."""
    plt = _plt()
    alignment = np.minimum(np.asarray(alignment), 1.0)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(alignment, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, format="png")
    plt.close(fig)
    return Path(path)


def plot_spectrogram(spectrogram: np.ndarray, plot_path,
                     title: str = "mel-spec") -> Path:
    """Single rotated spectrogram image (ref plot.py:27-49)."""
    plt = _plt()
    spectrogram = np.asarray(spectrogram)
    fig = plt.figure(figsize=(12, 6))
    fig.text(0.5, 0.02, title, horizontalalignment="center", fontsize=14)
    ax = fig.add_subplot(111)
    im = ax.imshow(np.rot90(spectrogram), interpolation="none",
                   vmin=spectrogram.min(), vmax=spectrogram.max(),
                   aspect="auto")
    fig.colorbar(mappable=im, shrink=0.65, orientation="horizontal", ax=ax)
    fig.tight_layout()
    fig.savefig(plot_path, format="png")
    plt.close(fig)
    return Path(plot_path)


def plot_waveform(waveforms: Sequence[np.ndarray], path,
                  labels: Optional[Sequence[str]] = None,
                  sr: int = 16000) -> Path:
    """Stacked waveform panels (the trainers' noisy/enhanced/clean rows)."""
    plt = _plt()
    n = len(waveforms)
    fig, axes = plt.subplots(n, 1, figsize=(10, 2 * n), sharex=True)
    if n == 1:
        axes = [axes]
    for i, (ax, w) in enumerate(zip(axes, waveforms)):
        w = np.asarray(w)
        t = np.arange(len(w)) / sr
        ax.plot(t, w, linewidth=0.4)
        if labels:
            ax.set_title(labels[i], fontsize=9)
        ax.set_ylim(-1.05, 1.05)
    axes[-1].set_xlabel("seconds")
    fig.tight_layout()
    fig.savefig(path, format="png")
    plt.close(fig)
    return Path(path)


def spectrogram_figure(specs: Sequence[np.ndarray],
                       titles: Optional[Sequence[str]] = None,
                       log_scale: bool = True):
    """Multi-panel log-magnitude spectrogram figure (returned, not saved) —
    the TensorBoard panel the enhancement trainer logs per epoch
    (base_trainer.py:283-303)."""
    plt = _plt()
    n = len(specs)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.6 * n))
    if n == 1:
        axes = [axes]
    for i, (ax, s) in enumerate(zip(axes, specs)):
        s = np.asarray(s)
        if log_scale:
            s = 20 * np.log10(np.maximum(s, 1e-8))
        im = ax.imshow(s, origin="lower", aspect="auto",
                       interpolation="none")
        fig.colorbar(im, ax=ax, fraction=0.046)
        if titles:
            ax.set_title(titles[i], fontsize=9)
    fig.tight_layout()
    return fig
