"""Standalone restoration-model validator for the inpainting line.

Reference: /root/reference/nppc_audio/inpainting/validator/
validator_restoration_model.py:43-166 — per-sample masked-region (gap) MSE in
normalized log-magnitude space plus the 2x2 spectrogram/error figure
(clean | masked | model output | gap-only reconstruction error), and a
loader-level aggregation written to JSON.

TPU-native notes: the model forward is a caller-supplied (usually jitted)
apply function; all figure/JSON work happens on host numpy copies.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from generative_audio_tpu.ops.preprocess import preprocess_data

__all__ = ["RestorationValidatorConfig", "RestorationValidator",
           "plot_spectrograms_and_error"]


def plot_spectrograms_and_error(clean_norm_log, masked_norm_log, output,
                                mask_frames, sample_len_seconds: float,
                                vmin: float = -3.0, vmax: float = 3.0,
                                vmin_err: float = 0.0, vmax_err: float = 3.0):
    """The reference's 2x2 figure (validator_restoration_model.py:43-99):
    clean / masked / output spectrograms on a fixed [-3, 3] dB-like scale and
    the |clean - output| error restricted to the gap frames.

    Args: [1, 1, F, T] normalized log-mags + [T] frame mask (1 = known).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    clean = np.asarray(clean_norm_log)[0, 0]
    masked = np.asarray(masked_norm_log)[0, 0]
    out = np.asarray(output)[0, 0]
    mask_frames = np.asarray(mask_frames).reshape(-1)
    n_freqs = clean.shape[0]
    extent = [0, sample_len_seconds, 0, n_freqs]

    fig, axs = plt.subplots(2, 2, figsize=(15, 12))
    for ax, img, title in [(axs[0, 0], clean, "Clean Spectrogram"),
                           (axs[0, 1], masked, "Masked Spectrogram"),
                           (axs[1, 0], out, "Model Output Spectrogram")]:
        im = ax.imshow(img, origin="lower", aspect="auto",
                       vmin=vmin, vmax=vmax, extent=extent)
        ax.set_title(title)
        fig.colorbar(im, ax=ax)

    # gap-only error: the reference reshapes error[mask == 0] back to
    # [F, T_gap] (:82-88); with a frame mask that is column selection
    gap_cols = np.where(mask_frames == 0)[0]
    err = np.abs(clean - out)
    err_gap = (err[:, gap_cols] if gap_cols.size
               else np.zeros((n_freqs, 1), err.dtype))
    # the gap panel spans only the gap's OWN time range — reusing the
    # full-clip extent would stretch a 0.3 s gap across the whole axis
    frame_dt = sample_len_seconds / clean.shape[1]
    gap_extent = ([gap_cols[0] * frame_dt, (gap_cols[-1] + 1) * frame_dt,
                   0, n_freqs] if gap_cols.size else extent)
    im = axs[1, 1].imshow(err_gap, origin="lower", aspect="auto",
                          vmin=vmin_err, vmax=vmax_err, extent=gap_extent)
    axs[1, 1].set_title("Reconstruction Error (dB)")
    fig.colorbar(im, ax=axs[1, 1])
    fig.tight_layout()
    return fig


@dataclasses.dataclass
class RestorationValidatorConfig:
    """Ref InpaintingModelValidatorConfig (validator_restoration_model.py:102)."""
    save_dir: str = "validation_results"
    sample_len_seconds: float = 2.044
    max_figures: int = 4     # per-sample figures saved for the first N items


class RestorationValidator:
    """Ref InpaintingModelValidator (validator_restoration_model.py:109-166).

    Args:
        restoration_apply(variables, masked_log_mag, mask4) -> [B, 1, F, T]
            the (usually jitted) RestorationWrapper forward.
    """

    def __init__(self, restoration_apply: Callable, variables,
                 config: Optional[RestorationValidatorConfig] = None):
        self.restoration_apply = restoration_apply
        self.variables = variables
        # fresh default per instance: the config is mutable (save_dir etc.)
        self.config = (config if config is not None
                       else RestorationValidatorConfig())

    def validate_sample(self, masked_spec, mask_frames, clean_spec,
                        sample_idx: int = 0, make_plot: bool = True) -> Dict:
        """One sample: raw STFT pairs [1, 2, F, T] + frame mask [1, T] ->
        gap MSE in normalized log-mag space (+ optional 2x2 figure).
        Ref validate_sample :130-166."""
        clean_norm_log, mask4, masked_norm_log = preprocess_data(
            clean_spec, masked_spec, mask_frames)
        out = self.restoration_apply(self.variables, masked_norm_log, mask4)

        omask = 1.0 - np.asarray(mask4)
        diff = np.asarray(out) - np.asarray(clean_norm_log)
        mse_gap = float((diff ** 2 * omask).sum() / max(omask.sum(), 1.0))

        result = {"mse": mse_gap, "output": np.asarray(out)}
        if make_plot:
            fig = plot_spectrograms_and_error(
                clean_norm_log, masked_norm_log, out,
                np.asarray(mask_frames)[0], self.config.sample_len_seconds)
            out_dir = Path(self.config.save_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            path = out_dir / f"spectrogram_comparison_{sample_idx}.png"
            fig.savefig(path, dpi=100)
            import matplotlib.pyplot as plt
            plt.close(fig)
            result["figure_path"] = str(path)
        return result

    def validate_dataloader(self, loader, max_samples: Optional[int] = None
                            ) -> Dict:
        """Loader-level masked-MSE: mean gap MSE over (masked_spec,
        mask_frames, clean_spec) batches, per-sample figures for the first
        `config.max_figures` items, JSON summary on disk."""
        mses = []
        idx = 0
        for batch in loader:
            masked_spec, mask_frames, clean_spec = batch[:3]
            masked_spec = np.asarray(masked_spec)
            mask_frames = np.asarray(mask_frames)
            clean_spec = np.asarray(clean_spec)
            for b in range(masked_spec.shape[0]):
                if max_samples is not None and idx >= max_samples:
                    break
                r = self.validate_sample(
                    masked_spec[b:b + 1], mask_frames[b:b + 1],
                    clean_spec[b:b + 1], sample_idx=idx,
                    make_plot=idx < self.config.max_figures)
                mses.append(r["mse"])
                idx += 1
            if max_samples is not None and idx >= max_samples:
                break
        summary = {"num_samples": idx,
                   "mean_gap_mse": float(np.mean(mses)) if mses else None,
                   "per_sample_mse": mses}
        out_dir = Path(self.config.save_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "restoration_validation.json").write_text(
            json.dumps(summary, indent=4))
        return summary
