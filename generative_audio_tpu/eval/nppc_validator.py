"""NPPC inpainting validator: PC directions vs MC-dropout+PCA baseline,
principal angles, masked-region RMSE, residual error, alpha-sweep
spectrogram grids, audio variation reconstruction with clean phase, and
pluggable transcription/phoneme/pitch analyses.

Reference: nppc_audio/inpainting/validator/validator_nppc_model.py
  validate_sample :930-992, compute_metrics :742-828 (RMSE, ||e - WW^T e||,
  QR+SVD principal angles), save_metrics_to_json :831-870,
  plot_pc_spectrograms :273-478 (alpha in arange(-3, 3.5, 0.5)),
  save_pc_audio_variations :528-659 (clean-phase reconstruction, splice into
  the full original audio, Whisper/wav2vec2 hooks), pitch contours :19-154.

Heavy third-party models (Whisper / wav2vec2 phonemes) are dependency-
injected hooks: pass `transcribe_fn` / `phoneme_fn` callables; when absent
the analyses are skipped with a note in the JSON (no network access here).
Pitch uses the native YIN tracker (eval/pitch.py).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from generative_audio_tpu.eval.mc_dropout import calculate_unet_baseline
from generative_audio_tpu.eval.pitch import yin_pitch_track
from generative_audio_tpu.ops.stft import istft_ri
from generative_audio_tpu.data.audio_io import write_wav

__all__ = ["compute_metrics", "NPPCValidatorConfig", "NPPCValidator"]


# ------------------------------------------------------------- metrics -----
def _rmse_in_gap(pred, target, mask) -> float:
    """||(pred-target)[mask==0]||_2 (ref :760-764)."""
    err = np.asarray(pred) - np.asarray(target)
    return float(np.linalg.norm(err[np.asarray(mask) == 0]))


def _residual_error(error, directions) -> float:
    """||e - W W^T e||_2 with row-normalized W (ref :766-783)."""
    error_flat = np.asarray(error).reshape(1, -1)
    w = np.asarray(directions)
    w = w.reshape(w.shape[1], -1)
    norms = np.linalg.norm(w, axis=1) + 1e-6
    w = w / norms[:, None]
    wt_e = w @ error_flat.T
    w_wt_e = w.T @ wt_e
    return float(np.linalg.norm(error_flat.T - w_wt_e))


def _principal_angles(dirs_a, dirs_b) -> List[float]:
    """QR-orthonormalize both spans, SVD of the cross-Gram, angles in degrees
    (ref :785-810)."""
    a = np.asarray(dirs_a)
    a = a.reshape(a.shape[1], -1)
    b = np.asarray(dirs_b)
    b = b.reshape(b.shape[1], -1)
    qa, _ = np.linalg.qr(a.T)
    qb, _ = np.linalg.qr(b.T)
    s = np.linalg.svd(qa.T @ qb, compute_uv=False)
    return (np.degrees(np.arccos(np.clip(s, -1, 1)))).tolist()


def compute_metrics(nppc_directions, mc_dropout_directions, pred_spec_mag,
                    mean_prediction, clean_spec_mag, mask) -> Dict:
    """Ref validator_nppc_model.py:742-828."""
    error = np.asarray(pred_spec_mag) - np.asarray(clean_spec_mag)
    return {
        "nppc": {
            "rmse": _rmse_in_gap(pred_spec_mag, clean_spec_mag, mask),
            "residual_error": _residual_error(error, nppc_directions),
        },
        "mc_dropout": {
            "rmse": _rmse_in_gap(mean_prediction, clean_spec_mag, mask),
            "residual_error": _residual_error(error, mc_dropout_directions),
        },
        "principal_angles": _principal_angles(nppc_directions,
                                              mc_dropout_directions),
    }


# ----------------------------------------------------------- validator -----
@dataclasses.dataclass
class NPPCValidatorConfig:
    save_dir: str = "validation_output"
    n_mc_samples: int = 50
    n_components: int = 5
    alphas: tuple = tuple(np.arange(-3.0, 3.5, 0.5).tolist())
    audio_alphas: tuple = (-3.0, -1.5, 0.0, 1.5, 3.0)
    nfft: int = 255
    hop_length: int = 128
    win_length: int = 255
    sample_rate: int = 16000


class NPPCValidator:
    """Drives an InpaintingNPPCModel + its frozen restoration UNet.

    Args:
        nppc_apply(variables, masked_log_mag, mask) -> [B, n_dirs, F, T]
        restoration_apply(variables, masked_log_mag, mask, rngs=None)
            -> [B, 1, F, T]; `rngs={'dropout': key}` enables MC-dropout.
        transcribe_fn / phoneme_fn: optional hooks (audio, sr) -> str.
    """

    def __init__(self, nppc_apply: Callable, nppc_variables,
                 restoration_apply: Callable, restoration_variables,
                 config: Optional[NPPCValidatorConfig] = None,
                 transcribe_fn: Optional[Callable] = None,
                 phoneme_fn: Optional[Callable] = None):
        self.nppc_apply = nppc_apply
        self.nppc_variables = nppc_variables
        self.restoration_apply = restoration_apply
        self.restoration_variables = restoration_variables
        # fresh default per instance: the config is mutable (save_dir etc.)
        self.config = config if config is not None else NPPCValidatorConfig()
        self.transcribe_fn = transcribe_fn
        self.phoneme_fn = phoneme_fn
        self._device_fn = None   # lazily built ONE jitted program per shape

    # -------------------------------------------------------------- core ---
    def validate_sample(self, masked_log_mag, mask4, clean_log_mag,
                        sample_idx: int = 0, rng=None,
                        stats: Optional[tuple] = None,
                        clean_phase: Optional[np.ndarray] = None,
                        full_audio: Optional[np.ndarray] = None,
                        gap_bounds: Optional[tuple] = None,
                        make_plots: bool = True,
                        make_audio: bool = True) -> Dict:
        """Ref validate_sample :930-992. All spectrogram inputs [1, 1, F, T]
        in normalized log-mag space; `stats`=(mean, std) undoes the
        normalization for audio reconstruction."""
        import jax
        rng = rng if rng is not None else jax.random.PRNGKey(sample_idx)

        if self._device_fn is None:
            # All device math in ONE jitted program: eager evaluation here
            # (especially the 50 MC-dropout passes) is a tunnel roundtrip
            # per primitive on TPU — minutes per sample.
            def device_fn(nppc_vars, rest_vars, masked, mask, key):
                pc = self.nppc_apply(nppc_vars, masked, mask)
                pr = self.restoration_apply(rest_vars, masked, mask)
                base = calculate_unet_baseline(
                    lambda v, x, m, rngs: self.restoration_apply(
                        v, x, m, rngs=rngs),
                    rest_vars, masked, mask, key,
                    n_mc_samples=self.config.n_mc_samples,
                    n_components=self.config.n_components)
                return pc, pr, base
            self._device_fn = jax.jit(device_fn)

        pc_dirs, pred, baseline = self._device_fn(
            self.nppc_variables, self.restoration_variables,
            masked_log_mag, mask4, rng)
        pc_dirs = np.asarray(pc_dirs)                         # [1, K, F, T]
        pred = np.asarray(pred)

        # mean_prediction is already zeroed outside the gap, and the gap-RMSE
        # consumer only reads mask==0 cells — pass it through unchanged.
        metrics = compute_metrics(
            pc_dirs, np.asarray(baseline["principal_components"]),
            pred, np.asarray(baseline["mean_prediction"]),
            clean_log_mag, mask4)
        metrics["importance_weights"] = np.asarray(
            baseline["importance_weights"]).tolist()

        out_dir = Path(self.config.save_dir) / f"sample_{sample_idx}"
        out_dir.mkdir(parents=True, exist_ok=True)

        if make_plots:
            self.plot_pc_spectrograms(pred, pc_dirs, clean_log_mag, mask4,
                                      out_dir, masked=masked_log_mag)
        if make_audio and stats is not None and clean_phase is not None:
            metrics["audio_variations"] = self.save_pc_audio_variations(
                pred, pc_dirs, clean_phase, stats, out_dir,
                full_audio=full_audio, gap_bounds=gap_bounds)
        # Persist AFTER the audio analyses so transcriptions/phonemes/f0
        # land in the JSON (ref save_metrics_to_json :831-870 writes last).
        self.save_metrics_to_json(metrics, out_dir, sample_idx)
        return metrics

    @staticmethod
    def save_metrics_to_json(metrics: Dict, save_dir, sample_idx: int):
        """Ref save_metrics_to_json :831-870."""
        path = Path(save_dir) / f"metrics_sample_{sample_idx}.json"
        with open(path, "w") as f:
            json.dump(metrics, f, indent=4, default=float)
        return path

    # -------------------------------------------------------------- plots --
    def plot_pc_spectrograms(self, pred, pc_dirs, clean, mask4, out_dir,
                             masked=None, per_image_pngs: bool = True,
                             max_dirs: Optional[int] = None):
        """Full plotting parity with ref plot_pc_spectrograms :273-478:

        * every panel is ZOOMED to the gap plus one gap-width of context on
          each side, with the mask bounds marked by dashed red lines
          (:295-307, :337-338);
        * top row: clean / masked / output / |clean-output| error / zoomed
          clean / zoomed output (:358-434);
        * one row per PC: the direction itself + output + α·direction for
          every α in config.alphas (:437-475);
        * each panel is ALSO dumped as an individual PNG with a real
          time/frequency axis under `<out_dir>/spectrograms/` (:309-354).
        """
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        c = self.config
        pred = np.asarray(pred)[0, 0]
        clean = np.asarray(clean)[0, 0]
        dirs = np.asarray(pc_dirs)[0]
        if max_dirs is not None:
            dirs = dirs[:max_dirs]
        frame_mask = np.asarray(mask4).reshape(
            np.asarray(mask4).shape[0], -1, np.asarray(mask4).shape[-1])[0, 0]
        masked = (np.asarray(masked)[0, 0] if masked is not None
                  else clean * frame_mask[None, :])
        alphas = list(c.alphas)
        n_dirs = dirs.shape[0]
        n_freqs, n_frames = clean.shape
        vmin, vmax = -3.0, 3.0
        vmin_err, vmax_err = 0.0, 3.0

        # gap bounds in frames + one-gap-width context window (ref :295-302)
        gap_cols = np.where(frame_mask == 0)[0]
        if gap_cols.size:
            g0, g1 = int(gap_cols[0]), int(gap_cols[-1]) + 1
        else:
            g0, g1 = 0, n_frames
        width = max(g1 - g0, 1)
        c0 = max(0, g0 - width)
        c1 = min(n_frames, g1 + width)
        sample_len_seconds = n_frames * c.hop_length / c.sample_rate
        tpc = sample_len_seconds / n_frames          # time per frame column
        extent = [c0 * tpc, c1 * tpc, 0, n_freqs]

        spec_dir = Path(out_dir) / "spectrograms"
        if per_image_pngs:
            spec_dir.mkdir(parents=True, exist_ok=True)

        def save_individual(data, filename, is_err=False):
            """Per-panel PNG with time/frequency axes (ref :309-354)."""
            if not per_image_pngs:
                return
            fig_s, ax = plt.subplots(figsize=(10, 6))
            freqs = np.linspace(0, c.sample_rate / 2, n_freqs)
            im = ax.imshow(data, origin="lower", aspect="auto",
                           vmin=vmin_err if is_err else vmin,
                           vmax=vmax_err if is_err else vmax,
                           extent=[c0 * tpc, c1 * tpc, freqs[0], freqs[-1]])
            fig_s.colorbar(im, ax=ax)
            ax.axvline(x=g0 * tpc, color="r", linestyle="--", alpha=0.5)
            ax.axvline(x=g1 * tpc, color="r", linestyle="--", alpha=0.5)
            ax.set_xlabel("Time (s)")
            ax.set_ylabel("Frequency (kHz)")
            yticks = np.arange(0, c.sample_rate / 2 + 1, 2000)
            ax.set_yticks(yticks)
            ax.set_yticklabels([f"{int(f / 1000)}" for f in yticks])
            fig_s.tight_layout()
            fig_s.savefig(spec_dir / filename, dpi=80)
            plt.close(fig_s)

        n_cols = len(alphas) + 1
        fig, axs = plt.subplots(1 + n_dirs, n_cols,
                                figsize=(3 * n_cols, 3 * (1 + n_dirs)),
                                squeeze=False)

        def panel(ax, data, title, is_err=False, vlines=True):
            im = ax.imshow(data[:, c0:c1], origin="lower", aspect="auto",
                           vmin=vmin_err if is_err else vmin,
                           vmax=vmax_err if is_err else vmax, extent=extent)
            ax.set_title(title, fontsize=8)
            fig.colorbar(im, ax=ax)
            if vlines:
                ax.axvline(x=g0 * tpc, color="r", linestyle="--", alpha=0.5)
                ax.axvline(x=g1 * tpc, color="r", linestyle="--", alpha=0.5)

        # top row (ref :358-434)
        error = np.abs(clean - pred)
        panel(axs[0][0], clean, "Clean Spectrogram", vlines=False)
        panel(axs[0][1], masked, "Masked Spectrogram", vlines=False)
        panel(axs[0][2], pred, "Model Output Spectrogram", vlines=False)
        panel(axs[0][3], error, "Reconstruction Error (dB)", is_err=True,
              vlines=False)
        save_individual(clean[:, c0:c1], "clean_spec.png")
        save_individual(masked[:, c0:c1], "masked_spec.png")
        save_individual(pred[:, c0:c1], "output_spec.png")
        save_individual(error[:, c0:c1], "error_spec.png", is_err=True)
        if n_cols > 4:
            panel(axs[0][4], clean, "Clean Spec (Inpainting Region)")
        if n_cols > 5:
            panel(axs[0][5], pred, "Output Spec (Inpainting Region)")
        for j in range(min(6, n_cols), n_cols):
            axs[0][j].remove()

        # PC rows (ref :437-475)
        for i in range(n_dirs):
            panel(axs[i + 1][0], dirs[i], f"PC Direction {i + 1} (dB)")
            save_individual(dirs[i][:, c0:c1], f"pc_direction_{i + 1}.png")
            for j, alpha in enumerate(alphas):
                modified = pred + alpha * dirs[i]
                panel(axs[i + 1][j + 1], modified,
                      f"Base + PC{i + 1} (α={alpha:.1f})")
                save_individual(modified[:, c0:c1],
                                f"pc{i + 1}_alpha_{alpha:.1f}.png")

        fig.tight_layout()
        path = Path(out_dir) / "pc_spectrograms.png"
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    # -------------------------------------------------------------- audio --
    def save_pc_audio_variations(self, pred, pc_dirs, clean_phase, stats,
                                 out_dir, full_audio=None, gap_bounds=None
                                 ) -> List[Dict]:
        """Reconstruct audio per (pc, alpha) with clean phase + denormalized
        log-mag, splice the gap back into the original audio, optionally
        transcribe (ref save_pc_audio_variations :528-659)."""
        c = self.config
        mean, std = stats
        pred = np.asarray(pred)[0, 0]
        dirs = np.asarray(pc_dirs)[0]
        phase = np.asarray(clean_phase)          # [F, T]
        results = []
        for i in range(dirs.shape[0]):
            for alpha in c.audio_alphas:
                log_mag = (pred + alpha * dirs[i]) * float(std) + float(mean)
                mag = np.exp(log_mag) - 1e-6
                real = mag * np.cos(phase)
                imag = mag * np.sin(phase)
                wav = np.asarray(istft_ri(real[None], imag[None], c.nfft,
                                          c.hop_length, c.win_length))[0]
                if full_audio is not None and gap_bounds is not None:
                    s, e = gap_bounds
                    spliced = np.asarray(full_audio).reshape(-1).copy()
                    seg = wav[s:e]
                    spliced[s:s + len(seg)] = seg
                    wav = spliced
                name = f"pc{i + 1}_alpha{alpha:+.1f}.wav"
                write_wav(Path(out_dir) / name, wav, c.sample_rate)
                entry = {"pc": i + 1, "alpha": alpha, "file": name}
                if self.transcribe_fn is not None:
                    entry["transcription"] = self.transcribe_fn(
                        wav, c.sample_rate)
                if self.phoneme_fn is not None:
                    entry["phonemes"] = self.phoneme_fn(wav, c.sample_rate)
                f0, voiced, times = yin_pitch_track(wav, c.sample_rate)
                entry["mean_f0"] = float(np.nanmean(f0)) if voiced.any() else None
                results.append(entry)
        return results

    # ------------------------------------------------------------- pitch ---
    def plot_pitch_comparison(self, wavs: Dict[str, np.ndarray], out_dir,
                              name: str = "pitch_comparison.png"):
        """Pitch contours per variation (ref plot_pitch_comparison :19-154)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 4))
        for label, wav in wavs.items():
            f0, voiced, times = yin_pitch_track(wav, self.config.sample_rate)
            ax.plot(times, f0, label=label, alpha=0.8)
        ax.set_xlabel("time (s)")
        ax.set_ylabel("f0 (Hz)")
        ax.legend(fontsize=7)
        path = Path(out_dir) / name
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path


def organize_jsons(json_dir, output_path=None):
    """Aggregate per-sample metric JSONs into a comparison table + grouped-bar
    figure (ref inpainting/scripts/validator/organize_jsons.py:9-118)."""
    import pandas as pd
    rows = []
    for path in sorted(Path(json_dir).rglob("metrics_sample_*.json")):
        m = json.loads(path.read_text())
        rows.append({
            "sample": path.stem,
            "nppc_rmse": m["nppc"]["rmse"],
            "nppc_residual": m["nppc"]["residual_error"],
            "mc_rmse": m["mc_dropout"]["rmse"],
            "mc_residual": m["mc_dropout"]["residual_error"],
            "min_principal_angle": min(m["principal_angles"]),
        })
    df = pd.DataFrame(rows)
    if output_path and len(df):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        ax = df[["nppc_residual", "mc_residual"]].plot.bar(figsize=(8, 4))
        ax.set_xticklabels(df["sample"], rotation=45, fontsize=7)
        ax.figure.tight_layout()
        ax.figure.savefig(output_path, dpi=100)
        plt.close(ax.figure)
    return df
