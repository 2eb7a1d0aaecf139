"""Denoising-line NPPC validator: per-direction cRM variations applied to the
noisy spectrogram, alpha-sweep audio + figure.

Reference: nppc_audio/validator.py:55-302 (NPPCAudioValidator:
per-dir cRM -> decompress -> apply to noisy STFT -> complex spec :55-102;
alpha in linspace(-3, 3, 6) grid, audio per (pc, alpha) via iSTFT, a
(n_dirs x 9)-panel matplotlib figure :148-302).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from generative_audio_tpu.ops.stft import stft_ri, istft_ri
from generative_audio_tpu.ops.mask import decompress_cIRM, apply_crm
from generative_audio_tpu.data.audio_io import write_wav

__all__ = ["DenoisingNPPCValidatorConfig", "DenoisingNPPCValidator"]


@dataclasses.dataclass
class DenoisingNPPCValidatorConfig:
    save_dir: str = "denoising_validation"
    nfft: int = 512
    hop_length: int = 256
    win_length: int = 512
    sample_rate: int = 16000
    n_alphas: int = 6   # linspace(-3, 3, 6) per reference :148


class DenoisingNPPCValidator:
    """Args:
        model_apply(variables, noisy_waveform) -> w_mat [B, n_dirs, 2, F, T]
        crm_apply(variables, noisy_waveform) -> compressed cRM [B, 2, F, T]
    """

    def __init__(self, model_apply: Callable, crm_apply: Callable, variables,
                 config: DenoisingNPPCValidatorConfig =
                 DenoisingNPPCValidatorConfig()):
        self.model_apply = model_apply
        self.crm_apply = crm_apply
        self.variables = variables
        self.config = config

    def _enhance(self, crm_bft2, noisy_real, noisy_imag, length):
        c = self.config
        crm = decompress_cIRM(crm_bft2)
        er, ei = apply_crm(crm, noisy_real, noisy_imag)
        return np.asarray(istft_ri(er, ei, c.nfft, c.hop_length,
                                   c.win_length, length=length))

    def validate_sample(self, noisy_waveform: np.ndarray,
                        sample_idx: int = 0, make_plot: bool = True,
                        write_audio: bool = True) -> Dict:
        """[L] noisy waveform -> per-(pc, alpha) enhanced variations."""
        c = self.config
        noisy = np.asarray(noisy_waveform, np.float32)[None]
        w_mat = np.asarray(self.model_apply(self.variables, noisy))
        pred_crm = np.asarray(self.crm_apply(self.variables, noisy))
        nr, ni = stft_ri(noisy, c.nfft, c.hop_length, c.win_length)
        nr, ni = np.asarray(nr), np.asarray(ni)

        out_dir = Path(c.save_dir) / f"sample_{sample_idx}"
        out_dir.mkdir(parents=True, exist_ok=True)
        alphas = np.linspace(-3, 3, c.n_alphas)
        n_dirs = w_mat.shape[1]

        base = self._enhance(np.transpose(pred_crm, (0, 2, 3, 1)), nr, ni,
                             noisy.shape[-1])[0]
        if write_audio:
            write_wav(out_dir / "enhanced.wav", base, c.sample_rate)
            write_wav(out_dir / "noisy.wav", noisy[0], c.sample_rate)

        variations = []
        specs = np.zeros((n_dirs, len(alphas)) + nr.shape[1:], np.float32)
        for i in range(n_dirs):
            for j, alpha in enumerate(alphas):
                crm_var = pred_crm + alpha * w_mat[:, i]   # [B, 2, F, T]
                wav = self._enhance(np.transpose(crm_var, (0, 2, 3, 1)),
                                    nr, ni, noisy.shape[-1])[0]
                if write_audio:
                    write_wav(out_dir / f"pc{i + 1}_alpha{alpha:+.1f}.wav",
                              wav, c.sample_rate)
                r2, i2 = stft_ri(wav[None], c.nfft, c.hop_length,
                                 c.win_length)
                specs[i, j] = np.sqrt(np.asarray(r2)[0] ** 2
                                      + np.asarray(i2)[0] ** 2)
                variations.append({"pc": i + 1, "alpha": float(alpha),
                                   "rms": float(np.sqrt(np.mean(wav ** 2)))})

        if make_plot:
            self._plot_grid(specs, alphas, out_dir)
        return {"variations": variations, "n_dirs": n_dirs,
                "save_dir": str(out_dir)}

    def _plot_grid(self, specs, alphas, out_dir):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n_dirs, n_alphas = specs.shape[:2]
        fig, axes = plt.subplots(n_dirs, n_alphas,
                                 figsize=(2 * n_alphas, 2 * n_dirs),
                                 squeeze=False)
        for i in range(n_dirs):
            for j in range(n_alphas):
                axes[i][j].imshow(
                    np.log10(specs[i, j] + 1e-6), origin="lower",
                    aspect="auto", cmap="magma")
                axes[i][j].set_xticks([])
                axes[i][j].set_yticks([])
                if i == 0:
                    axes[i][j].set_title(f"α={alphas[j]:+.1f}", fontsize=8)
            axes[i][0].set_ylabel(f"PC {i + 1}", fontsize=8)
        fig.tight_layout()
        fig.savefig(Path(out_dir) / "pc_variations.png", dpi=100)
        plt.close(fig)
