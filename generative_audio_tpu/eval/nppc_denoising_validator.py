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
        import jax

        def _enhance_device(crm_bft2, noisy_real, noisy_imag, length):
            c = self.config
            crm = decompress_cIRM(crm_bft2)
            er, ei = apply_crm(crm, noisy_real, noisy_imag)
            return istft_ri(er, ei, c.nfft, c.hop_length, c.win_length,
                            length=length)
        # one jitted program, reused across the (pc, alpha) grid — eager
        # per-variation evaluation is tunnel-roundtrip-bound on TPU
        self._enhance_jit = jax.jit(_enhance_device, static_argnums=3)

    def _enhance(self, crm_bft2, noisy_real, noisy_imag, length):
        return np.asarray(self._enhance_jit(crm_bft2, noisy_real, noisy_imag,
                                            length))

    def validate_sample(self, noisy_waveform: np.ndarray,
                        clean_waveform: Optional[np.ndarray] = None,
                        sample_idx: int = 0, make_plot: bool = True,
                        write_audio: bool = True) -> Dict:
        """[L] noisy waveform -> per-(pc, alpha) enhanced variations.
        clean_waveform (optional) adds the Clean and Error panels + clean.wav,
        matching ref visualize_pc_spectrograms :148-302."""
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
            if clean_waveform is not None:         # ref :129-133
                write_wav(out_dir / "clean.wav",
                          np.asarray(clean_waveform).reshape(-1),
                          c.sample_rate)

        # base spectrograms (dB) for the figure's first row (ref :207-243)
        def mag_db(r, i):
            return 20 * np.log10(np.sqrt(r ** 2 + i ** 2) + 1e-8)

        er, ei = stft_ri(base[None], c.nfft, c.hop_length, c.win_length)
        er, ei = np.asarray(er)[0], np.asarray(ei)[0]
        base_row = {"Noisy": mag_db(nr[0], ni[0]),
                    "Enhanced": mag_db(er, ei)}
        if clean_waveform is not None:
            cw = np.asarray(clean_waveform, np.float32).reshape(1, -1)
            cr, ci = stft_ri(cw, c.nfft, c.hop_length, c.win_length)
            cr, ci = np.asarray(cr)[0], np.asarray(ci)[0]
            base_row["Clean"] = mag_db(cr, ci)
            # error = |enhanced - clean| complex difference (ref :230-237)
            base_row["Error (Enh - Clean)"] = 20 * np.log10(
                np.sqrt((er - cr) ** 2 + (ei - ci) ** 2) + 1e-8)

        variations = []
        # PC cRM direction -> complex spec magnitude (ref
        # _crm_directions_to_spectograms :55-102) for the per-PC lead panel
        pc_specs = np.zeros((n_dirs,) + nr.shape[1:], np.float32)
        specs = np.zeros((n_dirs, len(alphas)) + nr.shape[1:], np.float32)
        for i in range(n_dirs):
            dir_wav = self._enhance(
                np.transpose(w_mat[:, i], (0, 2, 3, 1)), nr, ni,
                noisy.shape[-1])[0]
            dr, di = stft_ri(dir_wav[None], c.nfft, c.hop_length,
                             c.win_length)
            pc_specs[i] = mag_db(np.asarray(dr)[0], np.asarray(di)[0])
            for j, alpha in enumerate(alphas):
                crm_var = pred_crm + alpha * w_mat[:, i]   # [B, 2, F, T]
                wav = self._enhance(np.transpose(crm_var, (0, 2, 3, 1)),
                                    nr, ni, noisy.shape[-1])[0]
                if write_audio:
                    write_wav(out_dir / f"pc{i + 1}_alpha{alpha:+.1f}.wav",
                              wav, c.sample_rate)
                r2, i2 = stft_ri(wav[None], c.nfft, c.hop_length,
                                 c.win_length)
                specs[i, j] = mag_db(np.asarray(r2)[0], np.asarray(i2)[0])
                variations.append({"pc": i + 1, "alpha": float(alpha),
                                   "rms": float(np.sqrt(np.mean(wav ** 2)))})

        if make_plot:
            self._plot_grid(base_row, pc_specs, specs, alphas, out_dir)
        return {"variations": variations, "n_dirs": n_dirs,
                "save_dir": str(out_dir)}

    def _plot_grid(self, base_row, pc_specs, specs, alphas, out_dir):
        """The reference's (1 + n_dirs) x 9 figure (ref :202-294): row 0 =
        noisy / clean / enhanced / error base spectrograms; each PC row =
        the PC's own complex-spec magnitude + one panel per alpha."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n_dirs, n_alphas = specs.shape[:2]
        n_cols = max(n_alphas + 1, 9) if n_alphas >= 6 else n_alphas + 1
        n_rows = n_dirs + 1
        fig, axes = plt.subplots(n_rows, n_cols,
                                 figsize=(3 * n_cols, 3 * n_rows),
                                 squeeze=False)

        order = ["Noisy", "Clean", "Enhanced", "Error (Enh - Clean)"]
        col = 0
        for title in order:
            if title not in base_row:
                continue
            ax = axes[0][col]
            kw = ({"vmin": -60, "vmax": 0} if "Error" in title or
                  title.startswith("PC") else {})
            im = ax.imshow(base_row[title], origin="lower", aspect="auto",
                           **kw)
            fig.colorbar(im, ax=ax)
            ax.set_title(title, fontsize=8)
            if col == 0:
                ax.set_ylabel("Base\nSpectrograms", fontsize=8)
            col += 1
        for j in range(col, n_cols):
            axes[0][j].remove()

        for i in range(n_dirs):
            ax = axes[i + 1][0]
            im = ax.imshow(pc_specs[i], origin="lower", aspect="auto",
                           vmin=-60, vmax=0)
            fig.colorbar(im, ax=ax)
            ax.set_title(f"PC {i + 1}", fontsize=8)
            ax.set_ylabel(f"PC {i + 1}\nVariations", fontsize=8)
            for j in range(n_alphas):
                ax = axes[i + 1][j + 1]
                im = ax.imshow(specs[i, j], origin="lower", aspect="auto")
                fig.colorbar(im, ax=ax)
                ax.set_title(f"α={alphas[j]:+.1f}", fontsize=8)
            for j in range(n_alphas + 1, n_cols):
                axes[i + 1][j].remove()
        fig.tight_layout()
        fig.savefig(Path(out_dir) / "pc_spectrograms_variations.png", dpi=100)
        plt.close(fig)
