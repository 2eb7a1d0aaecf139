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
        model_apply(variables, noisy_waveform) -> w_mat [B, n_dirs, 2, F, T],
            or, when crm_apply is None, the COMBINED forward
            (variables, noisy) -> (w_mat, compressed cRM) — i.e.
            DenoisingNPPCModel.forward_with_pred_crm. Prefer the combined
            form: the frozen FullSubNet+ forward dominates the cost and the
            split form runs it twice (and compiles two programs over the
            TPU tunnel).
        crm_apply(variables, noisy_waveform) -> compressed cRM [B, 2, F, T]
            (split form only; pass None for the combined form)
    """

    def __init__(self, model_apply: Callable, crm_apply: Optional[Callable],
                 variables,
                 config: Optional[DenoisingNPPCValidatorConfig] = None):
        self.model_apply = model_apply
        self.crm_apply = crm_apply
        self.variables = variables
        self.config = (config if config is not None
                       else DenoisingNPPCValidatorConfig())
        import jax
        import jax.numpy as jnp

        def _grid_device(noisy, pred_crm, w_mat, length):
            """The ENTIRE (pc, alpha) grid in one program: complex-spec-
            domain variations (ref validator.py:266 `enhanced_complex +
            alpha * pc_spec` — NOT compressed-cRM-domain, whose decompress
            clip at ±9.9 would collapse large-alpha perturbations), plus all
            iSTFTs. One dispatch per sample instead of one per variation."""
            c = self.config
            alphas = jnp.linspace(-3.0, 3.0, c.n_alphas)
            nr, ni = stft_ri(noisy, c.nfft, c.hop_length, c.win_length)
            crm = decompress_cIRM(jnp.transpose(pred_crm, (0, 2, 3, 1)))
            er, ei = apply_crm(crm, nr, ni)                     # [1, F, T]
            enhanced = istft_ri(er, ei, c.nfft, c.hop_length, c.win_length,
                                length=length)
            n_dirs = w_mat.shape[1]
            # per-direction complex specs (ref _crm_directions_to_spectograms
            # :55-102: decompress each w, apply to the noisy spec)
            pc = decompress_cIRM(jnp.transpose(w_mat[0], (0, 2, 3, 1)))
            nrd = jnp.broadcast_to(nr, (n_dirs,) + nr.shape[1:])
            nid = jnp.broadcast_to(ni, (n_dirs,) + ni.shape[1:])
            pr, pi = apply_crm(pc, nrd, nid)                    # [n, F, T]
            a = alphas[None, :, None, None]
            vr = er + a * pr[:, None]                           # [n, A, F, T]
            vi = ei + a * pi[:, None]
            f, t = vr.shape[-2:]
            var_wavs = istft_ri(vr.reshape(-1, f, t), vi.reshape(-1, f, t),
                                c.nfft, c.hop_length, c.win_length,
                                length=length)
            return nr, ni, er, ei, enhanced, pr, pi, vr, vi, var_wavs
        self._grid_jit = jax.jit(_grid_device, static_argnums=3)

    def validate_sample(self, noisy_waveform: np.ndarray,
                        clean_waveform: Optional[np.ndarray] = None,
                        sample_idx: int = 0, make_plot: bool = True,
                        write_audio: bool = True) -> Dict:
        """[L] noisy waveform -> per-(pc, alpha) enhanced variations.
        clean_waveform (optional) adds the Clean and Error panels + clean.wav,
        matching ref visualize_pc_spectrograms :148-302."""
        c = self.config
        noisy = np.asarray(noisy_waveform, np.float32)[None]
        if self.crm_apply is None:     # combined forward_with_pred_crm form
            w_mat, pred_crm = self.model_apply(self.variables, noisy)
        else:
            w_mat = self.model_apply(self.variables, noisy)
            pred_crm = self.crm_apply(self.variables, noisy)
        (nr, ni, er, ei, enhanced, pr, pi, vr, vi,
         var_wavs) = [np.asarray(x) for x in self._grid_jit(
             noisy, pred_crm, w_mat, noisy.shape[-1])]
        alphas = np.linspace(-3, 3, c.n_alphas)
        n_dirs = pr.shape[0]

        out_dir = Path(c.save_dir) / f"sample_{sample_idx}"
        out_dir.mkdir(parents=True, exist_ok=True)

        def write_norm(path, wav):
            # the reference peak-normalizes every written file
            # (validator.py:285-289); write_wav hard-clips at ±1 otherwise
            wav = np.asarray(wav).reshape(-1)
            write_wav(path, wav / (np.max(np.abs(wav)) + 1e-8),
                      c.sample_rate)

        if write_audio:
            write_norm(out_dir / "enhanced.wav", enhanced[0])
            write_norm(out_dir / "noisy.wav", noisy[0])
            if clean_waveform is not None:         # ref :129-133
                write_norm(out_dir / "clean.wav", clean_waveform)

        # base spectrograms (dB) for the figure's first row (ref :207-243)
        def mag_db(r, i):
            return 20 * np.log10(np.sqrt(r ** 2 + i ** 2) + 1e-8)

        base_row = {"Noisy": mag_db(nr[0], ni[0]),
                    "Enhanced": mag_db(er[0], ei[0])}
        if clean_waveform is not None:
            cw = np.asarray(clean_waveform, np.float32).reshape(1, -1)
            cr, ci = stft_ri(cw, c.nfft, c.hop_length, c.win_length)
            cr, ci = np.asarray(cr)[0], np.asarray(ci)[0]
            base_row["Clean"] = mag_db(cr, ci)
            # error = |enhanced - clean| complex difference (ref :230-237)
            base_row["Error (Enh - Clean)"] = 20 * np.log10(
                np.sqrt((er[0] - cr) ** 2 + (ei[0] - ci) ** 2) + 1e-8)

        variations = []
        pc_specs = mag_db(pr, pi)                       # [n_dirs, F, T]
        specs = mag_db(vr, vi)                          # [n_dirs, A, F, T]
        var_wavs = var_wavs.reshape(n_dirs, len(alphas), -1)
        for i in range(n_dirs):
            for j, alpha in enumerate(alphas):
                wav = var_wavs[i, j]
                if write_audio:
                    write_norm(out_dir / f"pc{i + 1}_alpha{alpha:+.1f}.wav",
                               wav)
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
