"""Log-magnitude spectrogram preprocessing for the inpainting line.

Reference: /root/reference/utils.py:259-306 (normalize_spectrograms /
preprocess_log_magnitude / preprocess_data).

Note the reference's exact statistics semantics, replicated here:
  * preprocess_log_magnitude computes mean/std over the WHOLE batch tensor
    (scalar stats, torch default unbiased std).
  * preprocess_data normalizes the masked spectrogram with the CLEAN
    spectrogram's statistics (shared stats).
  * the frame mask [B, T] expands to [B, 1, F, T].
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "normalize_spectrograms",
    "denormalize_spectrograms",
    "preprocess_log_magnitude",
    "preprocess_data",
    "expand_frame_mask",
]


def normalize_spectrograms(spec: jnp.ndarray):
    """Per-(B, C) zero-mean/unit-variance. Ref utils.py:259-266."""
    b, c = spec.shape[:2]
    flat = spec.reshape(b, c, -1)
    mean = flat.mean(axis=2)[..., None, None]
    std = flat.std(axis=2, ddof=1)[..., None, None]
    return (spec - mean) / (std + 1e-6), mean, std


def denormalize_spectrograms(spec_norm: jnp.ndarray, spec_mean, spec_std):
    """Ref utils.py:269-271."""
    return spec_norm * (spec_std + 1e-6) + spec_mean


def preprocess_log_magnitude(magnitude: jnp.ndarray, eps: float = 1e-6
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """log(mag + eps), normalized by scalar batch mean/std. Ref utils.py:273-291."""
    log_mag = jnp.log(magnitude + eps)
    mean = log_mag.mean()
    std = log_mag.std(ddof=1)
    return (log_mag - mean) / std, mean, std


def expand_frame_mask(mask: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[B, T] frame mask -> [B, 1, F, T]. Ref utils.py:295-296."""
    return jnp.broadcast_to(mask[:, None, None, :],
                            (mask.shape[0], 1, num_freqs, mask.shape[-1]))


def preprocess_data(clean_spec: jnp.ndarray, masked_spec: jnp.ndarray,
                    mask: jnp.ndarray, return_stats: bool = False):
    """STFT pairs [B, 2, F, T] + frame mask [B, T] -> normalized log-mags.

    Returns (clean_log_mag_norm [B,1,F,T], mask [B,1,F,T],
    masked_log_mag_norm [B,1,F,T]) — the masked branch shares the clean
    statistics. Ref utils.py:294-306."""
    mask4 = expand_frame_mask(mask, clean_spec.shape[2])
    clean_mag = jnp.sqrt(clean_spec[:, 0] ** 2 + clean_spec[:, 1] ** 2)[:, None]
    masked_mag = jnp.sqrt(masked_spec[:, 0] ** 2 + masked_spec[:, 1] ** 2)[:, None]
    clean_norm_log, mean, std = preprocess_log_magnitude(clean_mag)
    masked_log = jnp.log(masked_mag + 1e-6)
    masked_norm_log = (masked_log - mean) / std
    if return_stats:
        return clean_norm_log, mask4, masked_norm_log, mean, std
    return clean_norm_log, mask4, masked_norm_log
