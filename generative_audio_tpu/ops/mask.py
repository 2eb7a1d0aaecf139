"""Ideal-ratio-mask (IRM / cIRM) math with the reference's exact compression
saturation semantics so trained masks round-trip bit-faithfully.

Reference: FullSubNet_plus/speech_enhance/audio_zen/acoustics/mask.py:7-69
and /root/reference/utils.py:75-79 (noisy_to_enhanced), :241-256.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

EPSILON = 1e-8  # audio_zen/constant.py

__all__ = [
    "build_ideal_ratio_mask",
    "build_complex_ideal_ratio_mask",
    "build_complex_ideal_ratio_mask_ri",
    "compress_cIRM",
    "decompress_cIRM",
    "complex_mul",
    "apply_crm",
    "crm_to_stft_components",
    "crm_to_spectrogram",
]


def build_ideal_ratio_mask(noisy_mag: jnp.ndarray,
                           clean_mag: jnp.ndarray) -> jnp.ndarray:
    """[B, F, T] mags -> compressed IRM [B, F, T, 1]. Ref mask.py:7-22."""
    ratio_mask = clean_mag / (noisy_mag + EPSILON)
    return compress_cIRM(ratio_mask[..., None], K=10.0, C=0.1)


def build_complex_ideal_ratio_mask_ri(noisy_real: jnp.ndarray,
                                      noisy_imag: jnp.ndarray,
                                      clean_real: jnp.ndarray,
                                      clean_imag: jnp.ndarray) -> jnp.ndarray:
    """Real-pair cIRM builder (TPU hot path — the axon TPU backend has no
    complex dtype support): [B, F, T] components -> compressed [B, F, T, 2].
    Ref mask.py:24-41."""
    denominator = jnp.square(noisy_real) + jnp.square(noisy_imag) + EPSILON
    mask_real = (noisy_real * clean_real + noisy_imag * clean_imag) / denominator
    mask_imag = (noisy_real * clean_imag - noisy_imag * clean_real) / denominator
    crm = jnp.stack((mask_real, mask_imag), axis=-1)
    return compress_cIRM(crm, K=10.0, C=0.1)


def build_complex_ideal_ratio_mask(noisy: jnp.ndarray,
                                   clean: jnp.ndarray) -> jnp.ndarray:
    """Complex [B, F, T] specs -> compressed cIRM [B, F, T, 2]. Ref mask.py:24-41."""
    return build_complex_ideal_ratio_mask_ri(noisy.real, noisy.imag,
                                             clean.real, clean.imag)


def compress_cIRM(mask: jnp.ndarray, K: float = 10.0,
                  C: float = 0.1) -> jnp.ndarray:
    """Compress (-inf, inf) -> (-K, K) with the reference's -100 clamp.
    Ref mask.py:44-54."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return K * (1.0 - jnp.exp(-C * mask)) / (1.0 + jnp.exp(-C * mask))


def decompress_cIRM(mask: jnp.ndarray, K: float = 10.0,
                    limit: float = 9.9) -> jnp.ndarray:
    """Inverse of compress_cIRM with +/-limit saturation. Ref mask.py:57-60."""
    mask = jnp.clip(mask, -limit, limit)
    return -K * jnp.log((K - mask) / (K + mask))


def complex_mul(noisy_r, noisy_i, mask_r, mask_i):
    """Complex multiply of spectrogram by mask. Ref mask.py:63-66."""
    r = noisy_r * mask_r - noisy_i * mask_i
    i = noisy_r * mask_i + noisy_i * mask_r
    return r, i


def apply_crm(crm: jnp.ndarray, noisy_real: jnp.ndarray,
              noisy_imag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a (decompressed) cRM [..., F, T, 2] to noisy STFT components.
    Ref /root/reference/utils.py:75-79 (noisy_to_enhanced)."""
    enhanced_real = crm[..., 0] * noisy_real - crm[..., 1] * noisy_imag
    enhanced_imag = crm[..., 1] * noisy_real + crm[..., 0] * noisy_imag
    return enhanced_real, enhanced_imag


def crm_to_stft_components(crm: jnp.ndarray, noisy_real: jnp.ndarray,
                           noisy_imag: jnp.ndarray):
    """Returns (mag, real, imag) of the enhanced spectrogram.
    Ref /root/reference/utils.py:241-250."""
    enhanced_real, enhanced_imag = apply_crm(crm, noisy_real, noisy_imag)
    enhanced_mag = jnp.sqrt(enhanced_real ** 2 + enhanced_imag ** 2)
    return enhanced_mag, enhanced_real, enhanced_imag


def crm_to_spectrogram(crm: jnp.ndarray, noisy_complex: jnp.ndarray
                       ) -> jnp.ndarray:
    """cRM [..., F, T, 2] x complex noisy spec -> complex enhanced spec.
    Ref /root/reference/utils.py:252-256."""
    real, imag = apply_crm(crm, noisy_complex.real, noisy_complex.imag)
    return real + 1j * imag
