"""Beamforming ops: cRF filtering, PSD matrices, beamforming-vector apply.

Reference: audio_zen/acoustics/beamforming.py:1-39 (torch_complex einsums).

TPU design: the axon TPU backend has no complex dtype, so every op takes and
returns (real, imag) pairs; each complex einsum expands to the standard
4-real-einsum form, which XLA fuses into batched MXU contractions. Complex
convenience wrappers (np/CPU use) are provided alongside.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "apply_crf_filter_ri", "get_power_spectral_density_matrix_ri",
    "apply_beamforming_vector_ri",
    "apply_crf_filter", "get_power_spectral_density_matrix",
    "apply_beamforming_vector",
]

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _conj_einsum(pattern: str, ar, ai, br, bi) -> Pair:
    """einsum(pattern, conj(a), b) on (real, imag) pairs."""
    rr = jnp.einsum(pattern, ar, br)
    ii = jnp.einsum(pattern, ai, bi)
    ri = jnp.einsum(pattern, ar, bi)
    ir = jnp.einsum(pattern, ai, br)
    return rr + ii, ri - ir


def apply_crf_filter_ri(crf: Pair, mix: Pair) -> Pair:
    """conj(cRF) x mix: [B,F,T,D] x [B,C,F,D,T] -> [B,C,F,T] (ref :5-18)."""
    return _conj_einsum("bftd,bcfdt->bcft", crf[0], crf[1], mix[0], mix[1])


def get_power_spectral_density_matrix_ri(spec: Pair) -> Pair:
    """psd[..., t, c, e] = spec[..., c, t] * conj(spec[..., e, t])
    for [..., F, C, T] -> [..., F, T, C, C] (ref :21-33)."""
    sr, si = spec
    # einsum(..., a, conj(b)): conj on the SECOND operand.
    rr = jnp.einsum("...ct,...et->...tce", sr, sr)
    ii = jnp.einsum("...ct,...et->...tce", si, si)
    ir = jnp.einsum("...ct,...et->...tce", si, sr)
    ri = jnp.einsum("...ct,...et->...tce", sr, si)
    return rr + ii, ir - ri


def apply_beamforming_vector_ri(bf: Pair, mix: Pair) -> Pair:
    """conj(w)^H x: [B,F,T,C] x [B,F,C,T] -> [B,F,T] (ref :36-39)."""
    return _conj_einsum("bftc,bfct->bft", bf[0], bf[1], mix[0], mix[1])


# ---------------------------------------------------------------------------
# Complex-dtype wrappers (CPU / numpy convenience)
# ---------------------------------------------------------------------------
def apply_crf_filter(crf, mix):
    r, i = apply_crf_filter_ri((crf.real, crf.imag), (mix.real, mix.imag))
    return r + 1j * i


def get_power_spectral_density_matrix(spec):
    r, i = get_power_spectral_density_matrix_ri((spec.real, spec.imag))
    return r + 1j * i


def apply_beamforming_vector(bf, mix):
    r, i = apply_beamforming_vector_ri((bf.real, bf.imag),
                                       (mix.real, mix.imag))
    return r + 1j * i
