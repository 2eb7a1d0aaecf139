"""Conv-kernel STFT/iSTFT (streaming-friendly, sqrt-hann, no centering).

Reference: audio_zen/acoustics/feature.py — init_stft_kernel :288 (rfft of a
scaled identity windowed by sqrt-hann; scale S = 0.5*sqrt(N*N/hop)),
CustomSTFT :353 (conv1d stride=hop, no padding -> (mag, phase, real, imag)),
CustomISTFT :384 (conv_transpose1d with the same kernel). The reference's
torch.rfft call is removed from modern torch — the kernel here is built
directly from the DFT definition it computed.

TPU design: instead of a [2F, 1, L] conv (which XLA would rewrite anyway),
frames are gathered once and hit the MXU as a single [B*T', L] x [L, 2F]
matmul — the optimal layout for this op on TPU. The iSTFT overlap-add is a
scatter-add over frame offsets.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["conv_stft_kernel", "conv_stft", "conv_istft"]


@functools.lru_cache(maxsize=8)
def conv_stft_kernel(frame_len: int, frame_hop: int,
                     num_fft: Optional[int] = None) -> np.ndarray:
    """[L, 2F] analysis kernel (transposed vs the reference's [2F, 1, L] —
    ready for the frames @ kernel matmul). Matches init_stft_kernel
    numerically: row k of the torch kernel is w[k] * Re/-Im(exp(-2pi i k f/N))
    / S with S = 0.5*sqrt(N^2/hop)."""
    n = num_fft or 2 ** int(np.ceil(np.log2(frame_len)))
    f = n // 2 + 1
    window = np.sqrt(np.hanning(frame_len + 1)[:-1].astype(np.float64))
    # torch.hann_window(L) == hanning(L+1)[:-1] (periodic)
    scale = 0.5 * (n * n / frame_hop) ** 0.5
    k = np.arange(frame_len)[:, None]          # time index within frame
    fr = np.arange(f)[None, :]                 # frequency bin
    ang = 2.0 * np.pi * k * fr / n
    real_k = np.cos(ang) / scale * window[:, None]
    imag_k = -np.sin(ang) / scale * window[:, None]
    return np.concatenate([real_k, imag_k], axis=1).astype(np.float32)


def conv_stft(x: jnp.ndarray, frame_len: int, frame_hop: int,
              num_fft: Optional[int] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CustomSTFT forward: [B, S] (or [S]) -> (mag, phase, real, imag),
    each [B, F, T]. No padding/centering (ref :353-382)."""
    if x.ndim == 1:
        x = x[None]
    kernel = jnp.asarray(conv_stft_kernel(frame_len, frame_hop, num_fft))
    n_frames = (x.shape[-1] - frame_len) // frame_hop + 1
    idx = (np.arange(n_frames)[:, None] * frame_hop
           + np.arange(frame_len)[None, :])
    frames = x[:, idx]                                   # [B, T, L]
    spec = jnp.einsum("btl,lf->btf", frames, kernel)     # [B, T, 2F]
    spec = jnp.swapaxes(spec, 1, 2)                      # [B, 2F, T]
    real, imag = jnp.split(spec, 2, axis=1)
    mag = jnp.sqrt(real ** 2 + imag ** 2)
    phase = jnp.arctan2(imag, real)
    return mag, phase, real, imag


def conv_istft(mag: jnp.ndarray, phase: jnp.ndarray, frame_len: int,
               frame_hop: int, num_fft: Optional[int] = None) -> jnp.ndarray:
    """CustomISTFT forward: (mag, phase) [B, F, T] -> [B, S] waveform via
    transposed-conv overlap-add (ref :384-412)."""
    if mag.ndim == 2:
        mag, phase = mag[None], phase[None]
    kernel = jnp.asarray(conv_stft_kernel(frame_len, frame_hop, num_fft))
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    spec = jnp.concatenate([real, imag], axis=1)         # [B, 2F, T]
    frames = jnp.einsum("bft,lf->btl", spec, kernel)     # [B, T, L]
    b, n_frames, _ = frames.shape
    out_len = (n_frames - 1) * frame_hop + frame_len
    idx = (np.arange(n_frames)[:, None] * frame_hop
           + np.arange(frame_len)[None, :]).reshape(-1)
    out = jnp.zeros((b, out_len), frames.dtype)
    return out.at[:, idx].add(frames.reshape(b, -1))
