"""STFT / iSTFT front-end, numerically matching the reference's torch.stft
conventions (center=True, reflect padding, periodic Hann window, onesided,
un-normalized) so that checkpoints and cIRM targets transplant bit-faithfully.

Reference semantics:
  FullSubNet_plus/speech_enhance/audio_zen/acoustics/feature.py:10-65 (stft/istft)
  /root/reference/utils.py:107-175 (prepare_input_from_waveform / audio_to_stft)

TPU-first design notes:
  * The analysis/synthesis transforms are expressed as dense (framed signal) x
    (DFT basis) matmuls by default — n_fft is 255..512 in every config of the
    reference, so the basis matrices are tiny and the contraction maps directly
    onto the MXU, avoiding XLA's slower generic FFT path on TPU.
  * Framing is a single static gather; overlap-add is a single scatter-add.
    Everything is static-shaped and jit/vmap/pjit friendly.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "stft_ri",
    "istft",
    "istft_ri",
    "mc_stft",
    "mag_phase",
    "stft_real_imag",
    "prepare_input_from_waveform",
    "audio_to_stft",
]

# NOTE (TPU constraint): the axon TPU backend does not implement complex
# dtypes at all. Every hot-path transform here therefore computes with real
# (real, imag) float pairs — stft_ri / istft_ri are the TPU-native API; the
# complex-valued stft / istft wrappers exist for host-side convenience and
# torch-parity tests on CPU.


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window — identical to torch.hann_window(win_length)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    """Hann window zero-padded to n_fft, centered (torch.stft convention)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        out = np.zeros(n_fft)
        out[left:left + win_length] = w
        return out
    return w


@functools.lru_cache(maxsize=16)
def _rdft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT basis: returns (cos, -sin) matrices of shape [n_fft, F]
    with F = n_fft//2 + 1, such that  X = x @ C + 1j * (x @ S)."""
    num_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(num_freqs)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang), -np.sin(ang)


@functools.lru_cache(maxsize=16)
def _irdft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real DFT basis: x = Xr @ Cr + Xi @ Ci, shapes [F, n_fft].

    Accounts for the Hermitian symmetry weights (1 for DC/Nyquist, 2 else).
    """
    num_freqs = n_fft // 2 + 1
    k = np.arange(num_freqs)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    weights = np.full((num_freqs, 1), 2.0)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    cr = weights * np.cos(ang) / n_fft
    ci = -weights * np.sin(ang) / n_fft
    return cr, ci


def _frame_indices(length: int, n_fft: int, hop_length: int) -> np.ndarray:
    n_frames = 1 + (length - n_fft) // hop_length
    return (np.arange(n_frames)[:, None] * hop_length
            + np.arange(n_fft)[None, :])


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """[..., L] -> [..., T, n_fft] framed signal, reflect-padded if center.

    When hop divides n_fft (all 50%-overlap configs) framing is a reshape +
    k slice-concats — pure dataflow the TPU executes at copy speed. The
    generic gather fallback measured ~25x slower on the axon backend."""
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, pad_widths, mode="reflect")
    length = y.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    if n_fft % hop_length == 0:
        k = n_fft // hop_length
        n_chunks = length // hop_length
        chunks = y[..., :n_chunks * hop_length].reshape(
            y.shape[:-1] + (n_chunks, hop_length))
        parts = [chunks[..., j:j + n_frames, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = _frame_indices(length, n_fft, hop_length)
    return y[..., idx]


def stft_ri(y: jnp.ndarray, n_fft: int, hop_length: int,
            win_length: Optional[int] = None, center: bool = True
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real-valued STFT core (TPU hot path): returns (real, imag) each
    [..., F, T], matching torch.stft's complex output component-wise.

    The transform is a framed-signal x DFT-basis matmul: n_fft <= 512 in all
    reference configs, so the basis is tiny and the contraction runs on the
    MXU — no complex dtype anywhere.
    """
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(_padded_window(win_length, n_fft), dtype=y.dtype)
    frames = frame_signal(y, n_fft, hop_length, center=center) * window
    cos_b, msin_b = _rdft_basis(n_fft)
    cos_b = jnp.asarray(cos_b, dtype=frames.dtype)
    msin_b = jnp.asarray(msin_b, dtype=frames.dtype)
    real = jnp.matmul(frames, cos_b, preferred_element_type=jnp.float32)
    imag = jnp.matmul(frames, msin_b, preferred_element_type=jnp.float32)
    return jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)


def stft(y: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, center: bool = True,
         method: str = "matmul") -> jnp.ndarray:
    """STFT matching torch.stft(..., window=hann(win_length), center=True,
    return_complex=True). Complex output — host/CPU convenience wrapper.

    Args:
        y: [..., L] real waveform (any leading batch dims).
    Returns:
        [..., F, T] complex64, F = n_fft//2 + 1.
    """
    if method == "matmul":
        real, imag = stft_ri(y, n_fft, hop_length, win_length, center)
        return jax.lax.complex(real, imag).astype(jnp.complex64)
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(_padded_window(win_length, n_fft), dtype=y.dtype)
    frames = frame_signal(y, n_fft, hop_length, center=center) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


def _overlap_add(frames: jnp.ndarray, hop_length: int, out_length: int
                 ) -> jnp.ndarray:
    """[..., T, n_fft] -> [..., out_length] overlap-add.

    When hop divides n_fft this is k shifted pad+adds of hop-sized chunk
    grids (no scatter); otherwise a scatter-add fallback."""
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    batch_shape = frames.shape[:-2]
    if n_fft % hop_length == 0:
        k = n_fft // hop_length
        total_chunks = n_frames + k - 1
        out = jnp.zeros(batch_shape + (total_chunks, hop_length),
                        frames.dtype)
        pad_spec = [(0, 0)] * len(batch_shape)
        for d in range(k):
            part = frames[..., :, d * hop_length:(d + 1) * hop_length]
            out = out + jnp.pad(
                part, pad_spec + [(d, total_chunks - n_frames - d), (0, 0)])
        return out.reshape(batch_shape + (total_chunks * hop_length,)
                           )[..., :out_length]
    idx = jnp.asarray(_frame_indices((n_frames - 1) * hop_length + n_fft,
                                     n_fft, hop_length))
    flat_idx = idx.reshape(-1)
    flat = frames.reshape(batch_shape + (n_frames * n_fft,))

    def oa_1d(fr):
        return jnp.zeros(out_length, fr.dtype).at[flat_idx].add(fr)

    for _ in batch_shape:
        oa_1d = jax.vmap(oa_1d)
    return oa_1d(flat)


def istft_ri(spec_real: jnp.ndarray, spec_imag: jnp.ndarray, n_fft: int,
             hop_length: int, win_length: Optional[int] = None,
             length: Optional[int] = None, center: bool = True) -> jnp.ndarray:
    """Real-valued inverse STFT core (TPU hot path), matching torch.istft.

    Args:
        spec_real, spec_imag: [..., F, T] real components.
    Returns:
        [..., L] real waveform.
    """
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(_padded_window(win_length, n_fft), dtype=jnp.float32)

    xr = jnp.swapaxes(spec_real, -1, -2)  # [..., T, F]
    xi = jnp.swapaxes(spec_imag, -1, -2)
    cr, ci = _irdft_basis(n_fft)
    cr = jnp.asarray(cr, dtype=jnp.float32)
    ci = jnp.asarray(ci, dtype=jnp.float32)
    frames = (jnp.matmul(xr, cr, preferred_element_type=jnp.float32)
              + jnp.matmul(xi, ci, preferred_element_type=jnp.float32))

    n_frames = frames.shape[-2]
    expected = (n_frames - 1) * hop_length + n_fft
    y = _overlap_add(frames * window, hop_length, expected)
    env = _overlap_add(
        jnp.broadcast_to(window ** 2, (n_frames, n_fft)), hop_length, expected)
    y = y / jnp.where(env > 1e-11, env, 1.0)

    # torch.istft crops the center padding from the start, then (when `length`
    # is given) takes `length` samples from there — the end padding region is
    # used to serve a requested tail, and zeros fill anything beyond it.
    pad = n_fft // 2 if center else 0
    y = y[..., pad:]
    if length is not None:
        if length <= y.shape[-1]:
            y = y[..., :length]
        else:
            pad_widths = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pad_widths)
    elif center:
        y = y[..., :expected - 2 * pad]
    return y


def istft(spec: jnp.ndarray, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, length: Optional[int] = None,
          center: bool = True, method: str = "matmul") -> jnp.ndarray:
    """Inverse STFT over a complex [..., F, T] spec — host/CPU convenience
    wrapper around istft_ri. `method` is accepted for API symmetry."""
    del method
    return istft_ri(spec.real, spec.imag, n_fft, hop_length, win_length,
                    length=length, center=center)


def mc_stft(y_s: jnp.ndarray, n_fft: int, hop_length: int,
            win_length: Optional[int] = None) -> jnp.ndarray:
    """Multi-channel STFT: [B, C, L] -> [B, C, F, T] complex.
    Reference: feature.py:68-91."""
    assert y_s.ndim == 3
    b, c, L = y_s.shape
    spec = stft(y_s.reshape(b * c, L), n_fft, hop_length, win_length)
    return spec.reshape(b, c, spec.shape[-2], spec.shape[-1])


def mag_phase(complex_spec: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference: feature.py:94-95."""
    return jnp.abs(complex_spec), jnp.angle(complex_spec)


def stft_real_imag(waveform: jnp.ndarray, n_fft: int, hop_length: int,
                   win_length: Optional[int] = None) -> jnp.ndarray:
    """Waveform -> stacked [B, 2, F, T] (real, imag).
    Reference: /root/reference/utils.py:151-176 (audio_to_stft)."""
    if waveform.ndim == 1:
        waveform = waveform[None]
    real, imag = stft_ri(waveform, n_fft, hop_length, win_length)
    return jnp.stack([real, imag], axis=1)


audio_to_stft = stft_real_imag


def prepare_input_from_waveform(waveform: jnp.ndarray, n_fft: int,
                                hop_length: int,
                                win_length: Optional[int] = None
                                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Waveform -> (mag, real, imag), each [B, 1, F, T].
    Reference: /root/reference/utils.py:107-148."""
    if waveform.ndim == 1:
        waveform = waveform[None]
    real, imag = stft_ri(waveform, n_fft, hop_length, win_length)
    mag = jnp.sqrt(real ** 2 + imag ** 2)
    return mag[:, None], real[:, None], imag[:, None]
