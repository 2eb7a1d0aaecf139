"""Golden tests: STFT/iSTFT vs torch.stft/torch.istft, both config regimes
(enhancement 512/256/512 and inpainting 255/128/255)."""
import numpy as np
import pytest
import torch

import importlib
S = importlib.import_module('generative_audio_tpu.ops.stft')


REGIMES = [(512, 256, 512), (255, 128, 255)]


def _torch_stft(y, n_fft, hop, win):
    return torch.stft(torch.from_numpy(y), n_fft, hop, win,
                      window=torch.hann_window(win), center=True,
                      return_complex=True).numpy()


@pytest.mark.parametrize("n_fft,hop,win", REGIMES)
@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_stft_matches_torch(rng, n_fft, hop, win, method):
    y = rng.standard_normal((3, 16000)).astype(np.float32)
    ours = np.asarray(S.stft(y, n_fft, hop, win, method=method))
    ref = _torch_stft(y, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop,win", REGIMES)
def test_istft_matches_torch(rng, n_fft, hop, win):
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    spec = _torch_stft(y, n_fft, hop, win)
    ref = torch.istft(torch.from_numpy(spec), n_fft, hop, win,
                      window=torch.hann_window(win), center=True,
                      length=16000).numpy()
    ours = np.asarray(S.istft(spec, n_fft, hop, win, length=16000))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("n_fft,hop,win", REGIMES)
def test_roundtrip_reconstruction(rng, n_fft, hop, win):
    # Use a hop-aligned length so STFT frames fully cover the signal
    # (like torch, the last partial-hop tail is not reconstructible).
    length = hop * 64
    y = rng.standard_normal((1, length)).astype(np.float32)
    spec = S.stft(y, n_fft, hop, win)
    back = np.asarray(S.istft(spec, n_fft, hop, win, length=length))
    np.testing.assert_allclose(back, y, atol=1e-3)


def test_prepare_input_shapes(rng):
    y = rng.standard_normal((2, 16384)).astype(np.float32)
    mag, real, imag = S.prepare_input_from_waveform(y, 512, 256, 512)
    assert mag.shape == real.shape == imag.shape
    assert mag.shape[:3] == (2, 1, 257)
    np.testing.assert_allclose(
        np.asarray(mag), np.sqrt(np.asarray(real) ** 2 + np.asarray(imag) ** 2),
        rtol=1e-5, atol=1e-5)


def test_audio_to_stft_stacks_real_imag(rng):
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    out = np.asarray(S.audio_to_stft(y, 255, 128, 255))
    assert out.shape[1] == 2 and out.shape[2] == 128
    ref = _torch_stft(y, 255, 128, 255)
    np.testing.assert_allclose(out[:, 0], ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(out[:, 1], ref.imag, atol=2e-3, rtol=1e-4)


def test_mc_stft(rng):
    y = rng.standard_normal((2, 3, 8000)).astype(np.float32)
    out = np.asarray(S.mc_stft(y, 512, 256, 512))
    assert out.shape[:3] == (2, 3, 257)
