"""Audio file I/O for the host-side data pipelines.

The reference leans on torchaudio/librosa/soundfile native wheels
(SURVEY.md §2.7); none are present in this image, so WAV parsing is
implemented directly (PCM16/24/32 + float32) with scipy's polyphase
resampler. FLAC decode is delegated to the optional native helper library
(native/, see data/flac.py) or soundfile when available.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

__all__ = ["read_wav", "write_wav", "to_mono", "resample", "load_audio"]


def read_wav(path) -> Tuple[int, np.ndarray]:
    """Read a WAV file -> (sample_rate, float32 array [T] or [T, C])."""
    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return sr, data


def write_wav(path, data: np.ndarray, sr: int, subtype: str = "PCM_16"):
    """Write float32 audio to WAV (int16 by default, like the reference's
    soundfile writes in base_inferencer.py:151)."""
    data = np.asarray(data)
    if subtype == "PCM_16":
        clipped = np.clip(data, -1.0, 1.0)
        wavfile.write(str(path), sr, (clipped * 32767.0).astype(np.int16))
    else:
        wavfile.write(str(path), sr, data.astype(np.float32))


def to_mono(data: np.ndarray) -> np.ndarray:
    """[T] or [T, C] / [C, T] -> [T] by channel mean."""
    if data.ndim == 1:
        return data
    # wavfile gives [T, C]; torch-style gives [C, T] — take the small axis.
    axis = 1 if data.shape[1] < data.shape[0] else 0
    return data.mean(axis=axis)


def resample(data: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return data
    g = np.gcd(orig_sr, target_sr)
    return resample_poly(data, target_sr // g, orig_sr // g).astype(np.float32)


def _native_if_built():
    """The C++ fast path (data.native), used only when its library is
    already compiled — no surprise g++ runs inside data loading. Set
    GAT_NATIVE_AUDIO=1 to force a build on first use."""
    import os
    from generative_audio_tpu.data import native as _native
    if _native._lib is not None:
        return _native
    force = os.environ.get("GAT_NATIVE_AUDIO") == "1"
    if force or _native._LIB.exists():
        return _native if _native.available() else None
    return None


def load_audio(path, sr: Optional[int] = 16000) -> np.ndarray:
    """Load any supported file as mono float32 at the requested rate.
    Mirrors load_wav (feature.py:116-120) + the datasets' mono/resample steps.
    Uses the native C++ decoder/resampler when its library is built."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        native = _native_if_built()
        if native is not None:
            try:
                data, file_sr = native.decode_wav(path.read_bytes())
                if sr is not None and file_sr != sr:
                    data = native.resample(data, file_sr, sr)
                return data
            except ValueError:
                pass  # fall through to the numpy reference decoder
        file_sr, data = read_wav(path)
    elif suffix == ".flac":
        data, file_sr = _load_flac(path)
    else:
        raise ValueError(f"Unsupported audio format: {path}")
    data = to_mono(data).astype(np.float32)
    if sr is not None and file_sr != sr:
        data = resample(data, file_sr, sr)
    return data


def _load_flac(path):
    try:
        import soundfile as sf
        data, file_sr = sf.read(str(path), dtype="float32")
        return data, file_sr
    except ImportError:
        pass
    from generative_audio_tpu.data import flac
    return flac.decode(path)
