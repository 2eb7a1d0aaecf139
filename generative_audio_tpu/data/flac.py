"""FLAC decode hook.

LibriSpeech ships FLAC; this image has no soundfile/librosa wheels. Decoding
dispatches to the first-party native C++ decoder (native/audio_native.cpp,
gat_decode_flac — STREAMINFO + constant/verbatim/fixed/LPC subframes, Rice
residuals, stereo decorrelation), lazily built on first use via
data.native.build(). soundfile is used instead when installed (see
audio_io._load_flac, which tries it first).
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def decode(path) -> Tuple[np.ndarray, int]:
    """FLAC file -> (float32 mono samples, sample_rate)."""
    from generative_audio_tpu.data import native
    if not native.available():
        raise RuntimeError(
            f"Cannot decode FLAC file {path}: no soundfile wheel and the "
            f"native decoder could not be built (needs g++). Convert the "
            f"corpus to WAV or install soundfile.")
    return native.decode_flac(Path(path).read_bytes())
