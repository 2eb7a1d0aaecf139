"""FLAC decode hook.

LibriSpeech ships FLAC; this image has no soundfile/librosa wheels. A native
decoder lives in native/ (built on demand); until it is built, decoding
raises with a clear message so datasets can be pointed at WAV corpora.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        try:
            from generative_audio_tpu.data import _native_audio
            _NATIVE = _native_audio
        except Exception:
            _NATIVE = False
    return _NATIVE


def decode(path) -> Tuple[np.ndarray, int]:
    native = _native()
    if native:
        return native.decode_flac(str(path))
    raise RuntimeError(
        f"Cannot decode FLAC file {path}: no soundfile wheel and the native "
        f"decoder is not built. Run `make -C native` or convert the corpus "
        f"to WAV.")
