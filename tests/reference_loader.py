"""Import the reference PyTorch models from /root/reference for parity tests.

The checkout has a missing logger module and imports a few packages absent
from this image (librosa, omegaconf) at module top-level without using them in
the code paths we exercise — stub those. Skip cleanly if the reference tree
isn't mounted (e.g. in CI elsewhere).
"""
import sys
import types
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")


def load_reference():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference checkout not available")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))

    if "FullSubNet_plus.speech_enhance.utils.logger" not in sys.modules:
        logger = types.ModuleType("FullSubNet_plus.speech_enhance.utils.logger")
        logger.log = lambda *a, **k: None
        sys.modules["FullSubNet_plus.speech_enhance.utils.logger"] = logger

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.ListConfig = list
        sys.modules["omegaconf"] = om

    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")

        def _unavailable(*a, **k):
            raise RuntimeError("librosa stub: not available in tests")

        lib.load = _unavailable
        sys.modules["librosa"] = lib

    # fullsubnet (v1) uses bare `audio_zen.*` / `utils.logger` imports rooted
    # at speech_enhance/ — alias the already-importable package and stub the
    # (missing-from-checkout) logger.
    if "audio_zen" not in sys.modules:
        import importlib
        az = importlib.import_module("FullSubNet_plus.speech_enhance.audio_zen")
        sys.modules["audio_zen"] = az
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("torchaudio stub"))
        ta.transforms = types.SimpleNamespace(Resample=None)
        sys.modules["torchaudio"] = ta
    # `from utils.logger import log` (fullsubnet.py) — seed the child module
    # so the import machinery short-circuits; `utils` itself resolves to the
    # real /root/reference/utils.py once sklearn/torchaudio are importable.
    if "utils.logger" not in sys.modules:
        logger2 = types.ModuleType("utils.logger")
        logger2.log = lambda *a, **k: None
        sys.modules["utils.logger"] = logger2
