"""Transcription / phoneme plugin factories for the NPPC validator.

Reference: inpainting/validator/validator_nppc_model.py —
  Whisper "base" transcription of every PC audio variation (:540-635),
  wav2vec2 phoneme CTC decoding with `bookbot/wav2vec2-ljspeech-gruut`
  (:481-515, process_audio_for_phonemes).

The validator takes `transcribe_fn` / `phoneme_fn` callables
(eval.nppc_validator); these factories build them from HuggingFace
transformers checkpoints. On air-gapped TPU pods pass a LOCAL model
directory (pre-downloaded); hub names only work with network egress.
Both factories fail fast with a clear error instead of importing torch
weights lazily mid-validation.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["make_whisper_transcribe_fn", "make_phoneme_fn"]


def _load_processor_and_model(model_path: str, model_cls_name: str):
    try:
        import transformers
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "transformers is required for transcription plugins") from e
    processor = transformers.AutoProcessor.from_pretrained(model_path)
    model_cls = getattr(transformers, model_cls_name)
    model = model_cls.from_pretrained(model_path)
    model.eval()
    return processor, model


def make_whisper_transcribe_fn(
        model_path: str = "openai/whisper-base",
        language: Optional[str] = "en") -> Callable[[np.ndarray, int], str]:
    """(audio [T] float, sr) -> transcription string, via a Whisper
    checkpoint (ref validator_nppc_model.py:540: whisper.load_model("base"))."""
    import torch
    processor, model = _load_processor_and_model(
        model_path, "WhisperForConditionalGeneration")

    def transcribe(audio: np.ndarray, sr: int) -> str:
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from generative_audio_tpu.data.audio_io import resample
            audio = resample(audio, sr, 16000)
        inputs = processor(audio, sampling_rate=16000, return_tensors="pt")
        kwargs = {}
        if language is not None:
            kwargs["language"] = language
        with torch.no_grad():
            ids = model.generate(inputs.input_features, **kwargs)
        return processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    return transcribe


def make_phoneme_fn(
        model_path: str = "bookbot/wav2vec2-ljspeech-gruut"
        ) -> Callable[[np.ndarray, int], str]:
    """(audio [T] float, sr) -> space-separated phoneme string via a
    wav2vec2 CTC checkpoint (ref validator_nppc_model.py:481-515)."""
    import torch
    processor, model = _load_processor_and_model(
        model_path, "Wav2Vec2ForCTC")

    def phonemes(audio: np.ndarray, sr: int) -> str:
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from generative_audio_tpu.data.audio_io import resample
            audio = resample(audio, sr, 16000)
        inputs = processor(audio, sampling_rate=16000, return_tensors="pt",
                           padding=True)
        with torch.no_grad():
            logits = model(inputs.input_values).logits
        ids = torch.argmax(logits, dim=-1)
        return processor.batch_decode(ids)[0].strip()

    return phonemes
