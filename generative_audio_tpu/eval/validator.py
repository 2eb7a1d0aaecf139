"""Pretrained-model batch evaluation — the reference's recorded-baseline
pipeline.

Reference: use_pre_trained_model/model_validator/model_validator.py:26-189
(enhance_audio: stft -> FullSubNet+ -> decompress cIRM -> complex mul ->
istft; calculate_metrics: WB/NB PESQ, STOI, SI-SDR; validate_dataloader ->
mean dict -> validation_results.json) — the source of BASELINE.md numbers.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.eval import metrics as M
from generative_audio_tpu.ops.stft import stft_ri, istft_ri
from generative_audio_tpu.ops.mask import decompress_cIRM, apply_crm

__all__ = ["ModelValidator"]


class ModelValidator:
    """Evaluates an enhancement model over (noisy, clean) pairs."""

    def __init__(self, model_apply: Callable, variables,
                 n_fft: int = 512, hop_length: int = 256,
                 win_length: int = 512, sr: int = 16000,
                 metric_names=("WB_PESQ", "NB_PESQ", "STOI", "SI_SDR")):
        self.apply = model_apply
        self.variables = variables
        self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
        self.sr = sr
        self.metric_names = list(metric_names)
        self._enhance_jit = {}

    def _enhance_ref(self, noisy: np.ndarray):
        """Dispatch the enhancement; returns the (async) device array."""
        length = noisy.shape[-1]
        if length not in self._enhance_jit:
            def fn(variables, wav):
                real, imag = stft_ri(wav, self.n_fft, self.hop, self.win)
                mag = jnp.sqrt(real ** 2 + imag ** 2)
                crm = self.apply(variables, mag[:, None], real[:, None],
                                 imag[:, None])
                crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
                er, ei = apply_crm(crm, real, imag)
                return istft_ri(er, ei, self.n_fft, self.hop, self.win,
                                length=wav.shape[-1])
            self._enhance_jit[length] = jax.jit(fn)
        return self._enhance_jit[length](self.variables, noisy[None])

    def enhance_audio(self, noisy: np.ndarray) -> np.ndarray:
        """Ref model_validator.py:84-133."""
        return np.asarray(self._enhance_ref(noisy))[0]

    def calculate_metrics(self, clean: np.ndarray, enhanced: np.ndarray
                          ) -> Dict[str, Optional[float]]:
        """Ref model_validator.py:37-82; unavailable metrics (MOSNET
        without its wheel) and unscoreable clips (PESQ on silent/too-short
        audio) record None instead of crashing a validation run."""
        from generative_audio_tpu.eval.pesq import PesqError
        out: Dict[str, Optional[float]] = {}
        for name in self.metric_names:
            fn = M.REGISTERED_METRICS[name]
            try:
                out[name] = float(fn(clean, enhanced, self.sr))
            except (M.MetricUnavailable, PesqError):
                out[name] = None
        return out

    def validate_dataset(self, dataset, output_path: Optional[str] = None,
                         max_items: Optional[int] = None,
                         log=print) -> Dict[str, Optional[float]]:
        """Ref model_validator.py:135-176 -> mean metrics + JSON.

        Depth-2 pipeline: item i+1's enhancement is dispatched (jax is
        async) before item i's host-side metrics run, so the chip computes
        while the CPU scores — the host STOI/SI-SDR pass is the slow half
        of this loop."""
        from collections import deque

        per_item: List[Dict[str, Optional[float]]] = []
        n = len(dataset) if max_items is None else min(max_items, len(dataset))
        inflight: deque = deque()    # (index, clean, out_ref)

        def _drain():
            i, clean, ref = inflight.popleft()
            enhanced = np.asarray(ref)[0]
            scores = self.calculate_metrics(clean, enhanced)
            per_item.append(scores)
            log(f"[{i + 1}/{n}] " + " ".join(
                f"{k}={v:.4f}" if v is not None else f"{k}=n/a"
                for k, v in scores.items()))

        for i in range(n):
            item = dataset[i]
            noisy, clean = np.asarray(item[0]), np.asarray(item[1])
            inflight.append((i, clean, self._enhance_ref(noisy)))
            while len(inflight) >= 2:
                _drain()
        while inflight:
            _drain()

        means: Dict[str, Optional[float]] = {}
        for name in self.metric_names:
            vals = [s[name] for s in per_item if s[name] is not None]
            means[name] = float(np.mean(vals)) if vals else None
        if output_path:
            Path(output_path).parent.mkdir(parents=True, exist_ok=True)
            with open(output_path, "w") as f:
                json.dump(means, f, indent=4)
        return means
