"""Enhancement inferencer with the reference's inference-mode dispatch and
RTF measurement.

Reference: audio_zen/inferencer/base_inferencer.py:21-159 (config-driven
dispatch, int16 0.8-peak normalization, RTF logging) and
fullsubnet_plus/inferencer/inferencer.py:52-261 (the 8 modes: mag,
scaled_mask, sub_band_crm_mask, full_band_crm_mask,
mag_complex_full_band_crm_mask [default], complex_full_band_crm_mask,
overlapped_chunk, time_domain).

TPU design: each mode compiles to ONE jit program per input length; inputs
are bucketed-and-padded to `length_bucket` multiples so arbitrary-length
clips reuse a handful of compiled programs instead of recompiling
(SURVEY.md §7 'dynamic shapes' hard-part).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.ops.stft import stft_ri, istft_ri, hann_window
from generative_audio_tpu.ops.mask import decompress_cIRM, apply_crm
from generative_audio_tpu.ops.subband import band_unfold
from generative_audio_tpu.data.audio_io import write_wav

__all__ = ["InferencerConfig", "Inferencer"]


@dataclasses.dataclass
class InferencerConfig:
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    sr: int = 16000
    inference_type: str = "mag_complex_full_band_crm_mask"
    length_bucket: int = 16000        # pad clips up to multiples of this
    chunk_length_seconds: int = 4     # for overlapped_chunk
    n_neighbor: int = 15              # for sub_band_crm_mask
    # overlapped_chunk per-chunk model kind: "waveform" (wav -> wav apply),
    # "spectral" (FullSubNet-style (mag, real, imag) -> cRM apply, wrapped
    # into the default cRM pipeline per chunk), or "auto" (decide from the
    # apply-fn's signature arity; *args wrappers are disambiguated by an
    # abstract jax.eval_shape probe of both conventions — no device compute,
    # and an error, never a guess, when the probe is inconclusive).
    chunk_model: str = "auto"


class Inferencer:
    """Wraps a flax model apply-fn `(variables, *inputs) -> output`."""

    def __init__(self, model_apply: Callable, variables,
                 config: InferencerConfig = InferencerConfig()):
        self.apply = model_apply
        self.variables = variables
        self.config = config
        self.last_rtf: Optional[float] = None
        self._compiled: Dict = {}

    # ---------------------------------------------------------- helpers ----
    def _stft(self, wav):
        c = self.config
        return stft_ri(wav, c.n_fft, c.hop_length, c.win_length)

    def _istft(self, real, imag, length):
        c = self.config
        return istft_ri(real, imag, c.n_fft, c.hop_length, c.win_length,
                        length=length)

    def _chunk_model_is_waveform(self) -> bool:
        """Resolve the overlapped_chunk model kind (config.chunk_model).
        The 'auto' answer is cached: it is invariant per Inferencer, and
        for *args applies each evaluation costs two abstract traces of the
        full model."""
        mode = self.config.chunk_model
        if mode == "waveform":
            return True
        if mode == "spectral":
            return False
        if mode != "auto":
            raise ValueError(f"chunk_model must be waveform/spectral/auto, "
                             f"got {mode!r}")
        cached = getattr(self, "_chunk_model_waveform_cache", None)
        if cached is not None:
            return cached
        result = self._probe_chunk_model()
        self._chunk_model_waveform_cache = result
        return result

    def _probe_chunk_model(self) -> bool:
        import inspect
        try:
            params = list(inspect.signature(self.apply).parameters.values())
        except (TypeError, ValueError):
            params = None
        if params is not None and not any(p.kind is p.VAR_POSITIONAL
                                          for p in params):
            pos = [p for p in params
                   if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
            # Defaulted params are OPTIONAL: (variables, wav, train=False)
            # is a perfectly good waveform model. A convention is callable
            # iff n_required <= arity <= n_max.
            n_required = sum(p.default is p.empty for p in pos)
            n_max = len(pos)
            wav_callable = n_required <= 2 <= n_max      # (variables, wav)
            spec_callable = n_required <= 4 <= n_max     # (v, mag, real, imag)
            if wav_callable != spec_callable:
                return wav_callable
            # Both callable (e.g. (v, wav, sr=None, pad=None)) or neither:
            # arity cannot decide — fall through to the shape probe.
        # *args wrappers (e.g. cli/inference.py's `lambda v, *inputs`) hide
        # the arity. Probe both calling conventions ABSTRACTLY with
        # jax.eval_shape — no device compute, and unlike the old
        # call-and-catch-TypeError fallback it cannot silently run the
        # wrong pipeline: a convention only wins if exactly one traces.
        c = self.config
        f = c.n_fft // 2 + 1
        wav = jax.ShapeDtypeStruct((1, 4 * c.n_fft), jnp.float32)
        spec = jax.ShapeDtypeStruct((1, 1, f, 16), jnp.float32)

        def _probe(*args):
            try:
                jax.eval_shape(self.apply, self.variables, *args)
                return True, None
            except Exception as e:      # noqa: BLE001 — reported below
                return False, e

        wav_ok, wav_err = _probe(wav)
        spec_ok, spec_err = _probe(spec, spec, spec)
        if wav_ok != spec_ok:
            return wav_ok
        if wav_ok:                      # both trace: genuinely ambiguous
            raise ValueError(
                "chunk_model='auto': the apply fn traces under BOTH the "
                "waveform (variables, wav) and spectral (variables, mag, "
                "real, imag) conventions; set InferencerConfig.chunk_model "
                "to 'waveform' or 'spectral' explicitly")
        raise ValueError(
            "chunk_model='auto': the apply fn traces under NEITHER the "
            "waveform nor the spectral convention. waveform probe error: "
            f"{wav_err!r}; spectral probe error: {spec_err!r}")

    def _pad_bucket(self, noisy: np.ndarray):
        bucket = self.config.length_bucket
        orig = noisy.shape[-1]
        padded = ((orig + bucket - 1) // bucket) * bucket
        return np.pad(noisy, (0, padded - orig)), orig

    def _run_jitted(self, mode: str, fn, noisy: np.ndarray) -> np.ndarray:
        padded, orig = self._pad_bucket(noisy)
        key = (mode, padded.shape[-1])
        if key not in self._compiled:
            # warm outside the timed window (like the batched enhance_dir
            # path): the first call pays XLA compile — minutes over the
            # tunnel — which would inflate last_rtf by orders of magnitude.
            # The reference times only the model call (inferencer.py:149-163).
            self._compiled[key] = jax.jit(fn)
            np.asarray(self._compiled[key](self.variables, padded[None]))
        t1 = time.time()
        out = np.asarray(self._compiled[key](self.variables, padded[None]))
        t2 = time.time()
        self.last_rtf = (t2 - t1) / (orig / self.config.sr)
        return out[0, :orig]

    # ------------------------------------------------------------ modes ----
    def mag(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Magnitude-only model; reconstruct with noisy phase (ref :57-67)."""
        length = self._pad_bucket(noisy)[0].shape[-1]

        def fn(variables, wav):
            real, imag = self._stft(wav)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            phase = jnp.arctan2(imag, real)
            enhanced_mag = self.apply(variables, mag[:, None])[:, 0]
            return self._istft(enhanced_mag * jnp.cos(phase),
                               enhanced_mag * jnp.sin(phase), length)

        return self._run_jitted("mag", fn, noisy)

    def scaled_mask(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Real scaling mask on the complex spec (ref :69-83)."""
        length = self._pad_bucket(noisy)[0].shape[-1]

        def fn(variables, wav):
            real, imag = self._stft(wav)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            mask = self.apply(variables, mag[:, None])      # [B, 2, F, T]
            mask = jnp.transpose(mask, (0, 2, 3, 1))
            er = real * mask[..., 0]
            ei = imag * mask[..., 1]
            return self._istft(er, ei, length)

        return self._run_jitted("scaled_mask", fn, noisy)

    def sub_band_crm_mask(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Per-frequency unfolded sub-band inference (ref :85-115)."""
        length = self._pad_bucket(noisy)[0].shape[-1]
        n = self.config.n_neighbor

        def fn(variables, wav):
            real, imag = self._stft(wav)                     # [1, F, T]
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            unfolded = band_unfold(mag[:, None], n)          # [1, F, 1, W, T]
            f = mag.shape[1]
            unfolded = unfolded.reshape(f, 2 * n + 1, -1)    # [F, W, T]
            pred_crm = self.apply(variables, unfolded)       # [F, 2, T]
            pred_crm = jnp.transpose(pred_crm, (0, 2, 1))    # [F, T, 2]
            pred_crm = decompress_cIRM(pred_crm, limit=9.99)
            er, ei = apply_crm(pred_crm, real[0], imag[0])
            return self._istft(er[None], ei[None], length)

        return self._run_jitted("sub_band", fn, noisy)

    def full_band_crm_mask(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Mag-input cRM model, e.g. FullSubNet v1 (ref :117-139)."""
        length = self._pad_bucket(noisy)[0].shape[-1]

        def fn(variables, wav):
            real, imag = self._stft(wav)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            pred_crm = self.apply(variables, mag[:, None])
            pred_crm = decompress_cIRM(jnp.transpose(pred_crm, (0, 2, 3, 1)))
            er, ei = apply_crm(pred_crm, real, imag)
            return self._istft(er, ei, length)

        return self._run_jitted("full_band", fn, noisy)

    def mag_complex_full_band_crm_mask(self, noisy: np.ndarray,
                                       args=None) -> np.ndarray:
        """The default FullSubNet+ path (ref :141-165, inference.toml:10)."""
        length = self._pad_bucket(noisy)[0].shape[-1]

        def fn(variables, wav):
            real, imag = self._stft(wav)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            pred_crm = self.apply(variables, mag[:, None], real[:, None],
                                  imag[:, None])
            pred_crm = decompress_cIRM(jnp.transpose(pred_crm, (0, 2, 3, 1)))
            er, ei = apply_crm(pred_crm, real, imag)
            return self._istft(er, ei, length)

        return self._run_jitted("mag_complex", fn, noisy)

    def complex_full_band_crm_mask(self, noisy: np.ndarray,
                                   args=None) -> np.ndarray:
        """Stacked (real, imag) input model (ref :167-189)."""
        length = self._pad_bucket(noisy)[0].shape[-1]

        def fn(variables, wav):
            real, imag = self._stft(wav)
            pred_crm = self.apply(variables, jnp.stack([real, imag], axis=1))
            pred_crm = decompress_cIRM(jnp.transpose(pred_crm, (0, 2, 3, 1)))
            er, ei = apply_crm(pred_crm, real, imag)
            return self._istft(er, ei, length)

        return self._run_jitted("complex", fn, noisy)

    def _chunk_program(self):
        """The compiled per-chunk waveform->waveform program shared by
        `overlapped_chunk` and `eval.streaming.StreamingEnhancer` — one
        fixed-shape jit reused for every chunk of every clip."""
        c = self.config
        chunk_length = c.sr * c.chunk_length_seconds

        def spectral_chunk_fn(v, w):
            # spectral-model wrapper: run the default cRM pipeline per chunk
            # (the reference's overlapped_chunk drives a waveform->waveform
            # model; FullSubNet+ callers get this wrapper automatically)
            real, imag = self._stft(w)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            crm = self.apply(v, mag[:, None], real[:, None], imag[:, None])
            crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
            er, ei = apply_crm(crm, real, imag)
            return self._istft(er, ei, w.shape[-1])

        # Decide the per-chunk model kind explicitly (config flag or
        # signature arity) — NOT by catching TypeError from the compiled
        # apply, which would silently mask a genuine TypeError bug inside a
        # user's waveform model and proceed in the wrong mode.
        kind = ("chunk_wav" if self._chunk_model_is_waveform()
                else "chunk_spec")
        key = (kind, chunk_length + 256)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                (lambda v, w: self.apply(v, w)) if kind == "chunk_wav"
                else spectral_chunk_fn)
        return self._compiled[key]

    def overlapped_chunk(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Streaming hann-crossfaded 50%-overlap chunks with 256-sample noisy
        pre-roll (ref :191-250). The per-chunk model is a waveform->waveform
        enhancer (e.g. a jitted full pipeline); chunks share ONE compiled
        program since their length is fixed."""
        c = self.config
        chunk_length = c.sr * c.chunk_length_seconds
        hop = chunk_length // 2
        num_chunks = int(len(noisy) / hop) + 1
        win = np.asarray(hann_window(chunk_length))
        model = self._chunk_program()

        prev = None
        out = []
        t_start = time.time()
        for chunk_idx in range(num_chunks):
            start = chunk_idx * hop
            seg = noisy[start:start + chunk_length]
            if len(seg) < chunk_length:
                seg = np.pad(seg, (0, chunk_length - len(seg)))
            if chunk_idx == 0:
                pad = np.zeros(256, np.float32)
            else:
                pad = noisy[start - 256:start]
            chunk_in = np.concatenate([pad, seg])[None]
            enhanced_chunk = np.asarray(model(self.variables, chunk_in))[0]
            enhanced_chunk = enhanced_chunk[256:]
            if chunk_idx == 0:
                cur = enhanced_chunk[:hop]
                prev = enhanced_chunk[hop:] * win[hop:]
            else:
                enhanced_chunk = enhanced_chunk * win[: len(enhanced_chunk)]
                tmp = enhanced_chunk[:hop]
                m = min(len(tmp), len(prev))
                cur = tmp[:m] + prev[:m]
                prev = enhanced_chunk[hop:]
            out.append(cur)
        # the reference logs RTF for the streaming mode too
        # (fullsubnet_plus/inferencer/inferencer.py:135)
        self.last_rtf = (time.time() - t_start) / (len(noisy) / c.sr)
        return np.concatenate(out)[: len(noisy)]

    def time_domain(self, noisy: np.ndarray, args=None) -> np.ndarray:
        """Direct waveform->waveform model (ref :252-256)."""
        return self._run_jitted(
            "time", lambda v, w: self.apply(v, w), noisy)

    # -------------------------------------------------------------- run ----
    def enhance(self, noisy: np.ndarray) -> np.ndarray:
        mode = getattr(self, self.config.inference_type, None)
        if mode is None:
            raise NotImplementedError(
                f"Unknown inference type {self.config.inference_type!r}")
        return mode(noisy)

    def _write_enhanced(self, output_dir, name: str, enhanced: np.ndarray):
        if np.ndim(enhanced) > 1:
            enhanced = enhanced.reshape(-1)
        amp = np.max(np.abs(enhanced))
        if amp > 0:
            enhanced = enhanced / amp * 0.8
        write_wav(Path(output_dir) / f"{name}.wav", enhanced, self.config.sr)

    def enhance_dir(self, dataset, output_dir, log=print,
                    batch_size: int = 1):
        """Enhance a dataset of (waveform, name); writes int16 wavs
        peak-normalized to 0.8 like base_inferencer.py:145-159.

        batch_size=1 matches the reference CLI; batch_size>1 is the TPU
        serving mode: clips are grouped by padded bucket length and run
        through ONE batched compiled program per bucket (default cRM mode
        only)."""
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        if batch_size <= 1:
            for i in range(len(dataset)):
                noisy, name = dataset[i]
                enhanced = self.enhance(noisy)
                self._write_enhanced(output_dir, name, enhanced)
                log(f"[{i + 1}/{len(dataset)}] {name} rtf={self.last_rtf}")
            return

        # ---- batched serving: group by bucket length ----
        bucket = self.config.length_bucket
        groups: Dict[int, list] = {}
        for i in range(len(dataset)):
            noisy, name = dataset[i]
            padded_len = ((len(noisy) + bucket - 1) // bucket) * bucket
            groups.setdefault(padded_len, []).append((noisy, name))

        def batched_fn(variables, wav):
            real, imag = self._stft(wav)
            mag = jnp.sqrt(real ** 2 + imag ** 2)
            crm = self.apply(variables, mag[:, None], real[:, None],
                             imag[:, None])
            crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
            er, ei = apply_crm(crm, real, imag)
            return self._istft(er, ei, wav.shape[-1])

        # Two-layer overlap (round 4, decomposition in
        # artifacts/perf/serving_decompose.txt):
        #  1. jax dispatch is async, so device_put of the next batch and
        #     the jit call overlap the previous batch's compute; on the
        #     tunnel backend host->device transfer costs ~10 ms/MB —
        #     serializing it per batch leaves the chip idle that long.
        #  2. the blocking D2H fetch (np.asarray) + int16 convert + disk
        #     writes run on a dedicated writer thread (the GIL is released
        #     during the fetch and file IO), so the main thread's
        #     prep + H2D + dispatch of batch N+1 overlaps the fetch+write
        #     of batch N instead of serializing with it.
        import queue as _queue
        import threading

        done = 0
        total_audio_s = 0.0
        fetch_q: _queue.Queue = _queue.Queue(maxsize=2)
        writer_err = []

        def _writer():
            nonlocal done
            while True:
                item = fetch_q.get()
                if item is None:
                    return
                if writer_err:
                    continue            # drain without processing
                chunk, out_ref = item
                try:
                    out = np.asarray(out_ref)   # blocks until batch done
                    for j, (noisy, name) in enumerate(chunk):
                        self._write_enhanced(output_dir, name,
                                             out[j, :len(noisy)])
                    done += len(chunk)
                    log(f"[{done}/{len(dataset)}] batch of {len(chunk)}")
                except Exception as e:          # surfaced after join
                    writer_err.append(e)

        writer = threading.Thread(target=_writer, daemon=True)
        writer.start()

        def _warm_batch_size(padded_len: int) -> int:
            """Largest batch (halving from batch_size) whose program warms
            without an OOM at this bucket length — the time-major LSTM
            gates buffer scales with batch x frames, so long buckets can
            exceed HBM at the caller's batch size."""
            bs = batch_size
            while True:
                key = ("dir_batch", padded_len, bs)
                if key in self._compiled:
                    return bs
                # compile (and warm) outside the timed window so the
                # serving RTF reports steady-state throughput, not each
                # bucket's one-off compile
                fn = jax.jit(batched_fn)
                try:
                    np.asarray(fn(self.variables,
                                  np.zeros((bs, padded_len), np.float32)))
                    self._compiled[key] = fn
                    return bs
                except Exception:
                    if bs == 1:
                        raise
                    log(f"bucket {padded_len}: batch {bs} failed to warm "
                        f"(likely HBM); retrying at {bs // 2}")
                    bs //= 2

        # warm every bucket BEFORE the timed window (serving RTF reports
        # steady-state throughput, not one-off compiles)
        bucket_bs = {plen: _warm_batch_size(plen) for plen in sorted(groups)}

        t_serve0 = time.perf_counter()
        for padded_len, items in sorted(groups.items()):
            bs = bucket_bs[padded_len]
            for start in range(0, len(items), bs):
                chunk = items[start:start + bs]
                wavs = np.zeros((len(chunk), padded_len), np.float32)
                for j, (noisy, _) in enumerate(chunk):
                    wavs[j, :len(noisy)] = noisy
                # pad the batch dim so every bucket shares one program
                if len(chunk) < bs:
                    wavs = np.pad(wavs, ((0, bs - len(chunk)), (0, 0)))
                key = ("dir_batch", padded_len, bs)
                out_ref = self._compiled[key](self.variables,
                                              jax.device_put(wavs))
                # blocks only when 2 batches are already queued behind
                # the writer (bounds device-resident outputs)
                fetch_q.put((chunk, out_ref))
                total_audio_s += sum(len(n) for n, _ in chunk) \
                    / self.config.sr
        fetch_q.put(None)
        writer.join()
        if writer_err:
            raise writer_err[0]
        # aggregate serving RTF (batches overlap, so per-batch timing is
        # meaningless): wall seconds per second of audio served
        self.last_rtf = ((time.perf_counter() - t_serve0)
                         / max(total_audio_s, 1e-9))
        log(f"served {done} clips, rtf={self.last_rtf:.4f}")
