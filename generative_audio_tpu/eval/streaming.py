"""Real-time streaming enhancement: a push/pull wrapper over the
overlapped-chunk scheme.

The reference's only streaming story is the offline `overlapped_chunk`
inference mode (fullsubnet_plus/inferencer/inferencer.py:191-250): hann
crossfaded 50%-overlap chunks with a 256-sample noisy pre-roll, run over a
complete clip. This module exposes the SAME arithmetic incrementally, so a
live audio source can feed samples as they arrive and collect finalized
enhanced audio with bounded latency:

    stream = StreamingEnhancer(inferencer)
    for piece in microphone():          # arbitrary-sized pieces
        play(stream.feed(piece))        # finalized samples so far
    play(stream.flush())                # drain the tail

Guarantee: feed()/flush() produce BIT-IDENTICAL output to
`Inferencer.overlapped_chunk` on the concatenated input (same compiled
chunk program, same crossfade arithmetic — tested in
tests/test_eval.py::test_streaming_matches_offline_overlapped_chunk).

Latency/TPU notes:
  * Algorithmic latency: a chunk starting at sample `s` finalizes output
    [s, s+hop) once input through s+chunk_length has arrived, so an output
    sample waits between hop and chunk_length input samples (worst case
    one chunk: `chunk_length_seconds=1` => <=1 s) plus the chunk compute.
  * Every chunk reuses ONE fixed-shape compiled program (the same cache
    the offline mode uses), so a long-running stream never recompiles.
  * Host buffering is O(chunk_length): only the pre-roll + current window
    of raw input is retained, not the whole stream.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

from generative_audio_tpu.ops.stft import hann_window
from generative_audio_tpu.eval.inferencer import Inferencer

__all__ = ["StreamingEnhancer"]

_PRE_ROLL = 256   # noisy pre-roll samples (ref inferencer.py:205-213)


class StreamingEnhancer:
    """Incremental overlapped-chunk enhancement with carried crossfade state.

    Wraps an `Inferencer` (its `chunk_model`/`chunk_length_seconds` config
    and compiled-program cache are reused). Not thread-safe; one instance
    per stream. After `flush()` the instance resets and can stream again.
    """

    def __init__(self, inferencer: Inferencer):
        self._inf = inferencer
        c = inferencer.config
        self.chunk_length = c.sr * c.chunk_length_seconds
        self.hop = self.chunk_length // 2
        self._win = np.asarray(hann_window(self.chunk_length))
        self._model = inferencer._chunk_program()
        self.last_rtf: Optional[float] = None   # of the last flushed stream
        self.reset()

    # ------------------------------------------------------------- state --
    def reset(self):
        self._buf = np.zeros(0, np.float32)   # raw samples from _buf_start
        self._buf_start = 0                   # absolute index of _buf[0]
        self._total = 0                       # samples received so far
        self._chunk_idx = 0                   # next chunk to process
        self._emitted = 0                     # finalized samples emitted
        self._prev: Optional[np.ndarray] = None   # carried windowed tail
        self._compute_seconds = 0.0

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency: input samples needed beyond a given output
        sample before it can be finalized."""
        return self.chunk_length

    @property
    def rtf(self) -> Optional[float]:
        """Compute real-time factor so far (processing time / audio time),
        matching the offline mode's RTF convention (ref :135)."""
        if self._emitted == 0:
            return None
        return self._compute_seconds / (self._emitted / self._inf.config.sr)

    # ----------------------------------------------------------- chunks --
    def _run_chunk(self) -> np.ndarray:
        """Process chunk `self._chunk_idx` exactly as the offline loop does
        (ref :205-245 arithmetic) and return its finalized `hop` samples."""
        start = self._chunk_idx * self.hop
        rel = start - self._buf_start
        seg = self._buf[rel:rel + self.chunk_length]
        if len(seg) < self.chunk_length:       # only in the flush() phase
            seg = np.pad(seg, (0, self.chunk_length - len(seg)))
        if self._chunk_idx == 0:
            pad = np.zeros(_PRE_ROLL, np.float32)
        else:
            pad = self._buf[rel - _PRE_ROLL:rel]
        t0 = time.time()
        enhanced = np.asarray(
            self._model(self._inf.variables,
                        np.concatenate([pad, seg])[None]))[0]
        self._compute_seconds += time.time() - t0
        enhanced = enhanced[_PRE_ROLL:]
        if self._chunk_idx == 0:
            cur = enhanced[:self.hop]
            self._prev = enhanced[self.hop:] * self._win[self.hop:]
        else:
            enhanced = enhanced * self._win[: len(enhanced)]
            tmp = enhanced[:self.hop]
            m = min(len(tmp), len(self._prev))
            cur = tmp[:m] + self._prev[:m]
            self._prev = enhanced[self.hop:]
        self._chunk_idx += 1
        # drop raw samples no longer needed: the next chunk reads from
        # (next_start - pre_roll)
        keep_from = self._chunk_idx * self.hop - _PRE_ROLL - self._buf_start
        if keep_from > 0:
            self._buf = self._buf[keep_from:]
            self._buf_start += keep_from
        return cur

    # -------------------------------------------------------------- api --
    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Push raw samples; returns newly-finalized enhanced samples
        (possibly empty). Output sample i is finalized once input sample
        i + chunk_length has been fed."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._total += len(samples)
        out = []
        # a chunk is ready when its full window is available
        while self._chunk_idx * self.hop + self.chunk_length <= self._total:
            out.append(self._run_chunk())
        done = (np.concatenate(out) if out
                else np.zeros(0, np.float32))
        self._emitted += len(done)
        return done

    def flush(self) -> np.ndarray:
        """Drain: process the remaining (zero-padded) chunks and return the
        final enhanced samples, cropping the stream to its exact length —
        the offline mode's `num_chunks = len//hop + 1` then `[:len]`
        tail handling (ref :203, :245). Resets the stream afterwards."""
        num_chunks = int(self._total / self.hop) + 1
        out = []
        while self._chunk_idx < num_chunks:
            out.append(self._run_chunk())
        done = (np.concatenate(out) if out
                else np.zeros(0, np.float32))
        done = done[: self._total - self._emitted]
        self._emitted += len(done)
        self.last_rtf = self.rtf
        self.reset()
        return done
