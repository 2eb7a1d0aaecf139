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

Multi-stream serving: feed [K, n] arrays instead of [n] and K synchronized
live streams (a conference bridge, a fan-in server) share ONE batched chunk
program, amortizing the per-chunk dispatch floor across K streams (measured
over the axon tunnel with `scripts/perf_streaming.py`: 16 streams sustain
76-93x realtime aggregate vs 12-17x for one serial stream, with
feed()-to-finalized latency p50 28/40/83 ms at K=1/4/16 under 100 ms paced
feeds — artifacts/perf/streaming_latency.txt; a co-located host approaching
the offline batched mode's 2000x-class throughput is an EXTRAPOLATION — the
chunk compute is the same program, but it has not been measured without the
tunnel in between).

Guarantee: feed()/flush() produce BIT-IDENTICAL output to
`Inferencer.overlapped_chunk` on the concatenated input (same compiled
chunk program, same crossfade arithmetic — tested in
tests/test_eval.py::test_streaming_matches_offline_overlapped_chunk).
Batched streams match the single-stream path per row up to the compiled
program's batch-reduction order (exactly, for elementwise models).

Pipelining (`async_depth=d`, round 4): feed() dispatches ready chunks
without blocking and returns whichever results have already landed, so
the device computes and the tunnel round-trips UNDER the caller's
pacing instead of stalling every hop-crossing feed() (the round-3 K=16
p50 was 83 ms/feed, almost all of it blocked on the fetch). Output
values are unchanged — only the feed() call on which a span is returned
shifts, bounded by d chunks; flush() drains everything. Measured
decomposition + before/after: artifacts/perf/streaming_latency.txt.

Latency/TPU notes:
  * Algorithmic latency: a chunk starting at sample `s` finalizes output
    [s, s+hop) once input through s+chunk_length has arrived, so an output
    sample waits between hop and chunk_length input samples (worst case
    one chunk: `chunk_length_seconds=1` => <=1 s) plus the chunk compute.
  * Every chunk reuses ONE fixed-shape compiled program per stream-batch
    size (the same cache the offline mode uses), so a long-running stream
    never recompiles.
  * Host buffering is O(K x chunk_length): only the pre-roll + current
    window of raw input is retained, not the whole stream.
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
    and compiled-program cache are reused). `n_streams=1` (default) feeds
    and returns 1-D sample arrays; `n_streams=K` feeds/returns [K, n]
    arrays of K lockstep streams sharing one batched chunk program. Not
    thread-safe; one instance per stream group. After `flush()` the
    instance resets and can stream again.
    """

    def __init__(self, inferencer: Inferencer, n_streams: int = 1,
                 async_depth: int = 0):
        self._inf = inferencer
        c = inferencer.config
        self.n_streams = n_streams
        self.chunk_length = c.sr * c.chunk_length_seconds
        self.hop = self.chunk_length // 2
        self._win = np.asarray(hann_window(self.chunk_length))
        self._model = inferencer._chunk_program()
        self.last_rtf: Optional[float] = None   # of the last flushed stream
        # async_depth=0: each ready chunk is dispatched AND fetched inside
        # feed() (the round-3 behaviour — feed blocks on the device round
        # trip). async_depth=d>0: up to d chunks stay in flight; feed()
        # dispatches without blocking and finalizes chunks whose results
        # are already on the host (jax async dispatch overlaps the device
        # compute + tunnel round trip with the caller's next feeds). Output
        # is bit-identical in both modes, only the feed() call on which a
        # given span is RETURNED shifts (bounded by d chunks; flush()
        # drains everything).
        self.async_depth = int(async_depth)
        self.reset()

    # ------------------------------------------------------------- state --
    def reset(self):
        k = self.n_streams
        self._buf = np.zeros((k, 0), np.float32)  # raw from _buf_start
        self._buf_start = 0                   # absolute index of _buf[:, 0]
        self._total = 0                       # samples received per stream
        self._chunk_idx = 0                   # next chunk to DISPATCH
        self._emitted = 0                     # finalized samples emitted
        self._prev: Optional[np.ndarray] = None   # carried windowed tail
        self._compute_seconds = 0.0
        self._inflight = []                   # [(chunk_idx, device ref)]
        self._finalized = 0                   # chunks finalized so far
        # decomposition counters (perf_streaming.py reads these)
        self.t_dispatch = 0.0   # host prep + async dispatch call
        self.t_fetch = 0.0      # blocked on the device result (np.asarray)
        self.t_crossfade = 0.0  # host window/crossfade arithmetic

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency: input samples needed beyond a given output
        sample before it can be finalized."""
        return self.chunk_length

    @property
    def rtf(self) -> Optional[float]:
        """Compute real-time factor so far (processing time / per-stream
        audio time), matching the offline mode's RTF convention (ref :135).
        For K streams, divide by K for the per-stream share."""
        if self._emitted == 0:
            return None
        return self._compute_seconds / (self._emitted / self._inf.config.sr)

    # ----------------------------------------------------------- chunks --
    def _dispatch_chunk(self) -> None:
        """Dispatch chunk `self._chunk_idx` to the device (async — jax
        returns a future-like array immediately) and retire the raw input
        samples it consumed."""
        k = self.n_streams
        start = self._chunk_idx * self.hop
        rel = start - self._buf_start
        seg = self._buf[:, rel:rel + self.chunk_length]
        if seg.shape[-1] < self.chunk_length:  # only in the flush() phase
            seg = np.pad(seg,
                         ((0, 0), (0, self.chunk_length - seg.shape[-1])))
        if self._chunk_idx == 0:
            pad = np.zeros((k, _PRE_ROLL), np.float32)
        else:
            pad = self._buf[:, rel - _PRE_ROLL:rel]
        t0 = time.time()
        ref = self._model(self._inf.variables,
                          np.concatenate([pad, seg], axis=-1))
        dt = time.time() - t0
        self._compute_seconds += dt   # dispatch share
        self.t_dispatch += dt
        self._inflight.append((self._chunk_idx, ref))
        self._chunk_idx += 1
        # drop raw samples no longer needed: the next chunk reads from
        # (next_start - pre_roll)
        keep_from = self._chunk_idx * self.hop - _PRE_ROLL - self._buf_start
        if keep_from > 0:
            self._buf = self._buf[:, keep_from:]
            self._buf_start += keep_from

    def _finalize_head(self) -> np.ndarray:
        """Fetch the oldest in-flight chunk (blocking) and apply the
        crossfade arithmetic exactly as the offline loop does
        (ref :205-245); returns its finalized [K, hop] samples."""
        idx, ref = self._inflight.pop(0)
        assert idx == self._finalized, (idx, self._finalized)
        t0 = time.time()
        enhanced = np.asarray(ref)      # blocks until THIS chunk is done
        t1 = time.time()
        self._compute_seconds += t1 - t0
        self.t_fetch += t1 - t0
        enhanced = enhanced[:, _PRE_ROLL:]
        if idx == 0:
            cur = enhanced[:, :self.hop]
            self._prev = enhanced[:, self.hop:] * self._win[self.hop:]
        else:
            enhanced = enhanced * self._win[: enhanced.shape[-1]]
            tmp = enhanced[:, :self.hop]
            m = min(tmp.shape[-1], self._prev.shape[-1])
            cur = tmp[:, :m] + self._prev[:, :m]
            self._prev = enhanced[:, self.hop:]
        self.t_crossfade += time.time() - t1
        self._finalized += 1
        return cur

    @staticmethod
    def _head_ready(ref) -> bool:
        """Best-effort non-blocking readiness probe; scheduling-only (a
        wrong answer changes WHEN a chunk is collected, never its value)."""
        try:
            return bool(ref.is_ready())
        except Exception:
            return True

    def _collect(self, drain: bool) -> list:
        """Finalize in-flight chunks: always down to async_depth, plus any
        head whose result already arrived; everything when draining."""
        out = []
        while self._inflight:
            if not (drain or len(self._inflight) > self.async_depth
                    or self._head_ready(self._inflight[0][1])):
                break
            out.append(self._finalize_head())
        return out

    def _shape_in(self, samples: np.ndarray) -> np.ndarray:
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            if self.n_streams != 1:
                raise ValueError(
                    f"1-D input for an n_streams={self.n_streams} enhancer;"
                    " feed [K, n] arrays")
            return samples.reshape(1, -1)
        if samples.shape[0] != self.n_streams:
            raise ValueError(f"expected {self.n_streams} stream rows, "
                             f"got {samples.shape[0]}")
        return samples

    def _shape_out(self, out: np.ndarray) -> np.ndarray:
        return out[0] if self.n_streams == 1 else out

    # -------------------------------------------------------------- api --
    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Push raw samples ([n], or [K, n] for K streams); returns
        newly-finalized enhanced samples (possibly empty, same leading
        shape). With async_depth=0, output sample i is returned by the
        feed() that supplies input sample i + chunk_length; with
        async_depth=d, its chunk is dispatched on that feed but may be
        returned up to d chunks later (whenever its result has landed) —
        the values are identical either way."""
        samples = self._shape_in(samples)
        self._buf = np.concatenate([self._buf, samples], axis=-1)
        self._total += samples.shape[-1]
        # a chunk is ready when its full window is available
        while self._chunk_idx * self.hop + self.chunk_length <= self._total:
            self._dispatch_chunk()
        out = self._collect(drain=self.async_depth == 0)
        done = (np.concatenate(out, axis=-1) if out
                else np.zeros((self.n_streams, 0), np.float32))
        self._emitted += done.shape[-1]
        return self._shape_out(done)

    def flush(self) -> np.ndarray:
        """Drain: process the remaining (zero-padded) chunks and return the
        final enhanced samples, cropping the stream to its exact length —
        the offline mode's `num_chunks = len//hop + 1` then `[:len]`
        tail handling (ref :203, :245). Resets the stream afterwards."""
        if self._total == 0:
            # nothing was fed: skip the zero-padded device chunk (which over
            # the TPU tunnel wastes a dispatch, or a cold compile) and return
            # the empty-shaped output directly
            self.last_rtf = self.rtf
            out = np.zeros((self.n_streams, 0), np.float32)
            self.reset()
            return self._shape_out(out)
        num_chunks = int(self._total / self.hop) + 1
        while self._chunk_idx < num_chunks:
            self._dispatch_chunk()
        out = self._collect(drain=True)
        done = (np.concatenate(out, axis=-1) if out
                else np.zeros((self.n_streams, 0), np.float32))
        done = done[:, : self._total - self._emitted]
        self._emitted += done.shape[-1]
        self.last_rtf = self.rtf
        self.reset()
        return self._shape_out(done)
