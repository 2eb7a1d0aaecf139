"""Streaming-enhancement throughput: StreamingEnhancer on the real chip.

Measures the live-serving numbers quoted in eval/streaming.py: K lockstep
streams fed piecewise through ONE batched chunk program, end-to-end wall
clock (host buffering + tunnel transfer + chunk compute + crossfade), and
reports per-configuration aggregate realtime factor.

    PS_STREAMS="1 4 16" PS_SECONDS=20 python scripts/perf_streaming.py

Single-stream RTF over the axon tunnel is dominated by the per-chunk
dispatch floor (~30-45 ms/call); K streams amortize it, which is the point
of the batched multi-stream mode.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin force-appends itself at import time; honoring a
    # cpu request needs the config pinned explicitly (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.models import FullSubNetPlus, FullSubNetPlusConfig
from generative_audio_tpu.eval.inferencer import Inferencer, InferencerConfig
from generative_audio_tpu.eval.streaming import StreamingEnhancer

SR = 16000
SECONDS = int(os.environ.get("PS_SECONDS", "20"))
STREAMS = [int(s) for s in os.environ.get("PS_STREAMS", "1 4 16").split()]
FEED = int(os.environ.get("PS_FEED_MS", "100")) * SR // 1000  # samples/feed


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # PS_TINY=1: shrink the model so chunk compute is negligible and the
    # numbers isolate the FRAMEWORK's per-chunk overhead (dispatch,
    # crossfade, buffering). Run with JAX_PLATFORMS=cpu for the
    # tunnel-free host-floor measurement (docs/PERF.md) — the in-process
    # CPU backend has no transfer/dispatch tunnel cost, so what remains
    # is the serving loop itself.
    if os.environ.get("PS_TINY"):
        config = FullSubNetPlusConfig(
            fb_model_hidden_size=32, sb_model_hidden_size=16,
            sb_num_neighbors=2)
    else:
        config = FullSubNetPlusConfig()
    model = FullSubNetPlus(config, compute_dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 1, config.num_freqs, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy,
                                 dummy)["params"]
    inf = Inferencer(model.apply, variables={"params": params},
                     config=InferencerConfig(chunk_length_seconds=1))

    rng = np.random.default_rng(0)
    length = SR * SECONDS
    for k in STREAMS:
        wavs = rng.standard_normal((k, length)).astype(np.float32) * 0.05
        for depth in (0, 2):
            stream = StreamingEnhancer(inf, n_streams=k, async_depth=depth)
            # warm pass: compile the [k, chunk+pre_roll] program
            stream.feed(wavs[:, : SR + 256 + 1])
            stream.flush()
            t0 = time.perf_counter()
            got = 0
            finalize_ms = []   # feed() calls that completed >=1 chunk and
            buffer_ms = []     # pure buffer-append feeds (no device work)
            stream.t_dispatch = stream.t_fetch = stream.t_crossfade = 0.0
            for pos in range(0, length, FEED):
                f0 = time.perf_counter()
                out = stream.feed(wavs[:, pos:pos + FEED])
                dt = (time.perf_counter() - f0) * 1e3
                (finalize_ms if np.shape(out)[-1] > 0
                 else buffer_ms).append(dt)
                got += np.shape(out)[-1]
            td, tf, tc = (stream.t_dispatch, stream.t_fetch,
                          stream.t_crossfade)
            n_chunks = max(stream._finalized, 1)
            got += np.shape(stream.flush())[-1]
            wall = time.perf_counter() - t0
            assert got == length, (got, length)
            agg = k * SECONDS / wall
            p50, p95 = np.percentile(finalize_ms, [50, 95])
            print(f"K={k:3d} d={depth} x {SECONDS} s, "
                  f"{FEED / SR * 1000:.0f} ms feeds: "
                  f"{wall:6.2f} s wall, aggregate {agg:7.1f}x realtime "
                  f"({agg / k:6.1f}x per stream); feed-to-finalized "
                  f"p50 {p50:6.1f} ms / p95 {p95:6.1f} ms "
                  f"(buffer-only p50 "
                  f"{np.percentile(buffer_ms, 50):5.2f} ms); "
                  f"per-chunk decomposition (pre-flush): "
                  f"dispatch {1e3 * td / n_chunks:5.1f} ms, "
                  f"blocked-fetch {1e3 * tf / n_chunks:5.1f} ms, "
                  f"crossfade {1e3 * tc / n_chunks:5.2f} ms", flush=True)


if __name__ == "__main__":
    main()
