"""Real-time streaming enhancement demo — runs anywhere (CPU or TPU), no
external data.

    python examples/streaming_demo.py

Simulates a live audio source delivering arbitrary-sized pieces of a noisy
clip to `eval.streaming.StreamingEnhancer`, collects the finalized output
incrementally, and verifies it is bit-identical to the offline
`overlapped_chunk` mode on the whole clip.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.models import (FullSubNetPlus,
                                             FullSubNetPlusConfig)
    from generative_audio_tpu.eval.inferencer import (Inferencer,
                                                      InferencerConfig)
    from generative_audio_tpu.eval.streaming import StreamingEnhancer

    # a small random-weight model keeps the demo fast; swap in converted
    # reference weights (utils/torch_convert.py) for real enhancement
    cfg = FullSubNetPlusConfig(num_freqs=257, fb_model_hidden_size=64,
                               sb_model_hidden_size=48)
    model = FullSubNetPlus(cfg)
    dummy = jnp.zeros((1, 1, cfg.num_freqs, 16), jnp.float32)
    variables = {"params": jax.jit(model.init)(
        jax.random.PRNGKey(0), dummy, dummy, dummy)["params"]}

    inf = Inferencer(lambda v, m, r, i: model.apply(v, m, r, i), variables,
                     InferencerConfig(chunk_length_seconds=1,
                                      chunk_model="spectral"))

    rng = np.random.default_rng(0)
    sr = 16000
    noisy = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr * 3) / sr)
             + 0.02 * rng.standard_normal(sr * 3)).astype(np.float32)

    stream = StreamingEnhancer(inf)
    print(f"algorithmic latency: {stream.latency_samples / sr:.2f} s")
    out_pieces, pos = [], 0
    while pos < len(noisy):
        n = int(rng.integers(800, 6000))       # a "microphone" burst
        piece = stream.feed(noisy[pos:pos + n])
        print(f"fed {n:5d} samples -> {len(piece):5d} finalized")
        out_pieces.append(piece)
        pos += n
    out_pieces.append(stream.flush())
    streamed = np.concatenate(out_pieces)
    print(f"flushed; stream RTF {stream.last_rtf:.3f} "
          f"({1 / stream.last_rtf:.0f}x realtime serial)")

    offline = inf.overlapped_chunk(noisy)
    assert np.array_equal(streamed, offline)
    print("streamed output is bit-identical to offline overlapped_chunk")


if __name__ == "__main__":
    main()
