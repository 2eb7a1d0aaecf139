"""Serving-throughput benchmark: enhance_dir batched mode on the real chip.

Feeds N synthetic 10 s clips through the full-size model via the
Inferencer's bucket-batched serving path (host wavs in, wav files out —
includes every host cost: H2D transfer, D2H fetch, disk writes) and prints
the aggregate serving RTF.
"""
import os
import sys
import tempfile
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

SR = 16000
N_CLIPS = int(os.environ.get("PS_CLIPS", "24"))
SECONDS = int(os.environ.get("PS_SECONDS", "10"))
BATCH = int(os.environ.get("PS_BATCH", "8"))


class _DS:
    def __init__(self, clips):
        self.clips = clips

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, i):
        return self.clips[i], f"clip_{i:03d}"


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # PS_TINY=1 + JAX_PLATFORMS=cpu: host-floor regime (see
    # perf_streaming.py) — tiny model, in-process backend, so the wall
    # clock is the serving loop's own overhead, not FLOPs or the tunnel.
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

    rng = np.random.default_rng(0)
    clips = [rng.standard_normal(SR * SECONDS).astype(np.float32) * 0.05
             for _ in range(N_CLIPS)]

    inf = Inferencer(model.apply, variables={"params": params},
                     config=InferencerConfig(length_bucket=SR * SECONDS))
    with tempfile.TemporaryDirectory() as out:
        # warm pass (compile) then the timed pass
        inf.enhance_dir(_DS(clips[:BATCH]), out, batch_size=BATCH,
                        log=lambda *a: None)
        t0 = time.perf_counter()
        inf.enhance_dir(_DS(clips), out, batch_size=BATCH,
                        log=lambda *a: None)
        wall = time.perf_counter() - t0
    audio = N_CLIPS * float(SECONDS)
    print(f"{N_CLIPS} clips x {SECONDS} s, batch {BATCH}: {wall:.2f} s wall, "
          f"serving RTF {audio / wall:.1f}x realtime "
          f"(inferencer rtf={inf.last_rtf:.5f})", flush=True)


if __name__ == "__main__":
    main()
