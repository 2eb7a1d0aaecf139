"""Sweep the enhance() batch size on the real chip: RTF per batch.

The headline RTF is throughput-shaped (serving batches clips); this finds
the batch that maximizes seconds-of-audio/second on one chip.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

import generative_audio_tpu.ops as ops
from generative_audio_tpu.models import FullSubNetPlus, FullSubNetPlusConfig

SR = 16000
SECONDS = 10
BATCHES = [int(b) for b in
           os.environ.get("PB_BATCHES", "8,16,24,32,48").split(",")]
ITERS = int(os.environ.get("PB_ITERS", "6"))
WINDOWS = int(os.environ.get("PB_WINDOWS", "6"))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    config = FullSubNetPlusConfig()
    model = FullSubNetPlus(config, compute_dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 1, config.num_freqs, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy,
                                 dummy)["params"]

    @jax.jit
    def enhance(params, wav_in):
        mag, real, imag = ops.prepare_input_from_waveform(
            wav_in, 512, 256, 512)
        crm = model.apply({"params": params}, mag, real, imag)
        crm = ops.decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
        er, ei = ops.apply_crm(crm, real[:, 0], imag[:, 0])
        return ops.istft_ri(er, ei, 512, 256, 512, length=wav_in.shape[-1])

    rng = np.random.default_rng(0)
    for batch in BATCHES:
        wavs = jax.device_put(
            rng.standard_normal((batch, SR * SECONDS)).astype(np.float32)
            * 0.05)
        try:
            out = np.asarray(enhance(params, wavs)[0, :8])  # compile+warm
        except Exception as e:  # OOM etc.
            print(f"batch {batch:3d}  FAILED: {type(e).__name__}",
                  flush=True)
            continue
        assert np.all(np.isfinite(out))
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            last = None
            for _ in range(ITERS):
                last = enhance(params, wavs)
            np.asarray(last[0, :8])
            best = min(best, time.perf_counter() - t0)
        rtf = ITERS * batch * SECONDS / best
        print(f"batch {batch:3d}  {best / ITERS * 1e3:8.2f} ms/call  "
              f"RTF {rtf:8.1f}x", flush=True)


if __name__ == "__main__":
    main()
