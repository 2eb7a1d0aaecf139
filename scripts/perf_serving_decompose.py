"""Per-stage decomposition of the batched serving path (VERDICT r3
item 5): H2D transfer, async dispatch, blocking D2H fetch, int16 convert
— the host/tunnel costs around one 60 s x batch-8 program.

    PS_SECONDS=60 PS_BATCH=8 python scripts/perf_serving_decompose.py

Companion to scripts/perf_serving.py (end-to-end RTF) and the streaming
decomposition counters in eval/streaming.py; results recorded in
artifacts/perf/streaming_latency.txt.
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

from generative_audio_tpu.models import FullSubNetPlus, FullSubNetPlusConfig
from generative_audio_tpu.eval.inferencer import Inferencer, InferencerConfig
from generative_audio_tpu.ops.mask import decompress_cIRM, apply_crm

SR = 16000
SECONDS = int(os.environ.get("PS_SECONDS", "60"))
BATCH = int(os.environ.get("PS_BATCH", "8"))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    config = FullSubNetPlusConfig()
    model = FullSubNetPlus(config, compute_dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 1, config.num_freqs, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy,
                                 dummy)["params"]
    inf = Inferencer(model.apply, variables={"params": params},
                     config=InferencerConfig(length_bucket=SR * SECONDS))
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((BATCH, SR * SECONDS)).astype(np.float32) * 0.05

    def batched_fn(variables, wav):
        real, imag = inf._stft(wav)
        mag = jnp.sqrt(real ** 2 + imag ** 2)
        crm = inf.apply(variables, mag[:, None], real[:, None], imag[:, None])
        crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
        er, ei = apply_crm(crm, real, imag)
        return inf._istft(er, ei, wav.shape[-1])

    fn = jax.jit(batched_fn)
    np.asarray(fn(inf.variables, wavs))
    print("warm done", flush=True)
    mb = wavs.nbytes / 2 ** 20
    for trial in range(4):
        t0 = time.perf_counter()
        dev = jax.device_put(wavs)
        t1 = time.perf_counter()
        ref = fn(inf.variables, dev)
        t2 = time.perf_counter()
        out = np.asarray(ref)
        t3 = time.perf_counter()
        pk = np.abs(out).max(axis=-1, keepdims=True)
        _ = (out / np.maximum(pk, 1e-9) * 0.8 * 32767).astype(np.int16)
        t4 = time.perf_counter()
        print(f"trial {trial}: H2D({mb:.0f} MB) {1e3 * (t1 - t0):6.1f} ms, "
              f"dispatch {1e3 * (t2 - t1):5.1f} ms, "
              f"block-fetch {1e3 * (t3 - t2):6.1f} ms, "
              f"int16-convert {1e3 * (t4 - t3):5.1f} ms "
              f"(batch audio {BATCH * SECONDS} s)", flush=True)


if __name__ == "__main__":
    main()
