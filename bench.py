"""Headline benchmark: FullSubNet+ enhancement throughput on one TPU chip.

Runs the full wav -> STFT -> FullSubNetPlus -> cIRM -> iSTFT -> wav pipeline
(the reference's RTF measurement, base_inferencer.py:143-155) on batched 10 s
clips and reports the real-time factor (seconds of audio enhanced per second
per chip). Baseline: the BASELINE.md target of >=10x real-time per v5e chip
(the reference records no RTF numbers of its own).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import generative_audio_tpu.ops as ops
    from generative_audio_tpu.models import FullSubNetPlus, FullSubNetPlusConfig

    sr = 16000
    clip_seconds = 10
    batch = 8
    length = sr * clip_seconds

    config = FullSubNetPlusConfig()
    model = FullSubNetPlus(config, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # jitted init: one compile on the device (eager init on the TPU tunnel
    # is minutes-slow; CPU init would lower the Pallas LSTM for CPU).
    dummy = jnp.zeros((1, 1, config.num_freqs, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy,
                                 dummy)["params"]

    @jax.jit
    def enhance(params, wav_in):
        mag, real, imag = ops.prepare_input_from_waveform(wav_in, 512, 256, 512)
        crm = model.apply({"params": params}, mag, real, imag)
        crm = ops.decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
        er, ei = ops.apply_crm(crm, real[:, 0], imag[:, 0])
        return ops.istft_ri(er, ei, 512, 256, 512, length=wav_in.shape[-1])

    wavs = rng.standard_normal((batch, length)).astype(np.float32) * 0.05
    out = np.asarray(enhance(params, wavs))  # compile + warm
    assert np.all(np.isfinite(out))

    # Sustained throughput: async-dispatch a window of iterations, then
    # fetch a small slice of the LAST output — executions are in-order, so
    # this is a true device barrier (jax.block_until_ready is unreliable on
    # the axon tunnel and adds per-array overhead). The shared tunnel chip
    # is noisy run-to-run, so take the best of several windows.
    iters, windows = 10, 8
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = enhance(params, wavs)
        np.asarray(last[0, :8])  # forced-value barrier
        best = min(best, time.perf_counter() - t0)
    elapsed = best

    audio_seconds = iters * batch * clip_seconds
    rtf_x = audio_seconds / elapsed  # x real-time per chip
    baseline_target = 10.0           # BASELINE.md: >=10x real-time per chip
    print(json.dumps({
        "metric": "fullsubnet_plus_enhancement_realtime_factor",
        "value": round(rtf_x, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf_x / baseline_target, 3),
    }))


if __name__ == "__main__":
    main()
