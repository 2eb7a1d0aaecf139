"""Decompose the headline enhance() pipeline stage-by-stage on the real chip.

Times, per batched call (B clips x 10 s @ 16 kHz, matching bench.py):
  stft      — wav -> (real, imag, mag)
  model     — FullSubNetPlus forward (mag, real, imag) -> cRM
  fb_only   — the three full-band towers alone (no sub-band stage)
  mask+istft— decompress_cIRM + apply_crm + iSTFT
  full      — the whole fused pipeline (bench.py's timed program)

All inputs are generated on-device (jax.random) and each timed program ends
with a small-slice fetch barrier (CLAUDE.md: block_until_ready is unreliable
over the tunnel). Best-of-N windows to ride out shared-chip variance.
"""
import json
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

from _perf_common import timed as _timed
from generative_audio_tpu.models.fullsubnet_plus import (
    FullSubNetPlus, FullSubNetPlusConfig)
from generative_audio_tpu.ops.stft import stft_ri, istft_ri
from generative_audio_tpu.ops.mask import decompress_cIRM, apply_crm

B = int(os.environ.get("PD_BATCH", "8"))
SECONDS = 10
SR = 16000
N_FFT, HOP = 512, 256
REPS = int(os.environ.get("PD_REPS", "8"))


def timed(name, fn, *args):
    return _timed(name, fn, *args, reps=REPS, jit=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    cfg = FullSubNetPlusConfig()
    model = FullSubNetPlus(cfg)

    key = jax.random.PRNGKey(0)
    wav = jax.device_put(
        jax.random.normal(key, (B, SECONDS * SR), jnp.float32), dev)
    def do_stft(wav):
        real, imag = stft_ri(wav, N_FFT, HOP, N_FFT)
        mag = jnp.sqrt(real ** 2 + imag ** 2)
        return real, imag, mag

    real, imag, mag = jax.jit(do_stft)(wav)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), mag[:, None],
                                    real[:, None], imag[:, None])

    def do_model(variables, mag, real, imag):
        return model.apply(variables, mag[:, None], real[:, None],
                           imag[:, None])

    crm = jax.jit(do_model)(variables, mag, real, imag)

    def do_mask_istft(crm, real, imag):
        pred = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
        er, ei = apply_crm(pred, real, imag)
        return istft_ri(er, ei, N_FFT, HOP, N_FFT, length=SECONDS * SR)

    def do_full(variables, wav):
        real, imag = stft_ri(wav, N_FFT, HOP, N_FFT)
        mag = jnp.sqrt(real ** 2 + imag ** 2)
        pred = model.apply(variables, mag[:, None], real[:, None],
                           imag[:, None])
        pred = decompress_cIRM(jnp.transpose(pred, (0, 2, 3, 1)))
        er, ei = apply_crm(pred, real, imag)
        return istft_ri(er, ei, N_FFT, HOP, N_FFT, length=SECONDS * SR)

    results = dict([
        timed("stft", do_stft, wav),
        timed("model", do_model, variables, mag, real, imag),
        timed("mask+istft", do_mask_istft, crm, real, imag),
        timed("full", do_full, variables, wav),
    ])
    results["batch"] = B
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
