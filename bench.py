"""Headline benchmark: FullSubNet+ enhancement throughput on one TPU chip.

Runs the full wav -> STFT -> FullSubNetPlus -> cIRM -> iSTFT -> wav pipeline
(the reference's RTF measurement, base_inferencer.py:143-155) on batched 10 s
clips and reports the real-time factor (seconds of audio enhanced per second
per chip). Baseline: the BASELINE.md target of >=10x real-time per v5e chip
(the reference records no RTF numbers of its own).

Also reports the perf-judging extras:
  * ms_per_call      — inference latency of one batched enhance() call
  * flops_per_call   — XLA cost-analysis FLOPs of the compiled program
  * mfu_est          — flops / time / chip-peak (bf16) estimate
  * train_ms_per_step— full-size training step (B=18, ~3 s clips: the
    reference's B.F ~= 18*257 sub-band batch, SURVEY.md section 3.1)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# persist XLA compiles across bench invocations (train-step compiles take
# 5-15 min over the tunnel; verified working with the axon plugin)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".jax_cache"))

import numpy as np

# bf16 peak TFLOP/s per chip, by device_kind substring (public specs)
_PEAK_TFLOPS = [
    ("v6e", 918.0), ("v6", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
]
_DEFAULT_PEAK_TFLOPS = 197.0   # assume v5e when unrecognized


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, tflops in _PEAK_TFLOPS:
        if key in kind:
            return tflops * 1e12
    return _DEFAULT_PEAK_TFLOPS * 1e12


def _compiled_flops(jitted, *args):
    """XLA cost-analysis FLOPs of the compiled program (None if opaque)."""
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0] if analysis else {}
        flops = float(analysis.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _best_window(fn, barrier, iters: int, windows: int):
    """(best, median) of N sustained windows. The shared tunnel chip has
    ~7x run-to-run variance; best approximates uncontended hardware speed,
    median shows what a co-tenanted run actually sustains. Executions are
    in-order so fetching a small piece of the LAST output is a true device
    barrier (jax.block_until_ready is unreliable over the tunnel)."""
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = fn(last)
        barrier(last)
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    import generative_audio_tpu.ops as ops
    from generative_audio_tpu.models import FullSubNetPlus, FullSubNetPlusConfig

    sr = 16000
    clip_seconds = 10
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

    # Batch 24 maximizes per-chip throughput (scripts/perf_batch_sweep.py:
    # 8 -> 1778x, 16 -> 1950x, 24 -> 2028x, 32 OOMs on the time-major gates
    # buffer); fall back when a co-tenant on the shared chip holds HBM.
    # Stage the inputs on the device ONCE: feeding host numpy per call makes
    # the loop pay ~5 MB of tunnel transfer per iteration (~10 ms/MB
    # measured), which benchmarks the tunnel, not the chip. A serving system
    # overlaps transfers with compute; RTF here measures compute.
    for batch in (24, 16, 8):
        wavs = jax.device_put(
            rng.standard_normal((batch, length)).astype(np.float32) * 0.05)
        try:
            out = np.asarray(enhance(params, wavs))  # compile + warm
            break
        except Exception as e:
            print(f"batch {batch} failed ({type(e).__name__}); "
                  "falling back", file=sys.stderr)
    else:
        raise RuntimeError("all benchmark batch sizes failed")
    assert np.all(np.isfinite(out))
    # XLA cost analysis reports NO flops for Pallas custom calls, so the
    # fused sub-band LSTM recurrence — the model's dominant compute — is
    # invisible to it (verified: cost_analysis of the pure kernel returns
    # none). Add it analytically: 2 layers x 2 FLOP/MAC x T x (B*F rows,
    # full band at inference) x H x 4H.
    i_frames = length // 256 + 1 + config.look_ahead
    def _lstm_fwd_flops(rows, frames):
        h = config.sb_model_hidden_size
        return 2 * 2.0 * frames * rows * h * 4 * h
    infer_flops_xla = _compiled_flops(enhance, params, wavs)
    infer_flops = (infer_flops_xla
                   + _lstm_fwd_flops(batch * config.num_freqs, i_frames)
                   if infer_flops_xla else None)

    iters, windows = 10, 8
    elapsed, elapsed_med = _best_window(
        lambda _: enhance(params, wavs),
        lambda last: np.asarray(last[0, :8]), iters, windows)

    audio_seconds = iters * batch * clip_seconds
    rtf_x = audio_seconds / elapsed  # x real-time per chip
    ms_per_call = elapsed / iters * 1e3
    peak = _peak_flops(jax.devices()[0])
    mfu = (infer_flops / (elapsed / iters) / peak
           if infer_flops else None)

    # ---- full-size training step (VERDICT r1 item 7) --------------------
    # B=18 x 3 s clips -> T ~= 188 frames, B.F = 18*257 ~= 4.6k sub-band
    # sequences — the reference's DNS training shape (SURVEY.md section 3.1).
    from generative_audio_tpu.train.enhance import (
        EnhanceTrainConfig, init_enhance_state, make_enhance_train_step)
    tcfg = EnhanceTrainConfig(model=FullSubNetPlusConfig(
        num_groups_in_drop_band=2))
    state = init_enhance_state(tcfg, jax.random.PRNGKey(1))
    train_step = make_enhance_train_step(tcfg, donate=True)
    tb, tlen = 18, 3 * sr
    clean = rng.standard_normal((tb, tlen)).astype(np.float32) * 0.05
    noisy = clean + 0.02 * rng.standard_normal((tb, tlen)).astype(np.float32)
    noisy, clean = jax.device_put(noisy), jax.device_put(clean)
    state, loss = train_step(state, noisy, clean)    # compile + warm
    assert np.isfinite(float(loss))
    # fwd+bwd ~= 3x forward FLOPs; scale the measured inference XLA cost
    # analysis by the train/infer (batch x frames) ratio rather than
    # AOT-lowering the train step (which would recompile it, ~10 min on
    # the tunnel), and add the Pallas recurrence analytically with the
    # training rows (drop_band G=2 halves the sub-band batch; the scaled
    # XLA part slightly overcounts the sb projections for the same reason
    # — a conservative estimate).
    t_frames = tlen // tcfg.hop_length + 1 + tcfg.model.look_ahead
    train_flops = (3.0 * (
        infer_flops_xla * (tb * t_frames) / (batch * i_frames)
        + _lstm_fwd_flops(tb * tcfg.model.num_freqs
                          // tcfg.model.num_groups_in_drop_band, t_frames))
        if infer_flops_xla else None)

    t_iters, t_windows = 3, 4
    holder = {"state": state}

    def one_step(_):
        holder["state"], loss = train_step(holder["state"], noisy, clean)
        return loss

    t_elapsed, t_elapsed_med = _best_window(
        one_step, lambda last: float(last), t_iters, t_windows)
    train_ms = t_elapsed / t_iters * 1e3

    baseline_target = 10.0           # BASELINE.md: >=10x real-time per chip
    print(json.dumps({
        "metric": "fullsubnet_plus_enhancement_realtime_factor",
        "value": round(rtf_x, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf_x / baseline_target, 3),
        "rtf": round(rtf_x, 2),
        "rtf_median_window": round(audio_seconds / elapsed_med, 2),
        "ms_per_call": round(ms_per_call, 3),
        "ms_per_call_median": round(elapsed_med / iters * 1e3, 3),
        "batch": batch,
        "clip_seconds": clip_seconds,
        "flops_per_call": infer_flops,
        "flops_per_call_xla_only": infer_flops_xla,
        "mfu_est": round(mfu, 5) if mfu is not None else None,
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "train_ms_per_step": round(train_ms, 2),
        "train_ms_per_step_median": round(t_elapsed_med / t_iters * 1e3, 2),
        "train_batch": tb,
        "train_clip_seconds": 3,
        "train_flops_per_step_est": train_flops,
        "train_mfu_est": (round(train_flops / (t_elapsed / t_iters) / peak, 5)
                          if train_flops else None),
    }))


if __name__ == "__main__":
    main()
