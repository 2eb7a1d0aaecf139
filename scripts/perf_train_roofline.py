"""Full-size train-step roofline decomposition on the real chip.

Times each component of the FullSubNet+ train step in ISOLATION (its own
jit, representative shapes), forward-only and forward+backward, plus the
optimizer update and the whole-step reference numbers. Writes the JSON
breakdown docs/PERF.md is built from.

Train shape (bench.py): B=18, 3.072 s clips @ 16 kHz, n_fft 512/hop 256
=> T=193 frames (195 model-internal with look_ahead 2), F=257,
drop_band G=2 => F'=128, sub-band rows B*F'=2304, sb channels 34.

Caveats the numbers carry:
  * isolated components re-pay HBM boundary traffic the fused step fuses
    away, so the parts sum to MORE than the whole — the split shows the
    RATIO of where time goes, the fused `step` row is the ground truth;
  * fwd+bwd rows time jax.grad of a scalar reduction of the component
    (that includes its forward);
  * the gradient all-reduce is unmeasurable on one chip; on a mesh it
    overlaps the backward (XLA schedules it) — see docs/PERF.md.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_train_roofline.py
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from _perf_common import timed as _timed

from generative_audio_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from generative_audio_tpu.nn.recurrent import SequenceModel
from generative_audio_tpu.nn.attention import make_channel_attention
from generative_audio_tpu.ops.subband import band_unfold, drop_band
from generative_audio_tpu.ops.norms import get_norm
from generative_audio_tpu.ops.stft import stft_ri
from generative_audio_tpu.ops.mask import build_complex_ideal_ratio_mask_ri
from generative_audio_tpu.train.enhance import (
    EnhanceTrainConfig, make_enhance_train_step, init_enhance_state,
    enhance_loss_fn)

B = 18
L = 49152                       # 3.072 s @ 16 kHz
F, G = 257, 2
T = L // 256 + 1                # 193 (model-internal 195 w/ look_ahead)
TI = T + 2
FP = F // G                     # 128 after drop_band
SB_ROWS = B * FP                # 2304
SB_CH = 34                      # sb_w 31 + 3 fb_w
REPS = int(os.environ.get("PD_REPS", "8"))

results = {}


def timed(name, fn, *args):
    n, ms = _timed(name, fn, *args, reps=REPS, width=16)
    results[n] = ms
    return n, ms


def grad_of(fn):
    """Scalar-reduce fn's output and grad wrt its FIRST (params) arg."""
    return jax.grad(lambda p, *a: jnp.sum(fn(p, *a)) * 1e-6)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = FullSubNetPlusConfig()
    tcfg = EnhanceTrainConfig()
    key = jax.random.PRNGKey(0)
    compute = jnp.bfloat16 if tcfg.compute_dtype == "bfloat16" else jnp.float32

    # ---------------- whole-step references -------------------------------
    noisy = jax.random.normal(key, (B, L), jnp.float32) * 0.1
    clean = noisy + jax.random.normal(jax.random.PRNGKey(1),
                                      (B, L), jnp.float32) * 0.01
    state = init_enhance_state(tcfg, jax.random.PRNGKey(2))
    step_fn = make_enhance_train_step(tcfg, donate=False)

    timed("floor", jax.jit(lambda x: x + 1.0), jnp.zeros((8,), jnp.float32))

    loss_fn = jax.jit(lambda p, n, c: enhance_loss_fn(p, n, c, tcfg, None))
    timed("loss_fwd", loss_fn, state.params, noisy, clean)
    grad_fn = jax.jit(lambda p, n, c: jax.value_and_grad(enhance_loss_fn)(
        p, n, c, tcfg, None))
    timed("grad", grad_fn, state.params, noisy, clean)
    timed("step", step_fn, state, noisy, clean)

    # ---------------- data/target build (no params; fwd only) -------------
    def targets(noisy, clean):
        nr, ni = stft_ri(noisy, 512, 256, 512)
        cr, ci = stft_ri(clean, 512, 256, 512)
        mag = jnp.sqrt(nr ** 2 + ni ** 2)
        gt = build_complex_ideal_ratio_mask_ri(nr, ni, cr, ci)
        gt = drop_band(jnp.transpose(gt, (0, 3, 1, 2)), G)
        return mag, gt
    timed("stft_targets", jax.jit(targets), noisy, clean)

    # ---------------- attention + norm (one of three streams) -------------
    norm = get_norm(cfg.norm_type)
    mag4 = jax.random.normal(key, (B, 1, F, TI), jnp.float32)

    class Att(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x):
            att = make_channel_attention(cfg.channel_attention_model,
                                         cfg.num_channels, cfg.kersize,
                                         cfg.subband_num, name="att")
            b, ch, f, t = x.shape
            return att(norm(x).reshape(b, ch * f, t))
    att = Att()
    att_vars = jax.jit(att.init)(jax.random.PRNGKey(3), mag4)
    att_apply = lambda p, x: att.apply(p, x)                      # noqa: E731
    timed("attn_fwd", jax.jit(att_apply), att_vars, mag4)
    timed("attn_fwd_bwd", jax.jit(grad_of(att_apply)), att_vars, mag4)

    # ---------------- one full-band TCN tower ------------------------------
    fb = SequenceModel(input_size=F, output_size=F,
                       hidden_size=cfg.fb_model_hidden_size, num_layers=2,
                       bidirectional=False, sequence_model="TCN",
                       output_activate_function="ReLU",
                       compute_dtype=compute)
    fb_in = jax.random.normal(key, (B, F, TI), jnp.float32)
    fb_vars = jax.jit(fb.init)(jax.random.PRNGKey(4), fb_in)
    fb_apply = lambda p, x: fb.apply(p, x)                        # noqa: E731
    timed("fb_tcn_fwd", jax.jit(fb_apply), fb_vars, fb_in)
    timed("fb_tcn_fwd_bwd", jax.jit(grad_of(fb_apply)), fb_vars, fb_in)

    # ---------------- band unfold + concat + norm + drop_band -------------
    fb_out = jax.random.normal(key, (B, 1, F, TI), jnp.float32)

    def unfold(fb_o, mag):
        fb_w = cfg.fb_num_neighbors * 2 + 1
        sb_w = cfg.sb_num_neighbors * 2 + 1
        parts = [band_unfold(mag, cfg.sb_num_neighbors
                             ).reshape(B, F, sb_w, TI)]
        for _ in range(3):
            parts.append(band_unfold(fb_o, cfg.fb_num_neighbors
                                     ).reshape(B, F, fb_w, TI))
        sb = norm(jnp.concatenate(parts, axis=2))
        sb = drop_band(jnp.transpose(sb, (0, 2, 1, 3)), G)
        return jnp.transpose(sb, (0, 2, 1, 3)).reshape(SB_ROWS, SB_CH, TI)
    timed("unfold_fwd", jax.jit(unfold), fb_out, mag4)
    timed("unfold_fwd_bwd",
          jax.jit(jax.grad(lambda a, b: jnp.sum(unfold(a, b)) * 1e-6)),
          fb_out, mag4)

    # ---------------- the sub-band LSTM (Pallas) ---------------------------
    sb = SequenceModel(input_size=SB_CH, output_size=cfg.output_size,
                       hidden_size=cfg.sb_model_hidden_size, num_layers=2,
                       bidirectional=False, sequence_model="LSTM",
                       output_activate_function=None,
                       compute_dtype=compute)
    sb_in = jax.random.normal(key, (SB_ROWS, SB_CH, TI), jnp.float32)
    sb_vars = jax.jit(sb.init)(jax.random.PRNGKey(5), sb_in)
    sb_apply = lambda p, x: sb.apply(p, x)                        # noqa: E731
    timed("sb_lstm_fwd", jax.jit(sb_apply), sb_vars, sb_in)
    timed("sb_lstm_fwd_bwd", jax.jit(grad_of(sb_apply)), sb_vars, sb_in)

    # ---------------- optimizer update alone -------------------------------
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def opt_update(state, grads):
        return state.apply_gradients(grads)
    timed("optimizer", jax.jit(opt_update), state, grads)

    out = Path(__file__).parent.parent / "artifacts" / "perf"
    out.mkdir(parents=True, exist_ok=True)
    (out / "train_roofline.json").write_text(json.dumps(
        {"shape": {"B": B, "L": L, "F": F, "T": T, "G": G,
                   "sb_rows": SB_ROWS, "sb_ch": SB_CH},
         "ms": results, "reps": REPS,
         "device": jax.devices()[0].device_kind}, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
