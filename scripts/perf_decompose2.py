"""Stage-2 decomposition: inside the FullSubNetPlus forward.

Times, at bench shapes (B=8, 10 s, F=257, T=628 incl. look_ahead pad):
  floor      — a trivial jit (x+1 on 8 floats): tunnel dispatch latency
  attention  — one MulCA (TSSE) attention block + offline_laplace_norm
  fb_tower_x1— one full-band TCN tower [B, F, T] -> [B, F, T]
  unfold     — band_unfold x4 + concat + norm (the sub-band feature build)
  sb_lstm    — the 2-layer sub-band LSTM + FC on [B*F, 34, T]
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

from generative_audio_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from generative_audio_tpu.nn.recurrent import SequenceModel
from generative_audio_tpu.nn.attention import make_channel_attention
from generative_audio_tpu.ops.subband import band_unfold
from generative_audio_tpu.ops.norms import get_norm

B, F, T = 8, 257, 628
REPS = int(os.environ.get("PD_REPS", "8"))


def timed(name, fn_j, *args):
    return _timed(name, fn_j, *args, reps=REPS)


def main():
    cfg = FullSubNetPlusConfig()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    mag4 = jax.random.normal(jax.random.PRNGKey(0), (B, 1, F, T), jnp.float32)
    norm = get_norm(cfg.norm_type)

    results = []

    floor_in = jnp.zeros((8,), jnp.float32)
    results.append(timed("floor", jax.jit(lambda x: x + 1.0), floor_in))

    att = make_channel_attention(cfg.channel_attention_model,
                                 cfg.num_channels, cfg.kersize,
                                 cfg.subband_num)
    x3 = mag4[:, 0]
    att_vars = jax.jit(att.init)(jax.random.PRNGKey(1), x3)

    def att_fwd(v, x4):
        return att.apply(v, norm(x4).reshape(B, F, T))
    results.append(timed("attention", jax.jit(att_fwd), att_vars, mag4))

    fb = SequenceModel(input_size=F, output_size=F,
                       hidden_size=cfg.fb_model_hidden_size, num_layers=2,
                       bidirectional=False, sequence_model="TCN",
                       output_activate_function="ReLU")
    fb_vars = jax.jit(fb.init)(jax.random.PRNGKey(2), x3)
    results.append(timed("fb_tower_x1",
                         jax.jit(lambda v, x: fb.apply(v, x)), fb_vars, x3))

    sb_w = 2 * cfg.sb_num_neighbors + 1
    fb_w = 2 * cfg.fb_num_neighbors + 1

    def do_unfold(x4):
        mag_unf = band_unfold(x4, cfg.sb_num_neighbors).reshape(B, F, sb_w, T)
        unfs = [band_unfold(x4, cfg.fb_num_neighbors).reshape(B, F, fb_w, T)
                for _ in range(3)]
        cat = jnp.concatenate([mag_unf] + unfs, axis=2)
        return norm(cat).reshape(B * F, sb_w + 3 * fb_w, T)
    results.append(timed("unfold", jax.jit(do_unfold), mag4))

    w = sb_w + 3 * fb_w
    sb_in = jax.random.normal(jax.random.PRNGKey(3), (B * F, w, T),
                              jnp.float32)
    sb = SequenceModel(input_size=w, output_size=2,
                       hidden_size=cfg.sb_model_hidden_size, num_layers=2,
                       bidirectional=False,
                       sequence_model=cfg.sequence_model,
                       output_activate_function=None)
    sb_vars = jax.jit(sb.init)(jax.random.PRNGKey(4), sb_in)
    results.append(timed("sb_lstm", jax.jit(sb.apply), sb_vars, sb_in))

    print(json.dumps(dict(results)), flush=True)


if __name__ == "__main__":
    main()
