"""Decompose the full-size train step on the real chip.

Times, at bench's training shape (B=18, 3.072 s clips, full-size model,
drop_band G=2):
  floor     — trivial jit dispatch latency
  loss_fwd  — enhance_loss_fn forward only
  grad      — jax.value_and_grad(enhance_loss_fn)
  step      — full train step (grad + clip + adam update)

grad - loss_fwd isolates the backward; step - grad isolates the optimizer.
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

from _perf_common import timed as _timed

from generative_audio_tpu.train.enhance import (
    EnhanceTrainConfig, make_enhance_train_step, init_enhance_state,
    enhance_loss_fn)

B = 18
L = 49152          # 3.072 s @ 16 kHz — bench.py's train shape
REPS = int(os.environ.get("PD_REPS", "8"))


def timed(name, fn, *args):
    return _timed(name, fn, *args, reps=REPS, width=10)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = EnhanceTrainConfig()
    key = jax.random.PRNGKey(0)
    noisy = jax.random.normal(key, (B, L), jnp.float32) * 0.1
    clean = noisy + jax.random.normal(jax.random.PRNGKey(1),
                                      (B, L), jnp.float32) * 0.01

    state = init_enhance_state(cfg, jax.random.PRNGKey(2))
    step_fn = make_enhance_train_step(cfg, donate=False)

    results = [timed("floor", jax.jit(lambda x: x + 1.0),
                     jnp.zeros((8,), jnp.float32))]

    loss_fn = jax.jit(lambda p, n, c: enhance_loss_fn(p, n, c, cfg, None))
    results.append(timed("loss_fwd", loss_fn, state.params, noisy, clean))

    grad_fn = jax.jit(lambda p, n, c: jax.value_and_grad(enhance_loss_fn)(
        p, n, c, cfg, None))
    results.append(timed("grad", grad_fn, state.params, noisy, clean))

    results.append(timed("step", step_fn, state, noisy, clean))

    import json
    print(json.dumps(dict(results)), flush=True)


if __name__ == "__main__":
    main()
