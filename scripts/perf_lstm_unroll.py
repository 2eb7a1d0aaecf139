"""Prototype: K-timestep-unrolled Pallas LSTM scan vs the current kernel.

Measures, at the FullSubNet+ sub-band layer shape (T=628, B_pad=2304,
H=384), the current _lstm_pallas_call (K=1) against a variant whose grid
step processes K timesteps (one [K, block_b, 4H] gate tile per DMA, K
unrolled recurrence steps in the kernel body) — amortizing per-grid-step
overhead without adding matmuls to the serial chain.
"""
import os
import sys
import time
import functools
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from _perf_common import timed as _timed

from generative_audio_tpu.ops.pallas_lstm import _lstm_pallas_call

T, B, H = 628, 2304, 384
REPS = 8


def _unroll_kernel(k_steps, gx_ref, whh_ref, out_ref, h_scratch, c_scratch):
    from jax.experimental import pallas as pl
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    hsz = whh_ref.shape[0]
    h = h_scratch[:]
    c = c_scratch[:]
    for k in range(k_steps):
        gates = gx_ref[k].astype(jnp.float32) + jnp.dot(
            h.astype(jnp.bfloat16), whh_ref[:],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hsz])
        f = jax.nn.sigmoid(gates[:, hsz:2 * hsz])
        g = jnp.tanh(gates[:, 2 * hsz:3 * hsz])
        o = jax.nn.sigmoid(gates[:, 3 * hsz:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[k] = h.astype(out_ref.dtype)
    h_scratch[:] = h
    c_scratch[:] = c


@functools.partial(jax.jit, static_argnames=("block_b", "block_t"))
def lstm_unrolled(gates_x_tm, w_hh, block_b=576, block_t=2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    assert t_len % block_t == 0 and b_pad % block_b == 0

    def time_map(b, t):
        return (t, b, 0)

    return pl.pallas_call(
        functools.partial(_unroll_kernel, block_t),
        grid=(b_pad // block_b, t_len // block_t),
        in_specs=[
            pl.BlockSpec((block_t, block_b, g4), time_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_b, hsz), time_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, hsz), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),
            pltpu.VMEM((block_b, hsz), jnp.float32),
        ],
    )(gates_x_tm, w_hh.astype(jnp.bfloat16))


def bench(name, fn, *args):
    return _timed(name, fn, *args, reps=REPS, width=24)[1] / 1e3


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    gates = (jax.random.normal(key, (T, B, 4 * H), jnp.bfloat16) * 0.1)
    w_hh = jax.random.normal(jax.random.PRNGKey(1), (H, 4 * H),
                             jnp.float32) * 0.05

    base = bench("current k=1 b=576",
                 lambda g, w: _lstm_pallas_call(g, w, block_b=576), gates, w_hh)

    # correctness probe for the unrolled variant
    ref = _lstm_pallas_call(gates, w_hh, block_b=576,
                            out_dtype=jnp.bfloat16)
    got = lstm_unrolled(gates, w_hh, block_b=576, block_t=2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"unroll-vs-current max|diff| = {err:.3e}", flush=True)

    for bb, bt in [(576, 2), (576, 4), (384, 4), (256, 8)]:
        if (T % bt) or (B % bb):
            continue
        bench(f"unroll b={bb} k={bt}",
              lambda g, w, bb=bb, bt=bt: lstm_unrolled(g, w, block_b=bb,
                                                       block_t=bt),
              gates, w_hh)
    print(f"baseline {base*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
