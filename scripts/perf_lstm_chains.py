"""Chains-within-block LSTM backward prototype — the paired A/B that
ops/pallas_lstm.py records as "measured once at -13%/-21%, 0% on repeat"
(round 2, never committed as code). VERDICT r3 item 8 asks for one more
paired run on a quiet chip, or formal closure in docs/PERF.md.

The idea: the backward block's serial chain alternates one MXU matmul
(gate recompute), a VPU gate-derivative block, and a second MXU matmul
(dgates @ W_hh^T). Splitting the batch block into N independent row
chunks ("chains") and issuing all chunk matmuls of a phase before any
chunk's VPU phase lets chunk B's MXU work overlap chunk A's VPU work.
Rows are independent, so the output is bit-identical to the production
kernel (same f32 accumulation per row).

    # correctness (CPU interpret mode, no chip needed)
    JAX_PLATFORMS=cpu python scripts/perf_lstm_chains.py --check
    # paired A/B on the chip (alternating, best-of-R, net of tunnel floor)
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_lstm_chains.py
"""
import argparse
import functools
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

from generative_audio_tpu.ops.pallas_lstm import (
    _lstm_pallas_call_bwd, _round_up)

# the recorded round-2 train shape for the sub-band backward
T, B, H = 194, 2560, 384
BLOCK_B = 512
REPS = 10


def _chains_bwd_kernel(n_chains, gx_ref, hprev_ref, c_ref, cprev_ref,
                       gout_ref, whh_ref, whht_ref, dgx_ref,
                       dh_scratch, dc_scratch):
    """Production _lstm_bwd_kernel with the block split into n_chains
    independent row chunks, phases batched: all gate-recompute matmuls,
    then all VPU derivative blocks, then all dh matmuls."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    t_len = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dc_scratch[:] = jnp.zeros_like(dc_scratch)

    first = (j == t_len - 1)
    hprev_bf = jnp.where(first, jnp.zeros_like(hprev_ref[0]), hprev_ref[0])
    c_prev_full = jnp.where(first, jnp.zeros_like(cprev_ref[0]),
                            cprev_ref[0]).astype(jnp.float32)

    hsz = whh_ref.shape[0]
    block_b = gx_ref.shape[1]
    # a non-dividing chain count would silently drop the tail rows of the
    # block — the mis-tile class the ops/pallas_lstm.py docstring warns
    # against; fail loudly instead
    assert block_b % n_chains == 0, (block_b, n_chains)
    cb = block_b // n_chains
    sls = [slice(k * cb, (k + 1) * cb) for k in range(n_chains)]

    # phase 1 — MXU: gate recompute per chain (no dh/dc dependency)
    gates = [gx_ref[0, sl].astype(jnp.float32) + jnp.dot(
        hprev_bf[sl], whh_ref[:], preferred_element_type=jnp.float32)
        for sl in sls]

    # phase 2 — VPU: gate derivatives per chain
    dgates = []
    for sl, gk in zip(sls, gates):
        i = jax.nn.sigmoid(gk[:, :hsz])
        f = jax.nn.sigmoid(gk[:, hsz:2 * hsz])
        g = jnp.tanh(gk[:, 2 * hsz:3 * hsz])
        o = jax.nn.sigmoid(gk[:, 3 * hsz:])
        tanh_c = jnp.tanh(c_ref[0, sl].astype(jnp.float32))
        dh_tot = gout_ref[0, sl].astype(jnp.float32) + dh_scratch[sl]
        dc_tot = dc_scratch[sl] + dh_tot * o * (1.0 - tanh_c * tanh_c)
        dgi = dc_tot * g * i * (1.0 - i)
        dgf = dc_tot * c_prev_full[sl] * f * (1.0 - f)
        dgg = dc_tot * i * (1.0 - g * g)
        dgo = dh_tot * tanh_c * o * (1.0 - o)
        dg = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dgates.append(dg)
        dgx_ref[0, sl] = dg.astype(dgx_ref.dtype)
        dc_scratch[sl] = dc_tot * f

    # phase 3 — MXU: dh for the next (earlier) step per chain
    for sl, dg in zip(sls, dgates):
        dh_scratch[sl] = jnp.dot(dg.astype(jnp.bfloat16), whht_ref[:],
                                 preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "n_chains", "interpret"))
def chains_bwd(gates_x_tm, h_seq, c_seq, gout, w_hh, block_b=BLOCK_B,
               n_chains=2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    def t_map(b, j, _t=t_len):
        return (_t - 1 - j, b, 0)

    def tprev_map(b, j, _t=t_len):
        return (jnp.maximum(_t - 2 - j, 0), b, 0)

    state_t = pl.BlockSpec((1, block_b, hsz), t_map, memory_space=pltpu.VMEM)
    state_prev = pl.BlockSpec((1, block_b, hsz), tprev_map,
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chains_bwd_kernel, n_chains),
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g4), t_map, memory_space=pltpu.VMEM),
            state_prev, state_t, state_prev, state_t,
            pl.BlockSpec((hsz, g4), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g4, hsz), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, g4), t_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, g4), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),
            pltpu.VMEM((block_b, hsz), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(gates_x_tm, h_seq, c_seq, c_seq, gout,
      w_hh.astype(jnp.bfloat16),
      jnp.transpose(w_hh, (1, 0)).astype(jnp.bfloat16))


def make_inputs(t_len, b, hsz, block_b, rng):
    b_pad = _round_up(b, block_b)
    gx = jnp.asarray(rng.standard_normal((t_len, b_pad, 4 * hsz)),
                     jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((t_len, b_pad, hsz)) * 0.1,
                    jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((t_len, b_pad, hsz)) * 0.1,
                    jnp.bfloat16)
    gout = jnp.asarray(rng.standard_normal((t_len, b_pad, hsz)),
                       jnp.bfloat16)
    whh = jnp.asarray(rng.standard_normal((hsz, 4 * hsz)) * 0.05,
                      jnp.float32)
    return gx, h, c, gout, whh


def check():
    """Bit-identity vs production, interpret mode (runs on CPU)."""
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    t_len, b, hsz, block_b = 6, 16, 8, 8
    gx, h, c, gout, whh = make_inputs(t_len, b, hsz, block_b, rng)
    ref = _lstm_pallas_call_bwd(gx, h, c, gout, whh, block_b=block_b,
                                interpret=True)
    for n in (2, 4):
        out = chains_bwd(gx, h, c, gout, whh, block_b=block_b,
                         n_chains=n, interpret=True)
        same = bool(jnp.all(out == ref))
        print(f"chains={n}: bit-identical to production = {same}")
        assert same
    print("CHECK OK")


def bench():
    rng = np.random.default_rng(0)
    gx, h, c, gout, whh = make_inputs(T, B, H, BLOCK_B, rng)

    # on-chip identity gate before any timing: a miscompiled variant must
    # not be allowed to "win"
    ref = np.asarray(_lstm_pallas_call_bwd(gx, h, c, gout, whh,
                                           block_b=BLOCK_B)[:2, :4, :8])
    for n in (2, 4):
        got = np.asarray(chains_bwd(gx, h, c, gout, whh, block_b=BLOCK_B,
                                    n_chains=n)[:2, :4, :8])
        assert np.array_equal(ref, got), f"chains{n} output mismatch"
    print("on-chip identity spot-check OK")

    floor_fn = jax.jit(lambda x: x * 2 + 1)
    floor_in = jnp.ones((8, 8))

    def timed(fn):
        out = fn()
        np.asarray(out[0, :1, :8])          # true device barrier
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            out = fn()
            np.asarray(out[0, :1, :8])
            best = min(best, time.time() - t0)
        return best

    def floor():
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            np.asarray(floor_fn(floor_in)[0, :2])
            best = min(best, time.time() - t0)
        return best

    arms = {"prod": lambda: _lstm_pallas_call_bwd(
        gx, h, c, gout, whh, block_b=BLOCK_B)}
    for n in (2, 4):
        arms[f"chains{n}"] = functools.partial(
            chains_bwd, gx, h, c, gout, whh, BLOCK_B, n)

    # alternate arms back-to-back, 3 rounds, floor-sampled each round
    results = {k: [] for k in arms}
    floors = []
    for r in range(3):
        floors.append(floor())
        for k, fn in arms.items():
            results[k].append(timed(fn))
    fl = float(np.median(floors))
    print(f"tunnel floor (median of {len(floors)}): {fl * 1e3:.1f} ms")
    prod_net = min(results["prod"]) - fl
    for k, v in results.items():
        net = min(v) - fl
        rel = (net - prod_net) / prod_net * 100
        print(f"{k}: best {min(v) * 1e3:.1f} ms  net {net * 1e3:.1f} ms  "
              f"({rel:+.1f}% vs prod)  rounds "
              f"{[f'{x * 1e3:.1f}' for x in v]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        check()
    else:
        bench()
