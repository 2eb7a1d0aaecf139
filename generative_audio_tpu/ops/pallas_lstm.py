"""Pallas fused LSTM scan — the sub-band model's hot loop on TPU.

The FullSubNet+ sub-band LSTM runs B*F (~2k) sequences of ~200-600 frames
through 2 LSTM layers (SURVEY.md §3.1 hot loops). The lax.scan reference
implementation materializes the hoisted input projection [B, T, 4H] in fp32
(~8 GB at 10 s inference shapes — OOMs one chip) and re-reads it every step.

This kernel:
  * is TIME-MAJOR end-to-end ([T, B, 4H] gates in bf16, [T, B, H] out):
    the projection einsum writes time-major directly, so no multi-GB
    transpose pass ever materializes (on the axon tunnel backend a
    standalone 4 GB transpose measured 50 s; fused, the whole layer is
    ~37 ms),
  * keeps h and c resident in VMEM scratch (fp32) across the whole time
    loop — they never touch HBM,
  * runs the per-step [Bb, H] x [H, 4H] recurrence matmul on the MXU fused
    with the gate nonlinearities (VPU) in one pipeline stage,
  * grid = (batch_blocks, T): T iterates fastest (sequential semantics);
    Pallas double-buffers the per-step gate-tile DMA against compute,
  * supports reverse scans via reversed index maps (bidirectional LSTMs
    without flipping the gate buffer in HBM).

Training support: `lstm_scan_tm`/`gru_scan_tm` carry custom VJPs backed by
dedicated Pallas BACKWARD kernels (round-2 upgrade; the round-1 backward
rematerialized through lax.scan, which saved multi-GB fp32 residuals and
re-ran the forward):
  * the train-mode forward additionally streams the cell/hidden state
    sequence to HBM in bf16 (the only residual the backward needs beyond
    the inputs),
  * the backward kernel sweeps time in reverse with dh/dc carried in VMEM
    scratch and recomputes the gate pre-activations with one MXU matmul
    (cheaper than storing [T, B, 4H] activations) — two MXU matmuls per
    step, zero fp32 residual traffic. dW_hh is contracted OUTSIDE the
    kernel from the streamed dgates x h_seq in one near-peak MXU matmul
    (removes one of three matmuls from the serial latency-bound chain and
    drops the kernel's scoped VMEM back under Mosaic's 16 MB default;
    back-to-back full-size train-step A/B on the shared chip measured
    58.8/62.6 ms net-of-tunnel-floor vs 61.2 ms for the in-kernel
    accumulation — neutral-to-better under the ~7x run variance, kept for
    the shorter serial chain and VMEM headroom).

Long sequences / oversize batches: `lstm_layer_tm_chunked` runs the SAME
kernel over time-chunks with a carry-in/carry-out variant, hoisting the
projection one ~2 GB slab at a time — bit-identical to the un-chunked path
(bf16 gates either way) at ~t_chunk/T of the gates HBM. nn.recurrent
switches to it automatically above a working-set threshold; measured on
v5e it costs ~4% at the batch-24 x 10 s bench shape (so the fast path
keeps the single-kernel route) and turns the formerly-OOM 60 s x batch-8
serving shape into a 1547x compute-RTF / 234x end-to-end-serving program
(scripts/perf_batch_sweep.py, scripts/perf_serving.py PS_SECONDS=60;
numbers recorded in CLAUDE.md).

Layout notes: gates are in torch order (i, f, g, o) to match
nn.recurrent.LSTMLayer's fused weights.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["lstm_scan_tm", "lstm_scan_reference_tm", "lstm_layer_tm",
           "lstm_layer_tm_chunked", "gru_layer_tm_chunked",
           "gru_scan_tm", "gru_scan_reference_tm", "pallas_available"]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# Trace-time switch between the dedicated Pallas backward kernels and the
# round-1 lax.scan rematerialization backward — kept for A/B benchmarking
# and as an escape hatch (GAT_PALLAS_BACKWARD=0 env or assign directly).
# Read when a grad is traced, not per call. Measured full-size train step
# (B=18 x 3 s, scripts/perf_train_decompose.py, net of the ~30-40 ms tunnel
# floor): Pallas backward 59-63 ms vs scan-remat 160 ms — ~2.6x.
import os as _os
USE_PALLAS_BACKWARD = _os.environ.get("GAT_PALLAS_BACKWARD", "1") != "0"


def lstm_scan_reference_tm(gates_x: jnp.ndarray, w_hh: jnp.ndarray,
                           reverse: bool = False,
                           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """lax.scan LSTM recurrence over hoisted time-major gates.
    gates_x [T, B, 4H], w_hh [H, 4H] -> h sequence [T, B, H] fp32."""
    h_size = w_hh.shape[0]
    b = gates_x.shape[1]
    w_hh_c = w_hh.astype(compute_dtype)

    def step(carry, gx):
        h_prev, c_prev = carry
        gates = gx.astype(jnp.float32) + jnp.matmul(
            h_prev.astype(compute_dtype), w_hh_c,
            preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h_new, c), h_new

    init = (jnp.zeros((b, h_size), jnp.float32),
            jnp.zeros((b, h_size), jnp.float32))
    _, ys = jax.lax.scan(step, init, gates_x, reverse=reverse)
    return ys


def _lstm_cell_update(gates, c_prev):
    """Shared LSTM gate math (torch order i,f,g,o): fp32 gates [B, 4H] +
    fp32 c_prev [B, H] -> (h_new, c). ONE implementation so the plain /
    carry / train kernel variants stay bit-identical by construction."""
    hsz = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :hsz])
    f = jax.nn.sigmoid(gates[:, hsz:2 * hsz])
    g = jnp.tanh(gates[:, 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(gates[:, 3 * hsz:])
    c = f * c_prev + i * g
    return o * jnp.tanh(c), c


def _lstm_kernel(gx_ref, whh_ref, out_ref, h_scratch, c_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        h_scratch[:].astype(jnp.bfloat16), whh_ref[:],
        preferred_element_type=jnp.float32)
    h_new, c = _lstm_cell_update(gates, c_scratch[:])
    c_scratch[:] = c
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "out_dtype", "reverse"))
def _lstm_pallas_call(gates_x_tm: jnp.ndarray, w_hh: jnp.ndarray,
                      block_b: int = 256, interpret: bool = False,
                      out_dtype=jnp.bfloat16, reverse: bool = False):
    """gates_x_tm: [T, B_padded, 4H] bf16 -> [T, B_padded, H] out_dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    return pl.pallas_call(
        _lstm_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g4), time_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, hsz), time_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, hsz), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),   # h state
            pltpu.VMEM((block_b, hsz), jnp.float32),   # c state
        ],
        interpret=interpret,
    )(gates_x_tm, w_hh.astype(jnp.bfloat16))


def _lstm_train_kernel(gx_ref, whh_ref, out_ref, c_out_ref,
                       h_scratch, c_scratch):
    """Forward step that also streams the cell state (bf16) — the residual
    the Pallas backward needs."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        h_scratch[:].astype(jnp.bfloat16), whh_ref[:],
        preferred_element_type=jnp.float32)
    h_new, c = _lstm_cell_update(gates, c_scratch[:])
    c_scratch[:] = c
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)
    c_out_ref[0] = c.astype(c_out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "reverse"))
def _lstm_pallas_call_train(gates_x_tm, w_hh, block_b=256, interpret=False,
                            reverse=False):
    """Train-mode forward: [T, B_pad, 4H] bf16 -> (h_seq, c_seq) bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    state_spec = pl.BlockSpec((1, block_b, hsz), time_map,
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lstm_train_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g4), time_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(state_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b_pad, hsz), jnp.bfloat16),
            jax.ShapeDtypeStruct((t_len, b_pad, hsz), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),
            pltpu.VMEM((block_b, hsz), jnp.float32),
        ],
        interpret=interpret,
    )(gates_x_tm, w_hh.astype(jnp.bfloat16))


def _lstm_bwd_kernel(gx_ref, hprev_ref, c_ref, cprev_ref, gout_ref,
                     whh_ref, whht_ref, dgx_ref,
                     dh_scratch, dc_scratch):
    """One reverse-time step of the LSTM backward.

    Grid iterates j = 0..T-1 over forward-scan positions p = T-1-j (last
    processed step first); the index maps translate p to array time. dh/dc
    ride in VMEM scratch. Two MXU matmuls per step: gate recompute and
    dgates @ W_hh^T. dW_hh is NOT accumulated here — since gates =
    gates_x + h_prev @ W_hh, the streamed dgates output doubles as the
    W_hh cotangent factor, and the caller contracts h_seq against it in
    ONE near-peak MXU matmul outside the serial chain.
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    t_len = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dc_scratch[:] = jnp.zeros_like(dc_scratch)

    # the first forward-processed step (j == T-1) had zero h/c state
    first = (j == t_len - 1)
    hprev_bf = jnp.where(first, jnp.zeros_like(hprev_ref[0]), hprev_ref[0])
    c_prev = jnp.where(first, jnp.zeros_like(cprev_ref[0]),
                       cprev_ref[0]).astype(jnp.float32)

    hsz = whh_ref.shape[0]
    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        hprev_bf, whh_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :hsz])
    f = jax.nn.sigmoid(gates[:, hsz:2 * hsz])
    g = jnp.tanh(gates[:, 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(gates[:, 3 * hsz:])
    tanh_c = jnp.tanh(c_ref[0].astype(jnp.float32))

    dh_tot = gout_ref[0].astype(jnp.float32) + dh_scratch[:]
    dc_tot = dc_scratch[:] + dh_tot * o * (1.0 - tanh_c * tanh_c)
    dgi = dc_tot * g * i * (1.0 - i)
    dgf = dc_tot * c_prev * f * (1.0 - f)
    dgg = dc_tot * i * (1.0 - g * g)
    dgo = dh_tot * tanh_c * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)

    dgx_ref[0] = dgates.astype(dgx_ref.dtype)
    dc_scratch[:] = dc_tot * f
    dh_scratch[:] = jnp.dot(dgates.astype(jnp.bfloat16), whht_ref[:],
                            preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "reverse"))
def _lstm_pallas_call_bwd(gates_x_tm, h_seq, c_seq, gout, w_hh,
                          block_b=256, interpret=False, reverse=False):
    """[T, B_pad, 4H] gates + residuals -> dgates [T, B_pad, 4H] bf16
    (the caller derives dW_hh from it with one big matmul)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    # j indexes forward-scan positions from the END: p = T-1-j.
    if reverse:
        # forward processed t descending: p-th processed step is t = T-1-p
        def t_map(b, j):
            return (j, b, 0)                     # t = T-1-p = j

        def tprev_map(b, j, _t=t_len):
            return (jnp.minimum(j + 1, _t - 1), b, 0)
    else:
        def t_map(b, j, _t=t_len):
            return (_t - 1 - j, b, 0)            # t = p

        def tprev_map(b, j, _t=t_len):
            return (jnp.maximum(_t - 2 - j, 0), b, 0)

    state_t = pl.BlockSpec((1, block_b, hsz), t_map, memory_space=pltpu.VMEM)
    state_prev = pl.BlockSpec((1, block_b, hsz), tprev_map,
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g4), t_map, memory_space=pltpu.VMEM),
            state_prev,                           # h_{prev}
            state_t,                              # c_t
            state_prev,                           # c_{prev}
            state_t,                              # dL/dh_t (upstream)
            pl.BlockSpec((hsz, g4), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g4, hsz), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, g4), t_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, g4), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),   # dh carried
            pltpu.VMEM((block_b, hsz), jnp.float32),   # dc carried
        ],
        # the full-size backward block (576 rows, H=384) sat just above
        # Mosaic's conservative 16 MB default before the dW_hh output was
        # hoisted out; keep the raised cap for headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(gates_x_tm, h_seq, c_seq, c_seq, gout,
      w_hh.astype(jnp.bfloat16),
      jnp.transpose(w_hh, (1, 0)).astype(jnp.bfloat16))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# per-block relative throughput, measured on-chip at the FullSubNet+
# sub-band shape (T=627, H=384): bigger blocks amortize the per-step matmul
# launch; tiny blocks underfill the MXU.
#
# Also measured and REJECTED (scripts/perf_lstm_unroll.py, v5e): a K-timestep
# unrolled kernel (one [K, block_b, 4H] gate tile per grid step, K recurrence
# steps in the body) — only +2.7% at K=2/block 576, VMEM-OOM at K=4/block 576
# (18.6 MB > 16 MB).
#
# Also measured and NOT integrated (round 2, train shape [T=194, B=2560]):
# "chains-within-block" — split the block into 2-8 independent chunks inside
# the kernel body, all recurrence matmuls issued before all VPU gate blocks,
# so chunk B's MXU work can overlap chunk A's VPU work. Bit-identical
# output. Forward: neutral (the fwd kernel already runs at ~80-100% of HBM
# speed-of-light at block 512, so there is nothing to overlap into).
# Backward: one paired run showed -13%/-21% (chains 2/4), the repeat showed
# 0% — inside the shared-chip variance band, expected value ~1-2 ms on a
# ~63 ms net train step. Not worth the kernel complexity until a quieter
# chip can confirm it. CLOSED round 4: the prototype now exists as code
# (scripts/perf_lstm_chains.py, bit-identical by interpret-mode and
# on-chip spot checks) and a 3-round alternating best-of-10 A/B net of
# the tunnel floor put chains2/chains4 within 0.1-0.2 ms of production
# (-3.5%/-2.4% of a ~4.7 ms net kernel) — the round-2 -13%/-21% reading
# was tunnel variance. Do not integrate. (A 2-blocks-per-grid-step variant of the same idea
# mis-tiles: n_blocks = b_pad // (2*block) silently drops the tail rows
# when b_pad is an odd multiple of block — don't resurrect that form.) The step is latency-bound on the recurrence matmul +
# gate VPU chain itself, not on grid/DMA overhead, consistent with the
# fused-projection rejection above. Stage decomposition at bench shapes
# (scripts/perf_decompose{,2}.py): tunnel dispatch floor ~36 ms/call;
# on-device, the sub-band LSTM is ~90% of model time and the model is ~100%
# of the fused pipeline (STFT/mask/iSTFT hide behind it), running at ~55% of
# the 197 TFLOP/s bf16 roofline — near speed-of-light for an exact serial
# LSTM at [2056 rows, T=628, H=384].
_BLOCK_EFFICIENCY = {128: 0.80, 256: 1.0, 384: 1.069, 512: 1.08, 576: 1.096}


def planned_batch(b: int, block_b: int = 576) -> int:
    """The batch size the kernels pad to internally. Callers that pad their
    INPUT (pre-projection, feature dim ~34) up to this and slice the output
    back skip the kernels' internal jnp.pad of the [T, B, 4H] gates buffer —
    a full-size HBM copy (3.8 GB at the inference shape, and the 2x-resident
    peak OOMs batch 16 at 10 s clips)."""
    return _round_up(b, _pick_block(b, block_b))


def _pick_block(b: int, block_b: int) -> int:
    """Batch block minimizing padded_rows / block_efficiency, capped at
    block_b (the caller's VMEM bound; the default cap of 576 admits the
    whole measured table)."""
    candidates = ([c for c in _BLOCK_EFFICIENCY if c <= block_b]
                  or [max(8, _round_up(min(block_b, b), 8))])
    best = min(candidates,
               key=lambda c: (_round_up(b, c) / _BLOCK_EFFICIENCY.get(c, 0.5),
                              -c))
    return min(best, _round_up(b, 8))


def _forward_pallas(gates_x, w_hh, reverse, block_b, interpret, out_dtype):
    t_len, b, g4 = gates_x.shape
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    gx = gates_x.astype(jnp.bfloat16)
    if b_pad != b:
        gx = jnp.pad(gx, ((0, 0), (0, b_pad - b), (0, 0)))
    out = _lstm_pallas_call(gx, w_hh, block_b=block, interpret=interpret,
                            out_dtype=out_dtype, reverse=reverse)
    return out[:, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def lstm_scan_tm(gates_x: jnp.ndarray, w_hh: jnp.ndarray,
                 reverse: bool = False, block_b: int = 576,
                 interpret: Optional[bool] = None,
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused LSTM recurrence, time-major: gates_x [T, B, 4H] (torch gate
    order, bias already added; bf16 preferred), w_hh [H, 4H] ->
    h sequence [T, B, H] in out_dtype.

    Forward runs the Pallas kernel on TPU (interpret mode elsewhere).
    Backward runs the dedicated Pallas backward kernel over streamed bf16
    h/c residuals; set USE_PALLAS_BACKWARD = False to A/B against the
    lax.scan rematerialization backward instead.
    """
    interp = (not pallas_available()) if interpret is None else interpret
    return _forward_pallas(gates_x, w_hh, reverse, block_b, interp,
                           out_dtype)


def _pad_batch(x, b_pad):
    b = x.shape[1]
    if b_pad == b:
        return x
    return jnp.pad(x, ((0, 0), (0, b_pad - b), (0, 0)))


def _lstm_fwd(gates_x, w_hh, reverse, block_b, interpret, out_dtype):
    """Train-mode forward: also streams the bf16 cell/hidden sequences —
    the only residuals the Pallas backward needs."""
    if not USE_PALLAS_BACKWARD:
        out = lstm_scan_tm(gates_x, w_hh, reverse, block_b, interpret,
                           out_dtype)
        return out, (gates_x, w_hh, None, None)
    interp = (not pallas_available()) if interpret is None else interpret
    b = gates_x.shape[1]
    block = _pick_block(b, block_b)
    gx = _pad_batch(gates_x.astype(jnp.bfloat16), _round_up(b, block))
    h_seq, c_seq = _lstm_pallas_call_train(gx, w_hh, block_b=block,
                                           interpret=interp, reverse=reverse)
    return h_seq[:, :b].astype(out_dtype), (gates_x, w_hh, h_seq, c_seq)


def _lstm_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    gates_x, w_hh, h_seq, c_seq = residuals
    if h_seq is None:      # round-1 scan-rematerialization backward
        _, vjp = jax.vjp(
            lambda gx, w: lstm_scan_reference_tm(gx.astype(jnp.float32), w,
                                                 reverse=reverse),
            gates_x, w_hh)
        dgx, dw = vjp(g.astype(jnp.float32))
        return dgx.astype(gates_x.dtype), dw
    interp = (not pallas_available()) if interpret is None else interpret
    b = gates_x.shape[1]
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    gx = _pad_batch(gates_x.astype(jnp.bfloat16), b_pad)
    gout = _pad_batch(g.astype(jnp.bfloat16), b_pad)
    dgx_pad = _lstm_pallas_call_bwd(
        gx, h_seq, c_seq, gout, w_hh, block_b=block, interpret=interp,
        reverse=reverse)
    dgx = dgx_pad[:, :b].astype(gates_x.dtype)
    # dW_hh = sum_t h_prev[t]^T @ dgates[t], with h_prev the hidden state
    # one step earlier in PROCESSING order (zero at the first processed
    # step, which therefore contributes nothing): one big MXU contraction
    # over (T-1)*B_pad rows instead of a matmul inside the serial kernel.
    # Padded batch rows have zero gates/gout -> zero dgates, so they drop
    # out of the contraction.
    if reverse:                     # processed t = T-1 .. 0
        h_prev, dg = h_seq[1:], dgx_pad[:-1]
    else:                           # processed t = 0 .. T-1
        h_prev, dg = h_seq[:-1], dgx_pad[1:]
    dwhh = jnp.einsum("tbh,tbg->hg", h_prev, dg,
                      preferred_element_type=jnp.float32)
    return dgx, dwhh.astype(w_hh.dtype)


lstm_scan_tm.defvjp(_lstm_fwd, _lstm_bwd)


# ---------------------------------------------------------------------------
# Fused-projection LSTM layer: x_t @ W_ih computed in-kernel per step —
# the [T, B, 4H] gates buffer never exists in HBM at all. Inputs are the
# raw time-major activations (bf16), 4x smaller than the gates.
# ---------------------------------------------------------------------------
def _lstm_layer_kernel(x_ref, wih_ref, whh_ref, bias_ref, out_ref,
                       h_scratch, c_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    gates = (jnp.dot(x_ref[0], wih_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(h_scratch[:].astype(jnp.bfloat16), whh_ref[:],
                       preferred_element_type=jnp.float32)
             + bias_ref[:])
    h_new, c = _lstm_cell_update(gates, c_scratch[:])
    c_scratch[:] = c
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "out_dtype", "reverse"))
def _lstm_layer_pallas_call(x_tm, w_ih, w_hh, bias, block_b=256,
                            interpret=False, out_dtype=jnp.bfloat16,
                            reverse=False):
    """x_tm [T, B_pad, F_pad] bf16; w_ih [F_pad, 4H]; -> [T, B_pad, H]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, f_pad = x_tm.shape
    g4 = w_ih.shape[1]
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    return pl.pallas_call(
        _lstm_layer_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, f_pad), time_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, hsz), time_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, hsz), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),
            pltpu.VMEM((block_b, hsz), jnp.float32),
        ],
        interpret=interpret,
    )(x_tm, w_ih.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
      bias.reshape(1, -1).astype(jnp.float32))


def _layer_forward(x_tm, w_ih, w_hh, bias, reverse, block_b, interpret,
                   out_dtype):
    t_len, b, f = x_tm.shape
    block = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, block)
    f_pad = _round_up(f, 128)
    x_p = x_tm.astype(jnp.bfloat16)
    if b_pad != b or f_pad != f:
        x_p = jnp.pad(x_p, ((0, 0), (0, b_pad - b), (0, f_pad - f)))
    w_p = w_ih if f_pad == f else jnp.pad(w_ih, ((0, f_pad - f), (0, 0)))
    out = _lstm_layer_pallas_call(x_p, w_p, w_hh, bias, block_b=block,
                                  interpret=interpret, out_dtype=out_dtype,
                                  reverse=reverse)
    return out[:, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def lstm_layer_tm(x_tm: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                  bias: jnp.ndarray, reverse: bool = False,
                  block_b: int = 256, interpret: Optional[bool] = None,
                  out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Whole LSTM layer, time-major, projection fused into the scan kernel:
    x_tm [T, B, F], w_ih [F, 4H], w_hh [H, 4H], bias [4H] -> [T, B, H].

    HBM traffic is x (bf16) + h-sequence out — the 4x-larger gate
    projections live only in VMEM. Under grad, the forward hoists the
    projection once and the backward runs the Pallas backward kernel
    (USE_PALLAS_BACKWARD = False falls back to a vjp through the lax.scan
    reference)."""
    interp = (not pallas_available()) if interpret is None else interpret
    return _layer_forward(x_tm, w_ih, w_hh, bias, reverse, block_b, interp,
                          out_dtype)


def _layer_reference(x_tm, w_ih, w_hh, bias, reverse):
    gates = jnp.einsum("tbf,fg->tbg", x_tm.astype(jnp.float32),
                       w_ih.astype(jnp.float32)) + bias
    return lstm_scan_reference_tm(gates, w_hh, reverse=reverse)


def _layer_fwd(x_tm, w_ih, w_hh, bias, reverse, block_b, interpret,
               out_dtype):
    """Train-mode layer forward: hoist the projection once (bf16) and run
    the scan train kernel so the backward gets its h/c residuals. The
    inference path (primal, not under grad) stays projection-fused."""
    if not USE_PALLAS_BACKWARD:
        out = lstm_layer_tm(x_tm, w_ih, w_hh, bias, reverse, block_b,
                            interpret, out_dtype)
        return out, (x_tm, w_ih, w_hh, bias, None, None, None)
    interp = (not pallas_available()) if interpret is None else interpret
    b = x_tm.shape[1]
    block = _pick_block(b, block_b)
    gates = jnp.einsum(
        "tbf,fg->tbg", x_tm.astype(jnp.bfloat16),
        w_ih.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32) + bias
    gx = _pad_batch(gates.astype(jnp.bfloat16), _round_up(b, block))
    h_seq, c_seq = _lstm_pallas_call_train(gx, w_hh, block_b=block,
                                           interpret=interp, reverse=reverse)
    return (h_seq[:, :b].astype(out_dtype),
            (x_tm, w_ih, w_hh, bias, gx, h_seq, c_seq))


def _layer_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    x_tm, w_ih, w_hh, bias, gx, h_seq, c_seq = residuals
    if gx is None:         # USE_PALLAS_BACKWARD=False: scan-remat backward
        _, vjp = jax.vjp(
            lambda x, wi, wh, bb: _layer_reference(
                x.astype(jnp.float32), wi, wh, bb, reverse),
            x_tm, w_ih, w_hh, bias)
        dx, dwi, dwh, db = vjp(g.astype(jnp.float32))
        return (dx.astype(x_tm.dtype), dwi.astype(w_ih.dtype),
                dwh.astype(w_hh.dtype), db.astype(bias.dtype))
    interp = (not pallas_available()) if interpret is None else interpret
    b = x_tm.shape[1]
    block = _pick_block(b, block_b)
    gout = _pad_batch(g.astype(jnp.bfloat16), _round_up(b, block))
    dgx_pad = _lstm_pallas_call_bwd(
        gx, h_seq, c_seq, gout, w_hh, block_b=block, interpret=interp,
        reverse=reverse)
    dgates = dgx_pad[:, :b]
    x_bf = x_tm.astype(jnp.bfloat16)
    dx = jnp.einsum("tbg,fg->tbf", dgates, w_ih.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dwi = jnp.einsum("tbf,tbg->fg", x_bf, dgates,
                     preferred_element_type=jnp.float32)
    db = jnp.sum(dgates.astype(jnp.float32), axis=(0, 1))
    # dW_hh from the streamed dgates (see _lstm_bwd): one big contraction,
    # padded rows contribute zero.
    if reverse:
        h_prev, dg_pad = h_seq[1:], dgx_pad[:-1]
    else:
        h_prev, dg_pad = h_seq[:-1], dgx_pad[1:]
    dwhh = jnp.einsum("tbh,tbg->hg", h_prev, dg_pad,
                      preferred_element_type=jnp.float32)
    return (dx.astype(x_tm.dtype), dwi.astype(w_ih.dtype),
            dwhh.astype(w_hh.dtype),
            db.reshape(bias.shape).astype(bias.dtype))


lstm_layer_tm.defvjp(_layer_fwd, _layer_bwd)


# ---------------------------------------------------------------------------
# Chunked-time LSTM layer: per-chunk hoisted projection + a carry-in/
# carry-out scan kernel. Same serial per-step work as lstm_scan_tm (the
# fused-projection rejection above does not apply — the projection is still
# ONE big MXU matmul per chunk), but the [T, B, 4H] gates buffer only ever
# exists one chunk at a time, so peak HBM drops by ~T/t_chunk. This is what
# lifts the batch>=24 x 10 s and the 60 s-clip OOM walls (CLAUDE.md: serving
# previously auto-halved the bucket batch there).
# ---------------------------------------------------------------------------
def _lstm_carry_kernel(t_len, gx_ref, h0_ref, c0_ref, whh_ref,
                       out_ref, hf_ref, cf_ref, h_scratch, c_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        h_scratch[:].astype(jnp.bfloat16), whh_ref[:],
        preferred_element_type=jnp.float32)
    h_new, c = _lstm_cell_update(gates, c_scratch[:])
    c_scratch[:] = c
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)

    @pl.when(t == t_len - 1)
    def _():
        hf_ref[:] = h_scratch[:]
        cf_ref[:] = c_scratch[:]


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "out_dtype", "reverse"))
def _lstm_pallas_call_carry(gates_x_tm, h0, c0, w_hh, block_b=256,
                            interpret=False, out_dtype=jnp.bfloat16,
                            reverse=False):
    """One chunk with explicit state: gates [T, B_pad, 4H], h0/c0
    [B_pad, H] fp32 -> (h_seq [T, B_pad, H], h_final, c_final fp32).

    reverse=True consumes the chunk back-to-front (h0/c0 are then the
    carries arriving from the LATER chunk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g4 = gates_x_tm.shape
    hsz = g4 // 4
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    def state_map(b, t):
        return (b, 0)

    state_spec = pl.BlockSpec((block_b, hsz), state_map,
                              memory_space=pltpu.VMEM)
    seq, h_f, c_f = pl.pallas_call(
        functools.partial(_lstm_carry_kernel, t_len),
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g4), time_map,
                         memory_space=pltpu.VMEM),
            state_spec, state_spec,
            pl.BlockSpec((hsz, g4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_b, hsz), time_map,
                         memory_space=pltpu.VMEM),
            state_spec, state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_pad, hsz), out_dtype),
            jax.ShapeDtypeStruct((b_pad, hsz), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, hsz), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, hsz), jnp.float32),
            pltpu.VMEM((block_b, hsz), jnp.float32),
        ],
        interpret=interpret,
    )(gates_x_tm, h0, c0, w_hh.astype(jnp.bfloat16))
    return seq, h_f, c_f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def lstm_layer_tm_chunked(x_tm: jnp.ndarray, w_ih: jnp.ndarray,
                          w_hh: jnp.ndarray, bias: jnp.ndarray,
                          reverse: bool = False, t_chunk: int = 128,
                          block_b: int = 576,
                          interpret: Optional[bool] = None,
                          out_dtype=jnp.bfloat16,
                          proj_dtype=None) -> jnp.ndarray:
    """Whole LSTM layer, time-major, time-CHUNKED hoisted projection:
    x_tm [T, B, F], w_ih [F, 4H], w_hh [H, 4H], bias [4H] -> [T, B, H].

    Numerically identical to the hoisted lstm_scan_tm path (same kernel
    math, same bf16 gate rounding) with ~t_chunk/T of its peak gates HBM.
    Under grad it falls back to the full hoisted projection + Pallas
    backward (training clips are short; chunking is a memory lever for
    long-clip/large-batch INFERENCE)."""
    interp = (not pallas_available()) if interpret is None else interpret
    t_len, b, _ = x_tm.shape
    hsz = w_hh.shape[0]
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    x_p = _pad_batch(x_tm, b_pad)
    # Projection dtype: bf16 on real TPU (matches the un-chunked path),
    # fp32 in interpret mode — or whatever the caller's compute dtype is
    # (proj_dtype), so chunked vs un-chunked are bit-comparable.
    pdt = (proj_dtype if proj_dtype is not None
           else (jnp.float32 if interp else jnp.bfloat16))
    h = jnp.zeros((b_pad, hsz), jnp.float32)
    c = jnp.zeros((b_pad, hsz), jnp.float32)
    starts = list(range(0, t_len, t_chunk))
    if reverse:          # carries flow from the later chunk backwards
        starts = starts[::-1]
    # Assemble via in-place dynamic-update-slice, NOT concatenate: concat
    # would keep every chunk buffer live until the final copy (~2x the
    # output in HBM); the sequential DUS chain updates one buffer in place.
    out = jnp.zeros((t_len, b_pad, hsz), out_dtype)
    for s in starts:
        e = min(s + t_chunk, t_len)
        gc = jnp.einsum(
            "tbf,fg->tbg", x_p[s:e].astype(pdt), w_ih.astype(pdt),
            preferred_element_type=jnp.float32) + bias
        # bf16 gates ALWAYS — exactly what _forward_pallas feeds the
        # un-chunked kernel, so the two paths are bit-comparable.
        seq, h, c = _lstm_pallas_call_carry(
            gc.astype(jnp.bfloat16), h, c, w_hh, block_b=block,
            interpret=interp, out_dtype=out_dtype, reverse=reverse)
        out = jax.lax.dynamic_update_slice(out, seq, (s, 0, 0))
    return out[:, :b]


def _chunked_fwd(x_tm, w_ih, w_hh, bias, reverse, t_chunk, block_b,
                 interpret, out_dtype, proj_dtype):
    return _layer_fwd(x_tm, w_ih, w_hh, bias, reverse, block_b, interpret,
                      out_dtype)


def _chunked_bwd(reverse, t_chunk, block_b, interpret, out_dtype,
                 proj_dtype, residuals, g):
    return _layer_bwd(reverse, block_b, interpret, out_dtype, residuals, g)


lstm_layer_tm_chunked.defvjp(_chunked_fwd, _chunked_bwd)


# ---------------------------------------------------------------------------
# GRU: same hoisted-gates + fused-scan design as the LSTM kernel.
# Torch gate order (r, z, n); the h-side candidate gate is r * (h @ W_hn +
# b_hn), so the h-side bias b_hh CANNOT be folded into the x-side gates —
# it rides along as a kernel input.
# ---------------------------------------------------------------------------
def gru_scan_reference_tm(gates_x: jnp.ndarray, w_hh: jnp.ndarray,
                          b_hh: jnp.ndarray, reverse: bool = False,
                          compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """lax.scan GRU recurrence over hoisted time-major gates.
    gates_x [T, B, 3H] (x @ W_ih + b_ih), w_hh [H, 3H], b_hh [3H] ->
    [T, B, H] fp32."""
    h_size = w_hh.shape[0]
    b = gates_x.shape[1]
    w_hh_c = w_hh.astype(compute_dtype)

    def step(h_prev, gx):
        gates_h = jnp.matmul(h_prev.astype(compute_dtype), w_hh_c,
                             preferred_element_type=jnp.float32) + b_hh
        xr, xz, xn = jnp.split(gx.astype(jnp.float32), 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h_prev
        return h_new, h_new

    _, ys = jax.lax.scan(step, jnp.zeros((b, h_size), jnp.float32),
                         gates_x, reverse=reverse)
    return ys


def _gru_cell_update(gx, gates_h, h_prev):
    """Shared GRU gate math (torch order r,z,n): fp32 x-side gates gx and
    h-side gates gates_h [B, 3H], h_prev [B, H] -> h_new. One
    implementation shared by the plain and carry kernels."""
    hsz = h_prev.shape[-1]
    r = jax.nn.sigmoid(gx[:, :hsz] + gates_h[:, :hsz])
    z = jax.nn.sigmoid(gx[:, hsz:2 * hsz] + gates_h[:, hsz:2 * hsz])
    n = jnp.tanh(gx[:, 2 * hsz:] + r * gates_h[:, 2 * hsz:])
    return (1.0 - z) * n + z * h_prev


def _gru_kernel(gx_ref, whh_ref, bhh_ref, out_ref, h_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h_prev = h_scratch[:]
    gates_h = jnp.dot(h_prev.astype(jnp.bfloat16), whh_ref[:],
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    h_new = _gru_cell_update(gx_ref[0].astype(jnp.float32), gates_h, h_prev)
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "out_dtype", "reverse"))
def _gru_pallas_call(gates_x_tm, w_hh, b_hh, block_b=256, interpret=False,
                     out_dtype=jnp.bfloat16, reverse=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g3 = gates_x_tm.shape
    hsz = g3 // 3
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    return pl.pallas_call(
        _gru_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g3), time_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, hsz), time_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b_pad, hsz), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, hsz), jnp.float32)],
        interpret=interpret,
    )(gates_x_tm, w_hh.astype(jnp.bfloat16),
      b_hh.reshape(1, -1).astype(jnp.float32))


def _gru_forward(gates_x, w_hh, b_hh, reverse, block_b, interpret, out_dtype):
    t_len, b, g3 = gates_x.shape
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    gx = gates_x.astype(jnp.bfloat16)
    if b_pad != b:
        gx = jnp.pad(gx, ((0, 0), (0, b_pad - b), (0, 0)))
    out = _gru_pallas_call(gx, w_hh, b_hh, block_b=block, interpret=interpret,
                           out_dtype=out_dtype, reverse=reverse)
    return out[:, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def gru_scan_tm(gates_x: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                reverse: bool = False, block_b: int = 576,
                interpret: Optional[bool] = None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused GRU recurrence, time-major: gates_x [T, B, 3H] (x-side gates
    incl. b_ih), w_hh [H, 3H], b_hh [3H] -> [T, B, H]."""
    interp = (not pallas_available()) if interpret is None else interpret
    return _gru_forward(gates_x, w_hh, b_hh, reverse, block_b, interp,
                        out_dtype)


def _gru_bwd_kernel(gx_ref, hprev_ref, gout_ref, whh_ref, whht_ref, bhh_ref,
                    dgx_ref, dwhh_ref, dbhh_ref, dh_scratch):
    """One reverse-time step of the GRU backward. The only residual is the
    hidden sequence (gates_h is recomputed with one MXU matmul); dh rides in
    VMEM scratch; dW_hh/db_hh accumulate into block-resident output refs."""
    from jax.experimental import pallas as pl
    from jax import lax

    j = pl.program_id(1)
    t_len = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dwhh_ref[0] = jnp.zeros_like(dwhh_ref[0])
        dbhh_ref[0] = jnp.zeros_like(dbhh_ref[0])

    first = (j == t_len - 1)
    hprev_bf = jnp.where(first, jnp.zeros_like(hprev_ref[0]), hprev_ref[0])
    h_prev = hprev_bf.astype(jnp.float32)

    hsz = whh_ref.shape[0]
    gates_h = jnp.dot(hprev_bf, whh_ref[:],
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    gx = gx_ref[0].astype(jnp.float32)
    hn = gates_h[:, 2 * hsz:]
    r = jax.nn.sigmoid(gx[:, :hsz] + gates_h[:, :hsz])
    z = jax.nn.sigmoid(gx[:, hsz:2 * hsz] + gates_h[:, hsz:2 * hsz])
    n = jnp.tanh(gx[:, 2 * hsz:] + r * hn)

    dh_tot = gout_ref[0].astype(jnp.float32) + dh_scratch[:]
    dn = dh_tot * (1.0 - z)
    dz = dh_tot * (h_prev - n)
    dxn = dn * (1.0 - n * n)          # wrt (xn + r*hn)
    dgr = dxn * hn * r * (1.0 - r)    # wrt (xr + hr)
    dgz = dz * z * (1.0 - z)          # wrt (xz + hz)
    dhn = dxn * r

    dgx_ref[0] = jnp.concatenate([dgr, dgz, dxn],
                                 axis=-1).astype(dgx_ref.dtype)
    dgates_h = jnp.concatenate([dgr, dgz, dhn], axis=-1)
    dg_bf = dgates_h.astype(jnp.bfloat16)
    dh_scratch[:] = jnp.dot(dg_bf, whht_ref[:],
                            preferred_element_type=jnp.float32) + dh_tot * z
    dwhh_ref[0] += lax.dot_general(
        hprev_bf, dg_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbhh_ref[0] += jnp.sum(dgates_h, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "reverse"))
def _gru_pallas_call_bwd(gates_x_tm, h_seq, gout, w_hh, b_hh,
                         block_b=256, interpret=False, reverse=False):
    """-> (dgates [T, B_pad, 3H] bf16, dW_hh [n_blocks, H, 3H] fp32,
    db_hh [n_blocks, 1, 3H] fp32) — block sums reduced by the caller."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g3 = gates_x_tm.shape
    hsz = g3 // 3
    n_blocks = b_pad // block_b

    if reverse:
        def t_map(b, j):
            return (j, b, 0)

        def tprev_map(b, j, _t=t_len):
            return (jnp.minimum(j + 1, _t - 1), b, 0)
    else:
        def t_map(b, j, _t=t_len):
            return (_t - 1 - j, b, 0)

        def tprev_map(b, j, _t=t_len):
            return (jnp.maximum(_t - 2 - j, 0), b, 0)

    return pl.pallas_call(
        _gru_bwd_kernel,
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g3), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hsz), tprev_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hsz), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hsz, g3), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3, hsz), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, g3), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hsz, g3), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g3), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b_pad, g3), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_blocks, hsz, g3), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, g3), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, hsz), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(gates_x_tm, h_seq, gout, w_hh.astype(jnp.bfloat16),
      jnp.transpose(w_hh, (1, 0)).astype(jnp.bfloat16),
      b_hh.reshape(1, -1).astype(jnp.float32))


def _gru_fwd(gates_x, w_hh, b_hh, reverse, block_b, interpret, out_dtype):
    if not USE_PALLAS_BACKWARD:
        out = gru_scan_tm(gates_x, w_hh, b_hh, reverse, block_b, interpret,
                          out_dtype)
        return out, (gates_x, w_hh, b_hh, None)
    interp = (not pallas_available()) if interpret is None else interpret
    b = gates_x.shape[1]
    block = _pick_block(b, block_b)
    gx = _pad_batch(gates_x.astype(jnp.bfloat16), _round_up(b, block))
    h_seq = _gru_pallas_call(gx, w_hh, b_hh, block_b=block, interpret=interp,
                             out_dtype=jnp.bfloat16, reverse=reverse)
    return h_seq[:, :b].astype(out_dtype), (gates_x, w_hh, b_hh, h_seq)


def _gru_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    gates_x, w_hh, b_hh, h_seq = residuals
    if h_seq is None:      # round-1 scan-rematerialization backward
        _, vjp = jax.vjp(
            lambda gx, w, b: gru_scan_reference_tm(
                gx.astype(jnp.float32), w, b, reverse=reverse),
            gates_x, w_hh, b_hh)
        dgx, dw, db = vjp(g.astype(jnp.float32))
        return dgx.astype(gates_x.dtype), dw, db
    interp = (not pallas_available()) if interpret is None else interpret
    b = gates_x.shape[1]
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    gx = _pad_batch(gates_x.astype(jnp.bfloat16), b_pad)
    gout = _pad_batch(g.astype(jnp.bfloat16), b_pad)
    dgx_pad, dwhh_blocks, dbhh_blocks = _gru_pallas_call_bwd(
        gx, h_seq, gout, w_hh, b_hh, block_b=block, interpret=interp,
        reverse=reverse)
    dgx = dgx_pad[:, :b].astype(gates_x.dtype)
    dwhh = jnp.sum(dwhh_blocks, axis=0).astype(w_hh.dtype)
    dbhh = jnp.sum(dbhh_blocks, axis=(0, 1)).reshape(
        b_hh.shape).astype(b_hh.dtype)
    return dgx, dwhh, dbhh


gru_scan_tm.defvjp(_gru_fwd, _gru_bwd)


# ---------------------------------------------------------------------------
# Chunked-time GRU layer — same design as lstm_layer_tm_chunked (see that
# section): per-chunk hoisted projection + carry-in/carry-out kernel, for
# long-clip / oversize-batch inference that would otherwise OOM on the
# [T, B, 3H] gates buffer.
# ---------------------------------------------------------------------------
def _gru_carry_kernel(t_len, gx_ref, h0_ref, whh_ref, bhh_ref,
                      out_ref, hf_ref, h_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h_prev = h_scratch[:]
    gates_h = jnp.dot(h_prev.astype(jnp.bfloat16), whh_ref[:],
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    h_new = _gru_cell_update(gx_ref[0].astype(jnp.float32), gates_h, h_prev)
    h_scratch[:] = h_new
    out_ref[0] = h_new.astype(out_ref.dtype)

    @pl.when(t == t_len - 1)
    def _():
        hf_ref[:] = h_scratch[:]


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "out_dtype", "reverse"))
def _gru_pallas_call_carry(gates_x_tm, h0, w_hh, b_hh, block_b=256,
                           interpret=False, out_dtype=jnp.bfloat16,
                           reverse=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, b_pad, g3 = gates_x_tm.shape
    hsz = g3 // 3
    n_blocks = b_pad // block_b

    if reverse:
        def time_map(b, t, _t=t_len):
            return (_t - 1 - t, b, 0)
    else:
        def time_map(b, t):
            return (t, b, 0)

    state_spec = pl.BlockSpec((block_b, hsz), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    seq, h_f = pl.pallas_call(
        functools.partial(_gru_carry_kernel, t_len),
        grid=(n_blocks, t_len),
        in_specs=[
            pl.BlockSpec((1, block_b, g3), time_map,
                         memory_space=pltpu.VMEM),
            state_spec,
            pl.BlockSpec((hsz, g3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_b, hsz), time_map,
                         memory_space=pltpu.VMEM),
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_pad, hsz), out_dtype),
            jax.ShapeDtypeStruct((b_pad, hsz), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, hsz), jnp.float32)],
        interpret=interpret,
    )(gates_x_tm, h0, w_hh.astype(jnp.bfloat16),
      b_hh.reshape(1, -1).astype(jnp.float32))
    return seq, h_f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def gru_layer_tm_chunked(x_tm: jnp.ndarray, w_ih: jnp.ndarray,
                         w_hh: jnp.ndarray, b_ih: jnp.ndarray,
                         b_hh: jnp.ndarray, reverse: bool = False,
                         t_chunk: int = 128, block_b: int = 576,
                         interpret: Optional[bool] = None,
                         out_dtype=jnp.bfloat16,
                         proj_dtype=None) -> jnp.ndarray:
    """Whole GRU layer, time-major, time-chunked hoisted projection:
    x_tm [T, B, F] -> [T, B, H]. Bit-identical to the gru_scan_tm path;
    see lstm_layer_tm_chunked for the memory rationale."""
    interp = (not pallas_available()) if interpret is None else interpret
    t_len, b, _ = x_tm.shape
    hsz = w_hh.shape[0]
    block = _pick_block(b, block_b)
    b_pad = _round_up(b, block)
    x_p = _pad_batch(x_tm, b_pad)
    pdt = (proj_dtype if proj_dtype is not None
           else (jnp.float32 if interp else jnp.bfloat16))
    h = jnp.zeros((b_pad, hsz), jnp.float32)
    starts = list(range(0, t_len, t_chunk))
    if reverse:
        starts = starts[::-1]
    out = jnp.zeros((t_len, b_pad, hsz), out_dtype)
    for s in starts:
        e = min(s + t_chunk, t_len)
        gc = jnp.einsum(
            "tbf,fg->tbg", x_p[s:e].astype(pdt), w_ih.astype(pdt),
            preferred_element_type=jnp.float32) + b_ih
        seq, h = _gru_pallas_call_carry(
            gc.astype(jnp.bfloat16), h, w_hh, b_hh, block_b=block,
            interpret=interp, out_dtype=out_dtype, reverse=reverse)
        out = jax.lax.dynamic_update_slice(out, seq, (s, 0, 0))
    return out[:, :b]


def _gru_chunked_fwd(x_tm, w_ih, w_hh, b_ih, b_hh, reverse, t_chunk,
                     block_b, interpret, out_dtype, proj_dtype):
    """Grad path: full hoisted projection + the gates-level Pallas fwd."""
    interp = (not pallas_available()) if interpret is None else interpret
    pdt = (proj_dtype if proj_dtype is not None
           else (jnp.float32 if interp else jnp.bfloat16))
    gates = jnp.einsum(
        "tbf,fg->tbg", x_tm.astype(pdt), w_ih.astype(pdt),
        preferred_element_type=jnp.float32) + b_ih
    out, res = _gru_fwd(gates.astype(pdt), w_hh, b_hh, reverse, block_b,
                        interpret, out_dtype)
    return out, (x_tm, w_ih, b_ih, res)


def _gru_chunked_bwd(reverse, t_chunk, block_b, interpret, out_dtype,
                     proj_dtype, residuals, g):
    x_tm, w_ih, b_ih, res = residuals
    dgx, dwhh, dbhh = _gru_bwd(reverse, block_b, interpret, out_dtype,
                               res, g)
    dgx_bf = dgx.astype(jnp.bfloat16)
    dx = jnp.einsum("tbg,fg->tbf", dgx_bf, w_ih.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dwi = jnp.einsum("tbf,tbg->fg", x_tm.astype(jnp.bfloat16), dgx_bf,
                     preferred_element_type=jnp.float32)
    dbih = jnp.sum(dgx.astype(jnp.float32), axis=(0, 1))
    return (dx.astype(x_tm.dtype), dwi.astype(w_ih.dtype), dwhh,
            dbih.reshape(b_ih.shape).astype(b_ih.dtype), dbhh)


gru_layer_tm_chunked.defvjp(_gru_chunked_fwd, _gru_chunked_bwd)
