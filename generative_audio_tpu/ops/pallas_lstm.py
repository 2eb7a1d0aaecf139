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

Training support: `lstm_scan_tm` carries a custom VJP whose backward
recomputes through the lax.scan reference implementation (rematerialization)
— the Pallas kernel only needs to be correct for the forward pass.

Layout notes: gates are in torch order (i, f, g, o) to match
nn.recurrent.LSTMLayer's fused weights.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["lstm_scan_tm", "lstm_scan_reference_tm", "lstm_layer_tm",
           "gru_scan_tm", "gru_scan_reference_tm", "pallas_available"]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


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
    hsz = whh_ref.shape[0]
    i = jax.nn.sigmoid(gates[:, :hsz])
    f = jax.nn.sigmoid(gates[:, hsz:2 * hsz])
    g = jnp.tanh(gates[:, 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(gates[:, 3 * hsz:])
    c = f * c_scratch[:] + i * g
    h_new = o * jnp.tanh(c)
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# per-block relative throughput, measured on-chip at the FullSubNet+
# sub-band shape (T=627, H=384): bigger blocks amortize the per-step matmul
# launch; tiny blocks underfill the MXU.
_BLOCK_EFFICIENCY = {128: 0.80, 256: 1.0, 384: 1.069, 512: 1.08, 576: 1.096}


def _pick_block(b: int, block_b: int) -> int:
    """Batch block minimizing padded_rows / block_efficiency."""
    candidates = [c for c in _BLOCK_EFFICIENCY
                  if c <= max(block_b, 576)] or [block_b]
    best = min(candidates,
               key=lambda c: (_round_up(b, c) / _BLOCK_EFFICIENCY[c], -c))
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
                 reverse: bool = False, block_b: int = 256,
                 interpret: Optional[bool] = None,
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused LSTM recurrence, time-major: gates_x [T, B, 4H] (torch gate
    order, bias already added; bf16 preferred), w_hh [H, 4H] ->
    h sequence [T, B, H] in out_dtype.

    Forward runs the Pallas kernel on TPU (interpret mode elsewhere);
    backward rematerializes through lstm_scan_reference_tm.
    """
    interp = (not pallas_available()) if interpret is None else interpret
    return _forward_pallas(gates_x, w_hh, reverse, block_b, interp,
                           out_dtype)


def _lstm_fwd(gates_x, w_hh, reverse, block_b, interpret, out_dtype):
    out = lstm_scan_tm(gates_x, w_hh, reverse, block_b, interpret, out_dtype)
    return out, (gates_x, w_hh)


def _lstm_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    gates_x, w_hh = residuals
    _, vjp = jax.vjp(
        lambda gx, w: lstm_scan_reference_tm(gx.astype(jnp.float32), w,
                                             reverse=reverse),
        gates_x, w_hh)
    dgx, dw = vjp(g.astype(jnp.float32))
    return dgx.astype(gates_x.dtype), dw


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
    hsz = whh_ref.shape[0]
    i = jax.nn.sigmoid(gates[:, :hsz])
    f = jax.nn.sigmoid(gates[:, hsz:2 * hsz])
    g = jnp.tanh(gates[:, 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(gates[:, 3 * hsz:])
    c = f * c_scratch[:] + i * g
    h_new = o * jnp.tanh(c)
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
    projections live only in VMEM. Backward rematerializes through the
    lax.scan reference."""
    interp = (not pallas_available()) if interpret is None else interpret
    return _layer_forward(x_tm, w_ih, w_hh, bias, reverse, block_b, interp,
                          out_dtype)


def _layer_reference(x_tm, w_ih, w_hh, bias, reverse):
    gates = jnp.einsum("tbf,fg->tbg", x_tm.astype(jnp.float32),
                       w_ih.astype(jnp.float32)) + bias
    return lstm_scan_reference_tm(gates, w_hh, reverse=reverse)


def _layer_fwd(x_tm, w_ih, w_hh, bias, reverse, block_b, interpret,
               out_dtype):
    out = lstm_layer_tm(x_tm, w_ih, w_hh, bias, reverse, block_b, interpret,
                        out_dtype)
    return out, (x_tm, w_ih, w_hh, bias)


def _layer_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    x_tm, w_ih, w_hh, bias = residuals
    _, vjp = jax.vjp(
        lambda x, wi, wh, b: _layer_reference(x, wi, wh, b, reverse),
        x_tm, w_ih, w_hh, bias)
    dx, dwi, dwh, db = vjp(g.astype(jnp.float32))
    return dx.astype(x_tm.dtype), dwi, dwh, db.reshape(bias.shape)


lstm_layer_tm.defvjp(_layer_fwd, _layer_bwd)


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


def _gru_kernel(gx_ref, whh_ref, bhh_ref, out_ref, h_scratch):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h_prev = h_scratch[:]
    gates_h = jnp.dot(h_prev.astype(jnp.bfloat16), whh_ref[:],
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    gx = gx_ref[0].astype(jnp.float32)
    hsz = whh_ref.shape[0]
    r = jax.nn.sigmoid(gx[:, :hsz] + gates_h[:, :hsz])
    z = jax.nn.sigmoid(gx[:, hsz:2 * hsz] + gates_h[:, hsz:2 * hsz])
    n = jnp.tanh(gx[:, 2 * hsz:] + r * gates_h[:, 2 * hsz:])
    h_new = (1.0 - z) * n + z * h_prev
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
                reverse: bool = False, block_b: int = 256,
                interpret: Optional[bool] = None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused GRU recurrence, time-major: gates_x [T, B, 3H] (x-side gates
    incl. b_ih), w_hh [H, 3H], b_hh [3H] -> [T, B, H]."""
    interp = (not pallas_available()) if interpret is None else interpret
    return _gru_forward(gates_x, w_hh, b_hh, reverse, block_b, interp,
                        out_dtype)


def _gru_fwd(gates_x, w_hh, b_hh, reverse, block_b, interpret, out_dtype):
    out = gru_scan_tm(gates_x, w_hh, b_hh, reverse, block_b, interpret,
                      out_dtype)
    return out, (gates_x, w_hh, b_hh)


def _gru_bwd(reverse, block_b, interpret, out_dtype, residuals, g):
    gates_x, w_hh, b_hh = residuals
    _, vjp = jax.vjp(
        lambda gx, w, b: gru_scan_reference_tm(gx.astype(jnp.float32), w, b,
                                               reverse=reverse),
        gates_x, w_hh, b_hh)
    dgx, dw, db = vjp(g.astype(jnp.float32))
    return dgx.astype(gates_x.dtype), dw, db


gru_scan_tm.defvjp(_gru_fwd, _gru_bwd)
