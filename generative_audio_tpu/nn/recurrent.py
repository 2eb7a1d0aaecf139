"""Sequence models: scan-based LSTM/GRU stacks + the SequenceModel head.

Reference: audio_zen/model/module/sequence_model.py:5-123 (SequenceModel with
LSTM | GRU | TCN bodies + Linear head + optional activation).

TPU-first design:
  * The input projection x_t @ W_ih for ALL timesteps is hoisted out of the
    recurrence into one large [B*T, in] x [in, 4H] matmul (MXU-sized), so the
    lax.scan body only contains the unavoidable h_t @ W_hh recurrence matmul.
  * Gate weights are stored as single fused [_, 4H] matrices in torch's gate
    order (i, f, g, o for LSTM; r, z, n for GRU) so torch checkpoints
    transplant by transposition only.
  * Matmuls run in `compute_dtype` (bf16 on TPU); the cell state carries in
    fp32 for numerical stability.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.nn.tcn import TCNStack

__all__ = ["LSTMLayer", "GRULayer", "SequenceModel"]

# Above this resident-size the LSTM switches to the time-chunked hoisted
# projection (ops/pallas_lstm.lstm_layer_tm_chunked): identical numerics,
# one ~_GATES_CHUNK_BYTES gates slab at a time instead of the whole
# [T, B, 4H] buffer. Measured (scripts/perf_batch_sweep.py, v5e): chunking
# costs ~4% at batch 24 x 10 s and throughput does NOT grow past batch 24
# (1993x/1925x/1766x at 24/32/48), so the trigger is set ABOVE the
# batch-24 x 10 s working set (12.2 GB): chunking is a memory enabler for
# long clips / oversize batches that previously OOMed, not the fast path.
# Env overrides in GB (float): GAT_LSTM_GATES_GB (trigger),
# GAT_LSTM_CHUNK_GB (per-chunk slab).
import os as _os
_GATES_BYTES_LIMIT = int(
    float(_os.environ.get("GAT_LSTM_GATES_GB", "13.0")) * (1 << 30))
_GATES_CHUNK_BYTES = int(
    float(_os.environ.get("GAT_LSTM_CHUNK_GB", "2.0")) * (1 << 30))


def _uniform_init(hidden_size: int):
    # torch RNN default: U(-1/sqrt(H), 1/sqrt(H))
    bound = 1.0 / (hidden_size ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """Single (optionally bidirectional) LSTM layer over [B, T, F] input.

    use_pallas: None (default) auto-selects the fused Pallas scan kernel
    (ops.pallas_lstm) on TPU and the lax.scan path elsewhere; True/False
    forces. The Pallas path keeps gates bf16 time-major end-to-end (halves
    HBM traffic vs the fp32 hoisted buffer and keeps h/c in VMEM)."""
    hidden_size: int
    bidirectional: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    def _direction_params(self, input_size: int, suffix: str):
        h = self.hidden_size
        init = _uniform_init(h)
        w_ih = self.param(f"w_ih{suffix}", init, (input_size, 4 * h))
        w_hh = self.param(f"w_hh{suffix}", init, (h, 4 * h))
        b_ih = self.param(f"b_ih{suffix}", init, (4 * h,))
        b_hh = self.param(f"b_hh{suffix}", init, (4 * h,))
        return w_ih, w_hh, b_ih + b_hh

    def _want_pallas(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        from generative_audio_tpu.ops.pallas_lstm import pallas_available
        return pallas_available()

    def _scan(self, x, w_ih, w_hh, bias, reverse: bool,
              time_major: bool = False):
        h = self.hidden_size
        cdt = self.compute_dtype

        if self._want_pallas():
            from generative_audio_tpu.ops.pallas_lstm import (
                lstm_scan_tm, pallas_available, planned_batch)
            # Hoisted projection (one giant MXU matmul, written time-major —
            # no transpose pass) + the fused Pallas scan over bf16 gates.
            # NOTE: the fused-projection variant (lstm_layer_tm) that avoids
            # the gates buffer entirely measured ~2.5x SLOWER here: the scan
            # is per-step latency-bound, and moving the projection into the
            # kernel doubles the serial MXU work per step. bf16 on real TPU;
            # CPU XLA (interpret-mode tests) lacks bf16 matmuls outside the
            # kernel, so keep cdt there.
            pdt = jnp.bfloat16 if pallas_available() else cdt
            x_tm = x if time_major else jnp.swapaxes(x, 0, 1)
            # Pre-pad the SMALL pre-projection input to the kernel's block
            # multiple so the [T, B, 4H] gates buffer is born at its padded
            # size — the kernel's internal pad would be a second full-size
            # HBM-resident copy (OOMs batch 16 x 10 s at F=257).
            b = x_tm.shape[1]
            b_pad = planned_batch(b)
            t_len = x_tm.shape[0]
            gates_bytes = t_len * b_pad * 4 * h * 2   # bf16
            if gates_bytes > _GATES_BYTES_LIMIT:
                # Long clips / big batches: time-chunked hoisted projection
                # keeps only ~t_chunk/T of the gates buffer resident
                # (numerically identical; ops/pallas_lstm.py). This is what
                # lets 60 s clips and batch>=32 x 10 s fit one chip — for
                # INFERENCE: under jax.grad the chunked fn's VJP falls back
                # to the full hoisted projection (training clips are short;
                # trigger-tripping shapes cannot be trained on one chip).
                from generative_audio_tpu.ops.pallas_lstm import (
                    lstm_layer_tm_chunked)
                t_chunk = max(
                    64, -(-_GATES_CHUNK_BYTES // (b_pad * 4 * h * 2)))
                ys_tm = lstm_layer_tm_chunked(
                    x_tm, w_ih, w_hh, bias, reverse, t_chunk,
                    out_dtype=cdt, proj_dtype=pdt)
                return (ys_tm if time_major
                        else jnp.swapaxes(ys_tm, 0, 1))
            if b_pad != b:
                x_tm = jnp.pad(x_tm, ((0, 0), (0, b_pad - b), (0, 0)))
            gates_tm = jnp.einsum(
                "tbf,fg->tbg", x_tm.astype(pdt), w_ih.astype(pdt),
                preferred_element_type=jnp.float32) + bias
            ys_tm = lstm_scan_tm(gates_tm.astype(pdt), w_hh,
                                 reverse=reverse, out_dtype=cdt)[:, :b]
            return ys_tm if time_major else jnp.swapaxes(ys_tm, 0, 1)
        if time_major:
            x = jnp.swapaxes(x, 0, 1)

        # Hoisted input projection: one big MXU matmul over all timesteps.
        gates_x = jnp.einsum(
            "btf,fg->btg", x.astype(cdt), w_ih.astype(cdt),
            preferred_element_type=jnp.float32) + bias
        w_hh_c = w_hh.astype(cdt)

        def step(carry, gx):
            h_prev, c_prev = carry
            gates = gx + jnp.matmul(h_prev.astype(cdt), w_hh_c,
                                    preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c_prev + i * g
            h_new = o * jnp.tanh(c)
            return (h_new, c), h_new

        b = x.shape[0]
        init = (jnp.zeros((b, h), jnp.float32), jnp.zeros((b, h), jnp.float32))
        _, ys = jax.lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1),
                             reverse=reverse)
        return ys if time_major else jnp.swapaxes(ys, 0, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 time_major: bool = False) -> jnp.ndarray:
        input_size = x.shape[-1]
        fwd = self._scan(x, *self._direction_params(input_size, ""),
                         reverse=False, time_major=time_major)
        if not self.bidirectional:
            return fwd
        bwd = self._scan(x, *self._direction_params(input_size, "_reverse"),
                         reverse=True, time_major=time_major)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        return out


class GRULayer(nn.Module):
    """Single (optionally bidirectional) GRU layer over [B, T, F] input.

    use_pallas: like LSTMLayer — auto-selects the fused Pallas GRU scan
    kernel on TPU (ops.pallas_lstm.gru_scan_tm)."""
    hidden_size: int
    bidirectional: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    def _want_pallas(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        from generative_audio_tpu.ops.pallas_lstm import pallas_available
        return pallas_available()

    def _direction_params(self, input_size: int, suffix: str):
        h = self.hidden_size
        init = _uniform_init(h)
        w_ih = self.param(f"w_ih{suffix}", init, (input_size, 3 * h))
        w_hh = self.param(f"w_hh{suffix}", init, (h, 3 * h))
        b_ih = self.param(f"b_ih{suffix}", init, (3 * h,))
        b_hh = self.param(f"b_hh{suffix}", init, (3 * h,))
        return w_ih, w_hh, b_ih, b_hh

    def _scan(self, x, w_ih, w_hh, b_ih, b_hh, reverse: bool):
        h = self.hidden_size
        cdt = self.compute_dtype

        if self._want_pallas():
            from generative_audio_tpu.ops.pallas_lstm import (
                gru_scan_tm, pallas_available, planned_batch)
            pdt = jnp.bfloat16 if pallas_available() else cdt
            b = x.shape[0]
            b_pad = planned_batch(b)   # see SequenceLSTM._scan
            t_len = x.shape[1]
            gates_bytes = t_len * b_pad * 3 * h * 2   # bf16
            if gates_bytes > _GATES_BYTES_LIMIT:
                # see the LSTM branch: time-chunked hoisted projection for
                # shapes whose gates buffer would OOM
                from generative_audio_tpu.ops.pallas_lstm import (
                    gru_layer_tm_chunked)
                t_chunk = max(
                    64, -(-_GATES_CHUNK_BYTES // (b_pad * 3 * h * 2)))
                ys_tm = gru_layer_tm_chunked(
                    jnp.swapaxes(x, 0, 1), w_ih, w_hh, b_ih, b_hh,
                    reverse, t_chunk, out_dtype=cdt, proj_dtype=pdt)
                return jnp.swapaxes(ys_tm, 0, 1)
            if b_pad != b:
                x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
            gates_tm = jnp.einsum(
                "btf,fg->tbg", x.astype(pdt), w_ih.astype(pdt),
                preferred_element_type=jnp.float32) + b_ih
            ys_tm = gru_scan_tm(gates_tm.astype(pdt), w_hh, b_hh,
                                reverse=reverse, out_dtype=cdt)[:, :b]
            return jnp.swapaxes(ys_tm, 0, 1)

        gates_x = jnp.einsum(
            "btf,fg->btg", x.astype(cdt), w_ih.astype(cdt),
            preferred_element_type=jnp.float32) + b_ih
        w_hh_c = w_hh.astype(cdt)

        def step(h_prev, gx):
            gates_h = jnp.matmul(h_prev.astype(cdt), w_hh_c,
                                 preferred_element_type=jnp.float32) + b_hh
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        b = x.shape[0]
        _, ys = jax.lax.scan(step, jnp.zeros((b, h), jnp.float32),
                             jnp.swapaxes(gates_x, 0, 1), reverse=reverse)
        return jnp.swapaxes(ys, 0, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        input_size = x.shape[-1]
        fwd = self._scan(x, *self._direction_params(input_size, ""),
                         reverse=False)
        if not self.bidirectional:
            return fwd
        bwd = self._scan(x, *self._direction_params(input_size, "_reverse"),
                         reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)


_ACTIVATIONS = {
    "Tanh": jnp.tanh,
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.clip(x, 0.0, 6.0),
}


class SequenceModel(nn.Module):
    """LSTM/GRU/TCN body + Linear head + optional output activation.

    Public layout matches the reference: input [B, F, T] -> output [B, F', T]
    (sequence_model.py:100-123).
    """
    input_size: int
    output_size: int
    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = False
    sequence_model: str = "GRU"
    output_activate_function: Optional[str] = "Tanh"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 3, f"expected [B, F, T], got {x.shape}"
        kind = self.sequence_model
        if kind in ("TCN", "TCN-subband"):
            y = TCNStack(
                channels=self.input_size,
                hidden_channels=(self.hidden_size if kind == "TCN-subband"
                                 else 512),
                compute_dtype=self.compute_dtype,
                name="tcn",
            )(x)                                       # [B, F, T]
            y = jnp.swapaxes(y, 1, 2)                  # [B, T, F]
        elif kind == "LSTM":
            # Time-major chain: one [B,F,T]->[T,B,F] transpose in, layers
            # stay time-major (the Pallas kernel's native layout), one
            # transpose out after the Dense head.
            y = jnp.transpose(x, (2, 0, 1))            # [T, B, F]
            for i in range(self.num_layers):
                y = LSTMLayer(hidden_size=self.hidden_size,
                              bidirectional=self.bidirectional,
                              compute_dtype=self.compute_dtype,
                              name=f"layer_{i}")(y, time_major=True)
            y = nn.Dense(self.output_size, name="fc_output_layer",
                         dtype=self.compute_dtype,
                         param_dtype=jnp.float32)(y)
            y = y.astype(jnp.float32)
            if self.output_activate_function:
                y = _ACTIVATIONS[self.output_activate_function](y)
            return jnp.transpose(y, (1, 2, 0))         # [B, F', T]
        elif kind == "GRU":
            y = jnp.swapaxes(x, 1, 2)                  # [B, T, F]
            for i in range(self.num_layers):
                y = GRULayer(hidden_size=self.hidden_size,
                             bidirectional=self.bidirectional,
                             compute_dtype=self.compute_dtype,
                             name=f"layer_{i}")(y)
        else:
            raise NotImplementedError(f"Not implemented {kind}")

        y = nn.Dense(self.output_size, name="fc_output_layer",
                     dtype=self.compute_dtype, param_dtype=jnp.float32)(y)
        y = y.astype(jnp.float32)
        if self.output_activate_function:
            y = _ACTIVATIONS[self.output_activate_function](y)
        return jnp.swapaxes(y, 1, 2)                   # [B, F', T]


class ComplexSequenceModel(nn.Module):
    """Complex LSTM/GRU: shared real/imag towers with the
    (r2r - i2i, i2r + r2i) complex pairing.

    Reference: audio_zen/model/module/sequence_model.py:126-243
    (Complex_SequenceModel). Input [B, 2F, T] = concat(real, imag) along the
    feature axis; output [B, 2*output_size, T].
    """
    input_size: int
    output_size: int
    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = False
    sequence_model: str = "GRU"
    output_activate_function: Optional[str] = "Tanh"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 3, f"expected [B, 2F, T], got {x.shape}"
        layer_cls = {"LSTM": LSTMLayer, "GRU": GRULayer}.get(
            self.sequence_model)
        if layer_cls is None:
            raise NotImplementedError(f"Not implemented {self.sequence_model}")

        real, imag = jnp.split(x, 2, axis=1)
        real = jnp.swapaxes(real, 1, 2)                  # [B, T, F]
        imag = jnp.swapaxes(imag, 1, 2)

        # Two towers, each applied to both the real and the imag stream —
        # batch the two streams together so each tower runs ONE scan over a
        # 2B batch instead of two scans (same math, half the kernel launches).
        both = jnp.concatenate([real, imag], axis=0)     # [2B, T, F]
        y_real_tower = both
        y_imag_tower = both
        for i in range(self.num_layers):
            y_real_tower = layer_cls(
                hidden_size=self.hidden_size,
                bidirectional=self.bidirectional,
                compute_dtype=self.compute_dtype,
                name=f"real_layer_{i}")(y_real_tower)
            y_imag_tower = layer_cls(
                hidden_size=self.hidden_size,
                bidirectional=self.bidirectional,
                compute_dtype=self.compute_dtype,
                name=f"imag_layer_{i}")(y_imag_tower)
        b = real.shape[0]
        r2r, i2r = y_real_tower[:b], y_real_tower[b:]
        r2i, i2i = y_imag_tower[:b], y_imag_tower[b:]

        real_out = r2r - i2i
        imag_out = i2r + r2i
        real_out = nn.Dense(self.output_size, name="real_fc_output_layer",
                            dtype=self.compute_dtype,
                            param_dtype=jnp.float32)(real_out)
        imag_out = nn.Dense(self.output_size, name="imag_fc_output_layer",
                            dtype=self.compute_dtype,
                            param_dtype=jnp.float32)(imag_out)
        real_out = real_out.astype(jnp.float32)
        imag_out = imag_out.astype(jnp.float32)
        if self.output_activate_function:
            act = _ACTIVATIONS[self.output_activate_function]
            real_out, imag_out = act(real_out), act(imag_out)
        return jnp.concatenate([jnp.swapaxes(real_out, 1, 2),
                                jnp.swapaxes(imag_out, 1, 2)], axis=1)
