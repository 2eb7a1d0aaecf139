"""Temporal convolutional network blocks.

Reference: audio_zen/model/module/causal_conv.py:67-118 (TCNBlock: 1x1 conv ->
PReLU -> GroupNorm(1, eps=1e-8) -> depthwise dilated conv -> PReLU ->
GroupNorm -> 1x1 conv, residual) and sequence_model.py:47-70 (the 8-block
dilation schedule 1,2,5,9 x2 + ReLU).

Layout: public [B, C, T] like the reference; internally NWC ([B, T, C]) which
is the native XLA TPU conv layout. The 1x1 convs are plain Dense matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TCNBlock", "TCNStack", "CausalConvBlock", "CausalTransConvBlock"]


def _prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha * x)


class _GlobalLayerNorm(nn.Module):
    """torch GroupNorm(num_groups=1, C, eps=1e-8) over [B, T, C]: normalize
    over (T, C) jointly, per-channel affine."""
    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class TCNBlock(nn.Module):
    """Residual depthwise-separable dilated conv block ([B, T, C] layout)."""
    in_channels: int
    hidden_channels: int = 512
    out_channels: int = 257
    kernel_size: int = 3
    dilation: int = 1
    use_skip_connection: bool = True
    causal: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = self.compute_dtype
        h = self.hidden_channels
        y = nn.Dense(h, name="conv1x1", dtype=cdt,
                     param_dtype=jnp.float32)(x.astype(cdt))
        y = _prelu(y.astype(jnp.float32),
                   self.param("prelu1", nn.initializers.constant(0.25), (1,)))
        y = _GlobalLayerNorm(h, name="norm1")(y)

        if self.causal:
            pad = self.dilation * (self.kernel_size - 1)
            padding = [(pad, 0)]
        else:
            pad = (self.dilation * (self.kernel_size - 1)) // 2
            padding = [(pad, pad)]
        y = nn.Conv(features=h, kernel_size=(self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=padding,
                    feature_group_count=h, name="depthwise_conv",
                    dtype=cdt, param_dtype=jnp.float32)(y.astype(cdt))
        y = _prelu(y.astype(jnp.float32),
                   self.param("prelu2", nn.initializers.constant(0.25), (1,)))
        y = _GlobalLayerNorm(h, name="norm2")(y)
        y = nn.Dense(self.out_channels, name="sconv", dtype=cdt,
                     param_dtype=jnp.float32)(y.astype(cdt)).astype(jnp.float32)
        if self.use_skip_connection:
            return x + y
        return y


class TCNStack(nn.Module):
    """The reference's fixed 8-block stack (dilations 1,2,5,9 repeated twice)
    + final ReLU. Public layout [B, C, T] (sequence_model.py:47-58)."""
    channels: int
    hidden_channels: int = 512
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.swapaxes(x, 1, 2)  # [B, T, C]
        for i, dilation in enumerate([1, 2, 5, 9, 1, 2, 5, 9]):
            y = TCNBlock(in_channels=self.channels,
                         hidden_channels=self.hidden_channels,
                         out_channels=self.channels,
                         dilation=dilation,
                         compute_dtype=self.compute_dtype,
                         name=f"block_{i}")(y)
        y = jax.nn.relu(y)
        return jnp.swapaxes(y, 1, 2)  # [B, C, T]


class CausalConvBlock(nn.Module):
    """2D causal conv block (encoder). Ref causal_conv.py:5-32.
    Layout [B, F, T, C] internally; kernel (3, 2), stride (2, 1)."""
    out_channels: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = nn.Conv(self.out_channels, kernel_size=(3, 2), strides=(2, 1),
                    padding=[(0, 0), (1, 1)], name="conv")(x)
        y = y[:, :, :-1, :]  # chomp the look-ahead frame
        y = nn.BatchNorm(use_running_average=not train, name="norm")(y)
        act = getattr(jax.nn, self.activation.lower())
        return act(y)


class CausalTransConvBlock(nn.Module):
    """2D causal transposed-conv block (decoder). Ref causal_conv.py:35-64."""
    out_channels: int
    is_last: bool = False
    output_padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = nn.ConvTranspose(self.out_channels, kernel_size=(3, 2),
                             strides=(2, 1), padding="VALID", name="conv")(x)
        if self.output_padding[0]:
            y = jnp.pad(y, ((0, 0), (0, self.output_padding[0]), (0, 0), (0, 0)))
        y = y[:, :, :-1, :]
        y = nn.BatchNorm(use_running_average=not train, name="norm")(y)
        if self.is_last:
            return jax.nn.relu(y)
        return jax.nn.elu(y)
