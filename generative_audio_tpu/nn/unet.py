"""Inpainting UNets + RestorationWrapper.

Reference:
  nppc_audio/inpainting/networks/tmp_utils.py:8-100 (double_conv/inconv/down/
  up/outconv blocks: Conv3x3+BN+LeakyReLU(0.2) x2 [+Dropout], maxpool downs,
  bilinear align_corners=True ups with pad-to-match skip concat)
  nppc_audio/inpainting/networks/unet.py:247-291 (active UNet: 64->512 with
  Dropout in down3/down4/up1/up2), :191-245 (UNet2, stride-2 encoder),
  :293-313 (RestorationWrapper pastes net output only into the masked region).

Layout: public API keeps the reference's [B, C, F, T]; internally NHWC
([B, F, T, C]) — the native XLA TPU conv layout.

MC-dropout: dropout layers are flax nn.Dropout driven by an rng — calling
apply(..., train=False, mc_dropout=True, rngs={'dropout': key}) reproduces
the reference's enable_dropout() eval-time stochastic passes exactly
(dropout active, BatchNorm on running averages; utils.py:333-339).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["UNet", "UNet2", "RestorationWrapper", "UNetConfig",
           "resize_align_corners"]


def resize_align_corners(x: jnp.ndarray, new_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True semantics over NHWC."""
    b, h, w, c = x.shape
    nh, nw = new_hw

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            idx = np.zeros(n_out, np.int32)
            return idx, idx, np.zeros(n_out, np.float32)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    lo_h, hi_h, fh = axis_weights(h, nh)
    lo_w, hi_w, fw = axis_weights(w, nw)
    top = x[:, lo_h] * (1 - fh)[None, :, None, None] + x[:, hi_h] * fh[None, :, None, None]
    out = (top[:, :, lo_w] * (1 - fw)[None, None, :, None]
           + top[:, :, hi_w] * fw[None, None, :, None])
    return out


class UNetConfig:
    """Mirror of the reference UNetConfig (unet.py:119-126)."""

    def __init__(self, in_channels: int = 1, out_channels: int = 1,
                 dropout: float = 0.0):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.dropout = dropout


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> LeakyReLU(0.2)) x2 [-> Dropout]. Ref tmp_utils.py:8-35.

    mc_dropout=True activates ONLY the dropout layers while BatchNorm stays
    on its running averages — the reference's eval-time enable_dropout()
    (/root/reference/utils.py:333-339), which flips Dropout modules to train
    mode without touching BN."""
    out_ch: int
    leaky_relu: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True, mc_dropout: bool = False):
        act = ((lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu
               else jax.nn.relu)
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = act(x)
        if self.dropout:
            x = nn.Dropout(self.dropout,
                           deterministic=not (train or mc_dropout),
                           name="dropout")(x)
        return x


class Down(nn.Module):
    """maxpool(2) + DoubleConv. Ref tmp_utils.py:48-58."""
    out_ch: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True, mc_dropout: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch, dropout=self.dropout, name="conv")(
            x, train=train, mc_dropout=mc_dropout)


class Up(nn.Module):
    """bilinear x2 upsample (align_corners=True) -> pad-to-skip -> concat
    [skip, x] -> DoubleConv. Ref tmp_utils.py:61-91."""
    out_ch: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x1, x2, train: bool = True, mc_dropout: bool = False):
        x1 = resize_align_corners(x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        diff_h = x2.shape[1] - x1.shape[1]
        diff_w = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0),
                          (diff_h // 2, diff_h - diff_h // 2),
                          (diff_w // 2, diff_w - diff_w // 2),
                          (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, dropout=self.dropout, name="conv")(
            x, train=train, mc_dropout=mc_dropout)


class UNet(nn.Module):
    """The active inpainting UNet (unet.py:247-291): 4-down/4-up, 64->512,
    Dropout(p) in down3/down4/up1/up2. Public layout [B, C, F, T]."""
    in_channels: int = 1
    out_channels: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 mc_dropout: bool = False) -> jnp.ndarray:
        md = mc_dropout
        x = jnp.transpose(x, (0, 2, 3, 1))          # NCHW -> NHWC
        x1 = DoubleConv(64, name="inc")(x, train=train)
        x2 = Down(128, name="down1")(x1, train=train)
        x3 = Down(256, name="down2")(x2, train=train)
        x4 = Down(512, dropout=self.dropout, name="down3")(
            x3, train=train, mc_dropout=md)
        x5 = Down(512, dropout=self.dropout, name="down4")(
            x4, train=train, mc_dropout=md)
        y = Up(256, dropout=self.dropout, name="up1")(
            x5, x4, train=train, mc_dropout=md)
        y = Up(128, dropout=self.dropout, name="up2")(
            y, x3, train=train, mc_dropout=md)
        y = Up(64, name="up3")(y, x2, train=train)
        y = Up(64, name="up4")(y, x1, train=train)
        y = nn.Conv(self.out_channels, (1, 1), name="outc")(y)
        return jnp.transpose(y, (0, 3, 1, 2))       # NHWC -> NCHW


class _EncoderBlock(nn.Module):
    """conv(stride 2, same) -> BN -> ReLU. Ref unet.py:136-156."""
    out_ch: int
    kernel: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), strides=(2, 2),
                    padding=pad, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return jax.nn.relu(x)


class _DecoderBlock(nn.Module):
    """nearest x2 upsample -> concat skip -> conv -> BN [-> LeakyReLU(0.2)].
    Ref unet.py:159-186."""
    out_ch: int
    kernel: int
    final: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        x = jnp.concatenate([x, skip], axis=-1)
        pad = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), padding=pad,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if not self.final:
            x = nn.leaky_relu(x, 0.2)
        return x


class UNet2(nn.Module):
    """Stride-2 encoder UNet per the SpeechInpainting paper (unet.py:191-245)."""
    in_channels: int = 1
    out_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))
        e1 = _EncoderBlock(16, 7, name="enc1")(x, train=train)
        e2 = _EncoderBlock(32, 5, name="enc2")(e1, train=train)
        e3 = _EncoderBlock(64, 5, name="enc3")(e2, train=train)
        e4 = _EncoderBlock(128, 3, name="enc4")(e3, train=train)
        e5 = _EncoderBlock(128, 3, name="enc5")(e4, train=train)
        e6 = _EncoderBlock(128, 3, name="enc6")(e5, train=train)
        d6 = _DecoderBlock(128, 3, name="dec6")(e6, e5, train=train)
        d5 = _DecoderBlock(128, 3, name="dec5")(d6, e4, train=train)
        d4 = _DecoderBlock(64, 3, name="dec4")(d5, e3, train=train)
        d3 = _DecoderBlock(32, 3, name="dec3")(d4, e2, train=train)
        d2 = _DecoderBlock(16, 3, name="dec2")(d3, e1, train=train)
        out = _DecoderBlock(self.out_channels, 3, final=True,
                            name="dec1")(d2, x, train=train)
        return jnp.transpose(out, (0, 3, 1, 2))


class RestorationWrapper(nn.Module):
    """Paste the net's prediction only into the masked (mask==0) region.
    Ref unet.py:293-313."""
    net: nn.Module

    def __call__(self, x_in: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = True, mc_dropout: bool = False) -> jnp.ndarray:
        x = self.net(x_in, train=train, mc_dropout=mc_dropout)
        k = x.shape[1]
        mask_b = jnp.broadcast_to(mask, (mask.shape[0], k) + mask.shape[2:])
        if x_in.shape[1] > 1:
            known = jnp.broadcast_to(x_in[:, :1], x.shape)
        else:
            known = x_in
        return known * mask_b + x * (1 - mask_b)
