"""Image networks for the NPPC (image) line.

Reference: nppc/networks.py —
  factor_weights :7 (scale initial weights; conv_out of attention uses 1e-6,
  final output convs use `output_factor`), ShortcutBlock :17, ResBlock :36
  (Conv3x3+GN+SiLU x2 with 1x1-conv shortcut on channel change), Attention :56
  (QKV via 1x1 conv over flattened spatial, scale = heads**-0.5 — the
  reference scales by attn.shape[1] (= heads), replicated here for checkpoint
  parity), UNet :96 (maxpool downs, GN+LeakyReLU(0.1) convs, nearest
  upsample, skip concat, optional PixelShuffle upscale), ResUNet :203
  (DDPM-style: stride-2 down convs, ResBlocks +- attention, nearest upsample),
  ResCNN :326 (EDSR; note the reference's `main_layers` list stays empty so
  the trailing ShortcutBlock doubles its input — replicated for parity).

Public API keeps the reference's [B, C, H, W]; convs run internally in NHWC
(the native XLA TPU layout). All blocks are flax linen modules; weights
transplant from the torch reference via utils.torch_convert.convert_image_*.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "ResBlock", "AttentionBlock", "ImageUNet", "ResUNet", "ResCNN",
    "pixel_shuffle", "scaled_lecun_init",
]


def scaled_lecun_init(factor: Optional[float]):
    """lecun_normal scaled by `factor` (reference factor_weights, networks.py:7).

    factor=None means unscaled (torch default init, unconverted magnitude is
    irrelevant for parity tests which transplant weights)."""
    base = nn.initializers.lecun_normal()
    if factor is None:
        return base

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * factor
    return init


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle semantics on NHWC.

    Channel index c*r^2 + i*r + j maps to output pixel (h*r+i, w*r+j, c),
    matching torch's NCHW PixelShuffle after layout conversion."""
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r_i, W, r_j, C
    return x.reshape(b, h * r, w * r, c // (r * r))


def _nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample on NHWC (torch Upsample mode='nearest')."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class ResBlock(nn.Module):
    """Conv3x3+GN+SiLU x2 with shortcut (reference ResBlock, networks.py:36)."""
    dim_out: int
    n_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="conv1")(x)
        h = nn.GroupNorm(num_groups=self.n_groups, name="norm1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="conv2")(h)
        h = nn.GroupNorm(num_groups=self.n_groups, name="norm2")(h)
        h = nn.silu(h)
        if x.shape[-1] != self.dim_out:
            shortcut = nn.Conv(self.dim_out, (1, 1), name="shortcut")(x)
        return h + shortcut


class AttentionBlock(nn.Module):
    """QKV self-attention over flattened spatial (reference Attention :56).

    The reference scales logits by heads**-0.5 (attn.shape[1] after the
    unflatten is the head axis) rather than head_dim**-0.5; replicated so
    converted checkpoints are bit-faithful."""
    heads: int = 4
    embedding_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        emb = self.embedding_channels or c
        seq = x.reshape(b, h * w, c)
        qkv = nn.Dense(3 * emb, use_bias=False, name="conv_in")(seq)
        qkv = qkv.reshape(b, h * w, 3, self.heads, emb // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, H, D]
        attn = jnp.einsum("bihd,bahd->bhia", q, k) * self.heads ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhia,bahd->bihd", attn, v).reshape(b, h * w, emb)
        out = nn.Dense(c, kernel_init=scaled_lecun_init(1e-6),
                       name="conv_out")(out)
        return x + out.reshape(b, h, w, c)


class _ConvGnLrelu(nn.Module):
    """Conv3x3 + GroupNorm + LeakyReLU(0.1) (UNet encoder/decoder unit)."""
    ch: int
    n_groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding=1, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.n_groups, name="norm")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class ImageUNet(nn.Module):
    """The reference's vanilla image UNet (networks.py:96-203).

    Encoder: in-conv; per level [maxpool if downsample] + n_blocks x
    (conv+GN+LeakyReLU). Bottleneck: n_blocks_bottleneck of the same.
    Decoder: reversed levels, skip-concat + n_blocks convs + nearest
    upsample; final level optionally PixelShuffle-upscales then 1x1 conv.
    I/O layout [B, C, H, W]."""
    in_channels: int = 3
    out_channels: Optional[int] = None
    channels_list: Sequence[int] = (32, 64, 128, 256)
    bottleneck_channels: int = 512
    downsample_list: Sequence[bool] = (False, True, True, True)
    n_blocks: int = 2
    n_blocks_bottleneck: int = 2
    min_channels_decoder: int = 64
    upscale_factor: int = 1
    output_factor: Optional[float] = None
    n_groups: int = 8

    @property
    def max_scale_factor(self) -> int:
        return 2 ** int(np.sum(self.downsample_list))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC

        skips = []
        x = nn.Conv(self.channels_list[0], (3, 3), padding=1,
                    name="in_conv")(x)
        skips.append(x)

        for i_level, (ch, down) in enumerate(
                zip(self.channels_list, self.downsample_list)):
            if down:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for j in range(self.n_blocks):
                x = _ConvGnLrelu(ch, self.n_groups,
                                 name=f"enc_{i_level}_{j}")(x)
            skips.append(x)

        for j in range(self.n_blocks_bottleneck):
            x = _ConvGnLrelu(self.bottleneck_channels, self.n_groups,
                             name=f"bottleneck_{j}")(x)

        for idx, i_level in enumerate(reversed(range(len(self.channels_list)))):
            ch = max(self.channels_list[i_level], self.min_channels_decoder)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            for j in range(self.n_blocks):
                x = _ConvGnLrelu(ch, self.n_groups,
                                 name=f"dec_{idx}_{j}")(x)
            if self.downsample_list[i_level]:
                x = _nearest_upsample(x)

        x = jnp.concatenate([x, skips.pop()], axis=-1)
        ch = max(self.channels_list[0], self.min_channels_decoder)
        if self.upscale_factor != 1:
            n_factors = int(np.log2(self.upscale_factor))
            assert 2 ** n_factors == self.upscale_factor, \
                "upscale factor must be a power of 2"
            for fi in range(n_factors):
                x = nn.Conv(ch * 4, (3, 3), padding=1,
                            name=f"upscale_{fi}")(x)
                x = pixel_shuffle(x, 2)
        x = nn.Conv(out_channels, (1, 1),
                    kernel_init=scaled_lecun_init(self.output_factor),
                    name="out_conv")(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW


class ResUNet(nn.Module):
    """DDPM-style residual UNet (reference ResUNet, networks.py:203-325).

    Per-level encoder blocks are *individually* skip-connected (every
    ResBlock output is pushed to the skip stack), matching the reference's
    per-block ModuleList scheme. I/O layout [B, C, H, W]."""
    in_channels: int = 3
    out_channels: Optional[int] = None
    channels_list: Sequence[int] = (128, 128, 256, 256, 512, 512)
    bottleneck_channels: int = 512
    downsample_list: Sequence[bool] = (False, True, True, True, True, True)
    attn_list: Sequence[bool] = (False, False, False, False, True, False)
    n_blocks: int = 2
    min_channels_decoder: int = 1
    upscale_factor: int = 1
    output_factor: Optional[float] = None
    n_groups: int = 8
    attn_heads: int = 1

    @property
    def max_scale_factor(self) -> int:
        return 2 ** int(np.sum(self.downsample_list))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        x = jnp.transpose(x, (0, 2, 3, 1))

        skips = []
        x = nn.Conv(self.channels_list[0], (3, 3), padding=1,
                    name="in_conv")(x)
        skips.append(x)

        for i_level, (ch, down, attn) in enumerate(zip(
                self.channels_list, self.downsample_list, self.attn_list)):
            if down:
                x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{i_level}")(x)
                skips.append(x)
            for j in range(self.n_blocks):
                x = ResBlock(ch, self.n_groups,
                             name=f"enc_{i_level}_{j}")(x)
                if attn:
                    x = AttentionBlock(self.attn_heads,
                                       name=f"enc_attn_{i_level}_{j}")(x)
                skips.append(x)

        x = ResBlock(self.bottleneck_channels, self.n_groups,
                     name="bottleneck_res1")(x)
        x = AttentionBlock(self.attn_heads, name="bottleneck_attn")(x)
        x = ResBlock(self.bottleneck_channels, self.n_groups,
                     name="bottleneck_res2")(x)

        for i_level in reversed(range(len(self.channels_list))):
            ch = max(self.channels_list[i_level], self.min_channels_decoder)
            down = self.downsample_list[i_level]
            attn = self.attn_list[i_level]
            for j in range(self.n_blocks):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResBlock(ch, self.n_groups,
                             name=f"dec_{i_level}_{j}")(x)
                if attn:
                    x = AttentionBlock(self.attn_heads,
                                       name=f"dec_attn_{i_level}_{j}")(x)
            if down:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResBlock(ch, self.n_groups, name=f"up_res_{i_level}")(x)
                if attn:
                    x = AttentionBlock(self.attn_heads,
                                       name=f"up_attn_{i_level}")(x)
                x = _nearest_upsample(x)
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up_conv_{i_level}")(x)

        x = jnp.concatenate([x, skips.pop()], axis=-1)
        ch = max(self.channels_list[0], self.min_channels_decoder)
        x = ResBlock(ch, self.n_groups, name="out_res")(x)
        x = nn.GroupNorm(num_groups=self.n_groups, name="out_norm")(x)
        x = nn.silu(x)
        if self.upscale_factor != 1:
            n_factors = int(np.log2(self.upscale_factor))
            assert 2 ** n_factors == self.upscale_factor
            for fi in range(n_factors):
                x = nn.Conv(ch * 4, (3, 3), padding=1,
                            name=f"upscale_{fi}")(x)
                x = pixel_shuffle(x, 2)
        x = nn.Conv(out_channels, (1, 1),
                    kernel_init=scaled_lecun_init(self.output_factor),
                    name="out_conv")(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class ResCNN(nn.Module):
    """EDSR-style residual CNN (reference ResCNN, networks.py:326-385).

    Replicates the reference exactly, including the empty trailing
    ShortcutBlock which doubles the activation (its `main_layers` list is
    never filled — networks.py:355-362). I/O layout [B, C, H, W]."""
    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: int = 64
    n_blocks: int = 16
    upscale_factor: int = 1
    output_factor: Optional[float] = None

    max_scale_factor: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        x = jnp.transpose(x, (0, 2, 3, 1))
        ch = self.hidden_channels
        x = nn.Conv(ch, (3, 3), padding=1, name="in_conv")(x)
        for i in range(self.n_blocks):
            h = nn.Conv(ch, (3, 3), padding=1, name=f"block_{i}_conv1")(x)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding=1, name=f"block_{i}_conv2")(h)
            x = x + h
        x = nn.Conv(ch, (3, 3), padding=1, name="mid_conv")(x)
        x = x + x  # reference quirk: ShortcutBlock(Sequential()) == 2*x
        if self.upscale_factor != 1:
            n_factors = int(np.log2(self.upscale_factor))
            assert 2 ** n_factors == self.upscale_factor
            for fi in range(n_factors):
                x = nn.Conv(ch * 4, (3, 3), padding=1,
                            name=f"upscale_{fi}")(x)
                x = pixel_shuffle(x, 2)
        x = nn.Conv(out_channels, (3, 3), padding=1,
                    kernel_init=scaled_lecun_init(self.output_factor),
                    name="out_conv")(x)
        return jnp.transpose(x, (0, 3, 1, 2))
