"""MulCA / channel-attention family.

Reference: audio_zen/model/module/attention_model.py —
  ChannelSELayer (:6), ChannelTimeSenseSELayer "TSSE"/MulCA (:43),
  ChannelCBAMLayer (:296), ChannelECAlayer (:335), SelfAttentionlayer (:362).

Layout: public [B, C, T] like the reference. The depthwise multi-scale convs
use VALID padding (torch Conv1d default padding=0) followed by a global mean
over the remaining frames (AdaptiveAvgPool1d(1)).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ChannelSELayer",
    "ChannelTimeSenseSELayer",
    "ChannelCBAMLayer",
    "ChannelECALayer",
    "SelfAttentionLayer",
    "ChannelTimeSenseSEWeightLayer",
    "ChannelDeepTimeSenseSELayer",
    "ConvAttentionBlock",
    "ChannelTimeSenseAttentionSELayer",
    "make_channel_attention",
]


class ChannelSELayer(nn.Module):
    """Squeeze-and-excitation over time-pooled channels. Ref :6-41."""
    num_channels: int
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.mean(axis=2)                          # [B, C]
        h = jax.nn.relu(nn.Dense(self.num_channels // self.reduction_ratio,
                                 name="fc1")(squeeze))
        scale = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * scale[:, :, None]


class _DepthwiseTimeConvPool(nn.Module):
    """Conv1d(C, C, k, groups=C//subband_num, VALID) -> global mean -> ReLU."""
    num_channels: int
    kernel_size: int
    subband_num: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, C, T] -> [B, C]
        y = jnp.swapaxes(x, 1, 2)                         # [B, T, C]
        y = nn.Conv(self.num_channels, kernel_size=(self.kernel_size,),
                    padding="VALID",
                    feature_group_count=self.num_channels // self.subband_num,
                    name="conv")(y)
        return jax.nn.relu(y.mean(axis=1))


class ChannelTimeSenseSELayer(nn.Module):
    """The paper's MulCA block ("TSSE"): 3 multi-scale depthwise time convs ->
    Linear(3 -> 1) fuse -> SE MLP -> per-channel scale. Ref :43-100."""
    num_channels: int
    reduction_ratio: int = 2
    kersize: Sequence[int] = (3, 5, 10)
    subband_num: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        small = _DepthwiseTimeConvPool(self.num_channels, self.kersize[0],
                                       self.subband_num, name="smallConv1d")(x)
        middle = _DepthwiseTimeConvPool(self.num_channels, self.kersize[1],
                                        self.subband_num, name="middleConv1d")(x)
        large = _DepthwiseTimeConvPool(self.num_channels, self.kersize[2],
                                       self.subband_num, name="largeConv1d")(x)
        feature = jnp.stack([small, middle, large], axis=2)  # [B, C, 3]
        squeeze = nn.Dense(1, name="feature_concate_fc")(feature)[..., 0]
        h = jax.nn.relu(nn.Dense(self.num_channels // self.reduction_ratio,
                                 name="fc1")(squeeze))
        scale = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * scale[:, :, None]


class ChannelCBAMLayer(nn.Module):
    """CBAM channel attention: shared MLP over mean- and max-pooled channels.
    Ref :296-332."""
    num_channels: int
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fc1 = nn.Dense(self.num_channels // self.reduction_ratio, name="fc1")
        fc2 = nn.Dense(self.num_channels, name="fc2")
        mean_h = jax.nn.relu(fc1(x.mean(axis=2)))
        max_h = jax.nn.relu(fc1(x.max(axis=2)))
        scale = jax.nn.sigmoid(fc2(mean_h + max_h))
        return x * scale[:, :, None]


class ChannelECALayer(nn.Module):
    """Efficient channel attention: 1D conv across the channel axis of the
    time-pooled descriptor. Ref :335-359."""
    k_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=2)                                # [B, C]
        pad = (self.k_size - 1) // 2
        y = nn.Conv(1, kernel_size=(self.k_size,), padding=[(pad, pad)],
                    use_bias=False, name="conv")(y[:, :, None])  # [B, C, 1]
        scale = jax.nn.sigmoid(y[..., 0])
        return x * scale[:, :, None]


class SelfAttentionLayer(nn.Module):
    """Sigmoid-scored dot-product self attention over [B, T, F]. Ref :362-389."""
    amp_dim: int = 257
    att_dim: int = 257

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 v: jnp.ndarray) -> jnp.ndarray:
        q = nn.Dense(self.att_dim, name="q_linear")(q)
        k = nn.Dense(self.att_dim, name="k_linear")(k)
        v = nn.Dense(self.att_dim, name="v_linear")(v)
        scores = jnp.einsum("btf,bsf->bts", q, k) / jnp.sqrt(
            jnp.asarray(self.amp_dim, q.dtype))
        out = jnp.einsum("bts,bsf->btf", jax.nn.sigmoid(scores), v)
        return nn.Dense(self.amp_dim, name="out")(out)


def make_channel_attention(kind: str, num_channels: int,
                           kersize=(3, 5, 10), subband_num: int = 1,
                           name: str = "channel_attention"):
    """Factory matching FullSubNet_Plus's channel_attention_model switch
    (fullsubnet_plus.py:79-99)."""
    if kind == "SE":
        return ChannelSELayer(num_channels=num_channels, name=name)
    if kind == "TSSE":
        return ChannelTimeSenseSELayer(num_channels=num_channels,
                                       kersize=tuple(kersize),
                                       subband_num=subband_num, name=name)
    if kind == "CBAM":
        return ChannelCBAMLayer(num_channels=num_channels, name=name)
    if kind == "ECA":
        return ChannelECALayer(name=name)
    raise NotImplementedError(f"Unknown channel attention model {kind!r}")


class ChannelTimeSenseSEWeightLayer(nn.Module):
    """TSSE variant that also returns the per-channel weights.
    Ref attention_model.py:101-157."""
    num_channels: int
    reduction_ratio: int = 2
    kersize: Sequence[int] = (3, 5, 10)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        small = _DepthwiseTimeConvPool(self.num_channels, self.kersize[0],
                                       name="smallConv1d")(x)
        middle = _DepthwiseTimeConvPool(self.num_channels, self.kersize[1],
                                        name="middleConv1d")(x)
        large = _DepthwiseTimeConvPool(self.num_channels, self.kersize[2],
                                       name="largeConv1d")(x)
        feature = jnp.stack([small, middle, large], axis=2)  # [B, C, 3]
        squeeze = nn.Dense(1, name="feature_concate_fc")(feature)[..., 0]
        h = jax.nn.relu(nn.Dense(self.num_channels // self.reduction_ratio,
                                 name="fc1")(squeeze))
        scale = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * scale[:, :, None], scale[:, :, None]


class _DeepDepthwiseTimeConvPool(nn.Module):
    """conv -> ReLU -> conv -> ReLU -> global mean (deep TSSE branch).
    Ref attention_model.py:176-198 (note: pool comes LAST here, and there is
    no trailing ReLU, unlike the shallow branch)."""
    num_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, C, T] -> [B, C]
        y = jnp.swapaxes(x, 1, 2)                         # [B, T, C]
        for i in range(2):
            y = nn.Conv(self.num_channels, kernel_size=(self.kernel_size,),
                        padding="VALID",
                        feature_group_count=self.num_channels,
                        name=f"conv{i}")(y)
            y = jax.nn.relu(y)
        return y.mean(axis=1)


class ChannelDeepTimeSenseSELayer(nn.Module):
    """TSSE with two stacked depthwise convs per scale.
    Ref attention_model.py:159-221."""
    num_channels: int
    reduction_ratio: int = 2
    kersize: Sequence[int] = (3, 5, 10)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        small = _DeepDepthwiseTimeConvPool(self.num_channels, self.kersize[0],
                                           name="smallConv1d")(x)
        middle = _DeepDepthwiseTimeConvPool(self.num_channels, self.kersize[1],
                                            name="middleConv1d")(x)
        large = _DeepDepthwiseTimeConvPool(self.num_channels, self.kersize[2],
                                           name="largeConv1d")(x)
        feature = jnp.stack([small, middle, large], axis=2)
        squeeze = nn.Dense(1, name="feature_concate_fc")(feature)[..., 0]
        h = jax.nn.relu(nn.Dense(self.num_channels // self.reduction_ratio,
                                 name="fc1")(squeeze))
        scale = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * scale[:, :, None]


class ConvAttentionBlock(nn.Module):
    """Depthwise conv -> self-attention over time -> global mean -> ReLU.
    Ref attention_model.py:224-245 (Conv_Attention_Block)."""
    num_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, C, T] -> [B, C]
        y = jnp.swapaxes(x, 1, 2)                         # [B, T, C]
        y = nn.Conv(self.num_channels, kernel_size=(self.kernel_size,),
                    padding="VALID",
                    feature_group_count=self.num_channels, name="conv1d")(y)
        y = SelfAttentionLayer(amp_dim=self.num_channels,
                               att_dim=self.num_channels,
                               name="attention")(y, y, y)
        return jax.nn.relu(y.mean(axis=1))


class ChannelTimeSenseAttentionSELayer(nn.Module):
    """TSSE with attention-augmented multi-scale branches.
    Ref attention_model.py:247-293."""
    num_channels: int
    reduction_ratio: int = 2
    kersize: Sequence[int] = (3, 5, 10)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        small = ConvAttentionBlock(self.num_channels, self.kersize[0],
                                   name="smallConv1d")(x)
        middle = ConvAttentionBlock(self.num_channels, self.kersize[1],
                                    name="middleConv1d")(x)
        large = ConvAttentionBlock(self.num_channels, self.kersize[2],
                                   name="largeConv1d")(x)
        feature = jnp.stack([small, middle, large], axis=2)
        squeeze = nn.Dense(1, name="feature_concate_fc")(feature)[..., 0]
        h = jax.nn.relu(nn.Dense(self.num_channels // self.reduction_ratio,
                                 name="fc1")(squeeze))
        scale = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * scale[:, :, None]
