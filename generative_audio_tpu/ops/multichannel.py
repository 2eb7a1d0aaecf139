"""Multichannel / directional features (LPS + IPD) for mic arrays.

Reference: audio_zen/acoustics/feature.py — ChannelWiseLayerNorm :417
(LayerNorm over the feature axis of [B, N, K]), DirectionalFeatureComputer
:439 (conv-STFT per mic; LPS of one reference channel, layer-normed;
cos/sin IPD per mic pair, flattened to [B, I*F, K]),
ChannelDirectionalFeatureComputer :537 (same but channel-stacked
[B, C+I, F, K]).

TPU design: all mics are batched through ONE conv-STFT ([B*M, S]); IPD is
computed from the real/imag pair without materialising a phase unwrap:
cos(pa - pb) and sin(pa - pb) come from the complex ratio identities
(ra*rb + ia*ib)/(|a||b|) and (ia*rb - ra*ib)/(|a||b|) — pure fused VPU math,
no atan2 in the hot path.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.ops.conv_stft import conv_stft

__all__ = ["ChannelWiseLayerNorm", "DirectionalFeatureComputer",
           "ChannelDirectionalFeatureComputer", "compute_ipd"]


class ChannelWiseLayerNorm(nn.Module):
    """LayerNorm over the N axis of [B, N, K] (ref :417-437)."""
    num_features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.swapaxes(x, 1, 2)            # [B, K, N]
        y = nn.LayerNorm(epsilon=self.epsilon, name="ln")(y)
        return jnp.swapaxes(y, 1, 2)


def compute_ipd(real: jnp.ndarray, imag: jnp.ndarray,
                ipd_left: Sequence[int], ipd_right: Sequence[int],
                eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin inter-channel phase differences from (real, imag) [B,M,F,K].

    Identical to cos/sin(phase_l - phase_r) (ref :481-489) but atan2-free."""
    rl, il = real[:, list(ipd_left)], imag[:, list(ipd_left)]
    rr, ir = real[:, list(ipd_right)], imag[:, list(ipd_right)]
    mag = jnp.sqrt((rl ** 2 + il ** 2) * (rr ** 2 + ir ** 2)) + eps
    cos_ipd = (rl * rr + il * ir) / mag
    sin_ipd = (il * rr - rl * ir) / mag
    return cos_ipd, sin_ipd


class _DirectionalBase(nn.Module):
    n_fft: int
    win_length: int
    hop_length: int
    input_features: Sequence[str]
    mic_pairs: Sequence[Tuple[int, int]]
    lps_channel: int
    use_cos_IPD: bool = True
    use_sin_IPD: bool = False
    eps: float = 1e-8

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def num_mic_pairs(self) -> int:
        return len(self.mic_pairs)

    def _stft_all(self, y: jnp.ndarray):
        b, m, s = y.shape
        mag, phase, real, imag = conv_stft(
            y.reshape(b * m, s), self.win_length, self.hop_length, self.n_fft)
        f, k = mag.shape[-2:]
        return tuple(a.reshape(b, m, f, k) for a in (mag, phase, real, imag))


class DirectionalFeatureComputer(_DirectionalBase):
    """[B, M, S] -> (directional [B, D, K], mag, phase, real, imag).
    D = F (LPS, layer-normed) + pairs*F (cos IPD) [+ pairs*F sin IPD].
    Ref :439-537."""

    @property
    def directional_feature_dim(self) -> int:
        dim = 0
        if "LPS" in self.input_features:
            dim += self.num_freqs
        if "IPD" in self.input_features:
            dim += self.num_freqs * self.num_mic_pairs
            if self.use_sin_IPD:
                dim += self.num_freqs * self.num_mic_pairs
        return dim

    @nn.compact
    def __call__(self, y: jnp.ndarray):
        mag, phase, real, imag = self._stft_all(y)
        b, _, f, k = mag.shape
        left = [p[0] for p in self.mic_pairs]
        right = [p[1] for p in self.mic_pairs]
        feats = []
        if "LPS" in self.input_features:
            lps = jnp.log(mag[:, self.lps_channel] ** 2 + self.eps)
            lps = ChannelWiseLayerNorm(self.num_freqs,
                                       name="lps_layer_norm")(lps)
            feats.append(lps)
        if "IPD" in self.input_features:
            cos_ipd, sin_ipd = compute_ipd(real, imag, left, right, self.eps)
            feats.append(cos_ipd.reshape(b, -1, k))
            if self.use_sin_IPD:
                feats.append(sin_ipd.reshape(b, -1, k))
        return jnp.concatenate(feats, axis=1), mag, phase, real, imag


class ChannelDirectionalFeatureComputer(_DirectionalBase):
    """Channel-stacked variant: directional features keep the freq axis,
    [B, C+I, F, K]. Ref :537-630."""

    @property
    def directional_feature_dim(self) -> int:
        dim = 0
        if "LPS" in self.input_features:
            dim += 1
        if "IPD" in self.input_features:
            dim += self.num_mic_pairs
            if self.use_sin_IPD:
                dim += self.num_mic_pairs
        return dim

    @nn.compact
    def __call__(self, y: jnp.ndarray):
        mag, phase, real, imag = self._stft_all(y)
        left = [p[0] for p in self.mic_pairs]
        right = [p[1] for p in self.mic_pairs]
        feats = []
        if "LPS" in self.input_features:
            lps = jnp.log(mag[:, self.lps_channel] ** 2 + self.eps)
            feats.append(lps[:, None])
        if "IPD" in self.input_features:
            cos_ipd, sin_ipd = compute_ipd(real, imag, left, right, self.eps)
            feats.append(cos_ipd)
            if self.use_sin_IPD:
                feats.append(sin_ipd)
        return jnp.concatenate(feats, axis=1), mag, phase, real, imag
