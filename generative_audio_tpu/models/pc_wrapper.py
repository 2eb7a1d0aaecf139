"""Principal-component head wrappers for NPPC.

References:
  nppc_audio/pc_wrapper.py:46-110 (AudioPCWrapper — complex cRM directions
  from MultiDirectionFullSubNet_Plus + complex Gram-Schmidt)
  nppc_audio/inpainting/nppc/pc_wrapper.py:62-88 (AudioInpaintingPCWrapper —
  UNet directions, zero known region, real Gram-Schmidt)
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.models.fullsubnet_plus import (
    MultiDirectionConfig, MultiDirectionFullSubNetPlus)
from generative_audio_tpu.nn.unet import UNet
from generative_audio_tpu.ops.gram_schmidt import (
    gram_schmidt_to_crm, gram_schmidt_to_spec_mag)

__all__ = ["AudioPCWrapper", "AudioInpaintingPCWrapper",
           "AudioInpaintingPCWrapperConfig"]


class AudioPCWrapper(nn.Module):
    """Computes orthogonal cRM directions for denoising-NPPC.
    Ref nppc_audio/pc_wrapper.py:54-110."""
    config: MultiDirectionConfig = MultiDirectionConfig()
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noisy_mag, noisy_real, noisy_imag,
                 enhanced_mag, enhanced_real, enhanced_imag) -> jnp.ndarray:
        """Six [B, 1, F, T] streams -> w_mat [B, n_dirs, 2, F, T]."""
        n_dirs = self.config.n_directions
        crm = MultiDirectionFullSubNetPlus(
            self.config, compute_dtype=self.compute_dtype, name="net")(
            noisy_mag, noisy_real, noisy_imag,
            enhanced_mag, enhanced_real, enhanced_imag)  # [B, 2*n_dirs, F, T]
        b, _, f, t = crm.shape
        crm = crm.reshape(b, n_dirs, 2, f, t)
        return gram_schmidt_to_crm(crm)


@dataclasses.dataclass(frozen=True)
class AudioInpaintingPCWrapperConfig:
    """Ref inpainting/nppc/pc_wrapper.py:62-65."""
    in_channels: int = 2
    out_channels: int = 5   # == n_dirs
    dropout: float = 0.0
    n_dirs: int = 5


class AudioInpaintingPCWrapper(nn.Module):
    """UNet -> zero the KNOWN region -> real Gram-Schmidt.
    Ref inpainting/nppc/pc_wrapper.py:67-88 (mask==1 is known/kept audio;
    directions live only in the gap)."""
    config: AudioInpaintingPCWrapperConfig = AudioInpaintingPCWrapperConfig()

    @nn.compact
    def __call__(self, mag_spec: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """mag_spec [B, in_ch, F, T], mask [B, 1, F, T] -> [B, n_dirs, F, T]."""
        c = self.config
        pred = UNet(in_channels=c.in_channels, out_channels=c.n_dirs,
                    dropout=c.dropout, name="net")(mag_spec, train=train)
        mask_b = jnp.broadcast_to(mask, pred.shape)
        pred = pred * (1.0 - mask_b)
        return gram_schmidt_to_spec_mag(pred)
