"""NPPC models — uncertainty-direction heads over frozen restoration models.

References:
  denoising — nppc_audio/nppc_model.py:25-135 (waveform -> STFT triplet ->
    frozen FullSubNet+ cRM -> enhanced triplet -> AudioPCWrapper)
  inpainting — nppc_audio/inpainting/nppc/nppc_model.py:32-159 (frozen
    restoration UNet pred -> concat(masked, pred) -> AudioInpaintingPCWrapper)

Design note (TPU/JAX idiom): "frozen pretrained model" is expressed with
jax.lax.stop_gradient around the restoration sub-model's output rather than
eval()/no_grad() module state; both sub-models live in one parameter tree so
one jit compiles the whole forward. The restoration UNet runs with
train=False (frozen batch stats), matching the reference's .eval().
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.models.fullsubnet_plus import (
    FullSubNetPlusConfig, FullSubNetPlus, MultiDirectionConfig)
from generative_audio_tpu.models.pc_wrapper import (
    AudioPCWrapper, AudioInpaintingPCWrapper, AudioInpaintingPCWrapperConfig)
from generative_audio_tpu.nn.unet import UNet, RestorationWrapper
from generative_audio_tpu.ops.stft import stft_ri, prepare_input_from_waveform
from generative_audio_tpu.ops.mask import decompress_cIRM, crm_to_stft_components

__all__ = [
    "StftConfig",
    "DenoisingNPPCConfig", "DenoisingNPPCModel",
    "InpaintingNPPCConfig", "InpaintingNPPCModel",
    "InpaintingRestorationModel",
]


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Mirrors /root/reference/utils.py:14-17."""
    nfft: int = 512
    hop_length: int = 256
    win_length: int = 512


@dataclasses.dataclass(frozen=True)
class DenoisingNPPCConfig:
    restoration: FullSubNetPlusConfig = FullSubNetPlusConfig()
    pc_wrapper: MultiDirectionConfig = MultiDirectionConfig()
    stft: StftConfig = StftConfig()


class DenoisingNPPCModel(nn.Module):
    """Ref nppc_audio/nppc_model.py:25-135."""
    config: DenoisingNPPCConfig = DenoisingNPPCConfig()
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pretrained_restoration_model = FullSubNetPlus(
            self.config.restoration, compute_dtype=self.compute_dtype,
            name="pretrained_restoration_model")
        self.audio_pc_wrapper = AudioPCWrapper(
            self.config.pc_wrapper, compute_dtype=self.compute_dtype,
            name="audio_pc_wrapper")

    def _stft_triplet(self, waveform: jnp.ndarray):
        s = self.config.stft
        return prepare_input_from_waveform(
            waveform, s.nfft, s.hop_length, s.win_length)

    def __call__(self, noisy_waveform: jnp.ndarray) -> jnp.ndarray:
        """[B, L] noisy waveform -> w_mat [B, n_dirs, 2, F, T]."""
        return self.forward_with_pred_crm(noisy_waveform)[0]

    def forward_with_pred_crm(self, noisy_waveform: jnp.ndarray):
        """(w_mat, compressed pred cRM) from ONE frozen-enhancer forward —
        the training objective needs both, and relying on XLA CSE to merge
        a second full FullSubNet+ forward is not guaranteed."""
        noisy_mag, noisy_real, noisy_imag = self._stft_triplet(noisy_waveform)

        pred_crm_comp = jax.lax.stop_gradient(
            self.pretrained_restoration_model(noisy_mag, noisy_real,
                                              noisy_imag))     # [B, 2, F, T]
        pred_crm = jnp.transpose(pred_crm_comp, (0, 2, 3, 1))  # [B, F, T, 2]
        pred_crm = decompress_cIRM(pred_crm)

        enhanced_mag, enhanced_real, enhanced_imag = crm_to_stft_components(
            pred_crm, noisy_real[:, 0], noisy_imag[:, 0])

        w_mat = self.audio_pc_wrapper(
            noisy_mag, noisy_real, noisy_imag,
            enhanced_mag[:, None], enhanced_real[:, None],
            enhanced_imag[:, None])
        return w_mat, pred_crm_comp

    def get_pred_crm(self, noisy_waveform: jnp.ndarray) -> jnp.ndarray:
        """Compressed cRM from the frozen restoration model [B, 2, F, T].
        Ref nppc_model.py:117-135."""
        noisy_mag, noisy_real, noisy_imag = self._stft_triplet(noisy_waveform)
        return jax.lax.stop_gradient(
            self.pretrained_restoration_model(noisy_mag, noisy_real,
                                              noisy_imag))


@dataclasses.dataclass(frozen=True)
class UNetModelConfig:
    in_channels: int = 1
    out_channels: int = 1
    dropout: float = 0.0


class InpaintingRestorationModel(nn.Module):
    """UNet + RestorationWrapper: paste prediction into the gap only.
    Ref inpainting/networks/unet.py:247-313."""
    config: UNetModelConfig = UNetModelConfig()

    @nn.compact
    def __call__(self, x_in: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False, mc_dropout: bool = False) -> jnp.ndarray:
        """mc_dropout=True enables ONLY dropout (BN stays on running stats) —
        the reference's eval-time enable_dropout (utils.py:333-339)."""
        net = UNet(in_channels=self.config.in_channels,
                   out_channels=self.config.out_channels,
                   dropout=self.config.dropout, name="net")
        return RestorationWrapper(net)(x_in, mask, train=train,
                                       mc_dropout=mc_dropout)


@dataclasses.dataclass(frozen=True)
class InpaintingNPPCConfig:
    restoration: UNetModelConfig = UNetModelConfig(in_channels=1,
                                                   out_channels=1,
                                                   dropout=0.2)
    pc_wrapper: AudioInpaintingPCWrapperConfig = AudioInpaintingPCWrapperConfig()


class InpaintingNPPCModel(nn.Module):
    """Ref inpainting/nppc/nppc_model.py:32-159. The restoration sub-model is
    frozen (stop_gradient + train=False); the PC UNet trains."""
    config: InpaintingNPPCConfig = InpaintingNPPCConfig()

    def setup(self):
        self.pretrained_restoration_model = InpaintingRestorationModel(
            self.config.restoration, name="pretrained_restoration_model")
        self.pc_wrapper = AudioInpaintingPCWrapper(
            self.config.pc_wrapper, name="pc_wrapper")

    def get_pred_spec_mag_norm(self, masked_spec_mag_log: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
        """Frozen restoration prediction. Ref nppc_model.py:147-159."""
        return jax.lax.stop_gradient(
            self.pretrained_restoration_model(masked_spec_mag_log, mask,
                                              train=False))

    def mc_restoration(self, masked_spec_mag_log: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
        """One MC-dropout sample from the frozen restoration model: dropout
        active, BatchNorm on running stats (the reference's eval-time
        enable_dropout, utils.py:333-339; base_step2 flips the whole module
        with .train()/.eval() at nppc_trainer.py:267-273 — we keep BN frozen,
        the documented convention of eval/mc_dropout.py). Needs a 'dropout'
        rng at apply time."""
        return jax.lax.stop_gradient(
            self.pretrained_restoration_model(masked_spec_mag_log, mask,
                                              train=False, mc_dropout=True))

    def __call__(self, masked_spec_mag_norm: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """masked log-mag [B,1,F,T] + mask [B,1,F,T] -> w_mat [B,n_dirs,F,T]."""
        pred = self.get_pred_spec_mag_norm(masked_spec_mag_norm, mask)
        x = jnp.concatenate([masked_spec_mag_norm, pred], axis=1)
        return self.pc_wrapper(x, mask, train=train)
