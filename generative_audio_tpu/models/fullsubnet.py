"""FullSubNet (v1) — the mag-only baseline enhancement model.

Reference: FullSubNet_plus/speech_enhance/fullsubnet/model/fullsubnet.py:12-118
(full-band LSTM + unfold + sub-band LSTM, same drop_band scheme as v2).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.nn.recurrent import SequenceModel
from generative_audio_tpu.ops.norms import get_norm
from generative_audio_tpu.ops.subband import band_unfold, drop_band

__all__ = ["FullSubNetConfig", "FullSubNet"]


@dataclasses.dataclass(frozen=True)
class FullSubNetConfig:
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    fb_num_neighbors: int = 0
    sb_num_neighbors: int = 15
    fb_output_activate_function: str = "ReLU"
    sb_output_activate_function: Optional[str] = None
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2


class FullSubNet(nn.Module):
    config: FullSubNetConfig = FullSubNetConfig()
    compute_dtype: jnp.dtype = jnp.float32
    subband_sharding: Optional[object] = None

    @nn.compact
    def __call__(self, noisy_mag: jnp.ndarray) -> jnp.ndarray:
        """[B, 1, F, T] noisy magnitude -> [B, 2, F, T] compressed cRM."""
        c = self.config
        assert noisy_mag.ndim == 4
        assert c.sequence_model in ("GRU", "LSTM"), \
            "FullSubNet only supports GRU and LSTM."
        norm = get_norm(c.norm_type)
        noisy_mag = jnp.pad(noisy_mag,
                            [(0, 0), (0, 0), (0, 0), (0, c.look_ahead)])
        b, ch, f, t = noisy_mag.shape
        assert ch == 1, "FullSubNet takes the mag feature as input."

        fb_input = norm(noisy_mag).reshape(b, ch * f, t)
        fb_model = SequenceModel(
            input_size=f, output_size=f, hidden_size=c.fb_model_hidden_size,
            num_layers=2, bidirectional=False,
            sequence_model=c.sequence_model,
            output_activate_function=c.fb_output_activate_function,
            compute_dtype=self.compute_dtype, name="fb_model")
        fb_output = fb_model(fb_input).reshape(b, 1, f, t)

        fb_w = c.fb_num_neighbors * 2 + 1
        sb_w = c.sb_num_neighbors * 2 + 1
        fb_unf = band_unfold(fb_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        mag_unf = band_unfold(noisy_mag, c.sb_num_neighbors).reshape(b, f, sb_w, t)
        sb_input = norm(jnp.concatenate([mag_unf, fb_unf], axis=2))

        num_freqs = f
        if b > 1:
            sb_input = drop_band(jnp.transpose(sb_input, (0, 2, 1, 3)),
                                 num_groups=c.num_groups_in_drop_band)
            num_freqs = sb_input.shape[2]
            sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

        sb_input = sb_input.reshape(b * num_freqs, sb_w + fb_w, t)
        if self.subband_sharding is not None:
            sb_input = jax.lax.with_sharding_constraint(
                sb_input, self.subband_sharding)
        sb_model = SequenceModel(
            input_size=sb_w + fb_w, output_size=2,
            hidden_size=c.sb_model_hidden_size, num_layers=2,
            bidirectional=False, sequence_model=c.sequence_model,
            output_activate_function=c.sb_output_activate_function,
            compute_dtype=self.compute_dtype, name="sb_model")
        sb_mask = sb_model(sb_input).reshape(b, num_freqs, 2, t)
        sb_mask = jnp.transpose(sb_mask, (0, 2, 1, 3))
        return sb_mask[:, :, :, c.look_ahead:]
