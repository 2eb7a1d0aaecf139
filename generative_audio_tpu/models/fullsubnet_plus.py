"""FullSubNet+ — the flagship speech-enhancement model, TPU-native.

Reference: FullSubNet_plus/speech_enhance/fullsubnet_plus/model/
fullsubnet_plus.py:18-230 (config defaults :18-42, forward :143-230) and
nppc_audio/networks.py:9-163 (MultiDirectionFullSubNet_Plus).

Architecture (per reference semantics):
  pad look_ahead frames -> per-stream (mag/real/imag) norm + MulCA channel
  attention -> three full-band TCN towers -> band_unfold fb outputs (width
  2*fb_n+1) + band_unfold the attended mag (width 2*sb_n+1) -> concat ->
  norm -> drop_band (training, B>1) -> sub-band 2-layer LSTM over B*F
  sequences -> [B, output_size, F, T] compressed cRM, cropped by look_ahead.

TPU notes: the sub-band LSTM runs on B*F fused batch (~4.6k sequences for
B=18) — ideal MXU occupancy with the hoisted input projection in
nn.recurrent. All control flow (drop_band on/off, subband_num) is resolved
at trace time from static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from generative_audio_tpu.nn.attention import make_channel_attention
from generative_audio_tpu.nn.recurrent import SequenceModel
from generative_audio_tpu.ops.norms import get_norm
from generative_audio_tpu.ops.subband import band_unfold, drop_band

__all__ = ["FullSubNetPlusConfig", "FullSubNetPlus",
           "MultiDirectionConfig", "MultiDirectionFullSubNetPlus"]


@dataclasses.dataclass(frozen=True)
class FullSubNetPlusConfig:
    """Mirrors the reference pydantic config (fullsubnet_plus.py:18-42)."""
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    sb_num_neighbors: int = 15
    fb_num_neighbors: int = 0
    fb_output_activate_function: str = "ReLU"
    sb_output_activate_function: Optional[str] = None  # False in reference
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    channel_attention_model: str = "TSSE"
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 1
    output_size: int = 2
    subband_num: int = 1
    kersize: Sequence[int] = (3, 5, 10)

    @property
    def num_channels(self) -> int:
        if self.subband_num == 1:
            return self.num_freqs
        return self.num_freqs // self.subband_num + 1


class FullSubNetPlus(nn.Module):
    config: FullSubNetPlusConfig = FullSubNetPlusConfig()
    compute_dtype: jnp.dtype = jnp.float32
    # Optional NamedSharding for the fused [B*F, C, T] sub-band batch
    # (parallel.mesh.subband_sharding) — spreads the hot LSTM across
    # the ("data", "band") mesh.
    subband_sharding: Optional[object] = None

    def _make_seq(self, name: str, input_size: int, output_size: int,
                  hidden: int, kind: str, act: Optional[str]):
        return SequenceModel(
            input_size=input_size, output_size=output_size,
            hidden_size=hidden, num_layers=2, bidirectional=False,
            sequence_model=kind, output_activate_function=act,
            compute_dtype=self.compute_dtype, name=name)

    def _fb_towers(self, fb_input_size: int):
        """Three full-band towers; MultiDirection overrides fb_input_size."""
        c = self.config
        return (
            self._make_seq("fb_model", fb_input_size, c.num_freqs,
                           c.fb_model_hidden_size, "TCN",
                           c.fb_output_activate_function),
            self._make_seq("fb_model_real", fb_input_size, c.num_freqs,
                           c.fb_model_hidden_size, "TCN",
                           c.fb_output_activate_function),
            self._make_seq("fb_model_imag", fb_input_size, c.num_freqs,
                           c.fb_model_hidden_size, "TCN",
                           c.fb_output_activate_function),
        )

    def _attend(self, x: jnp.ndarray, attention: nn.Module, norm) -> jnp.ndarray:
        """norm [B,1,F,T] -> [B, F(or padded subbands), T] -> attention.
        Replicates fullsubnet_plus.py:166-178 including the subband_num>1
        reflect-pad/fold path."""
        c = self.config
        b, ch, f, t = x.shape
        if c.subband_num == 1:
            y = norm(x).reshape(b, ch * f, t)
            return attention(y)
        pad_num = c.subband_num - f % c.subband_num
        y = norm(x)
        y = jnp.concatenate(
            [y, y[:, :, -1 - pad_num:-1, :][:, :, ::-1, :]], axis=2)
        y = y.reshape(b, (f + pad_num) // c.subband_num, t * c.subband_num)
        y = attention(y)
        y = y.reshape(b, ch * (f + pad_num), t)[:, :f, :]
        return y

    @nn.compact
    def __call__(self, noisy_mag: jnp.ndarray, noisy_real: jnp.ndarray,
                 noisy_imag: jnp.ndarray) -> jnp.ndarray:
        """[B, 1, F, T] x3 -> [B, output_size, F, T] compressed cRM."""
        c = self.config
        assert noisy_mag.ndim == 4
        norm = get_norm(c.norm_type)
        pad = [(0, 0), (0, 0), (0, 0), (0, c.look_ahead)]
        noisy_mag = jnp.pad(noisy_mag, pad)
        noisy_real = jnp.pad(noisy_real, pad)
        noisy_imag = jnp.pad(noisy_imag, pad)
        b, ch, f, t = noisy_mag.shape
        assert ch == 1, "FullSubNetPlus takes the mag feature as inputs."

        att_mag = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention")
        att_real = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention_real")
        att_imag = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention_imag")

        fb_input = self._attend(noisy_mag, att_mag, norm)       # [B, F, T]
        fbr_input = self._attend(noisy_real, att_real, norm)
        fbi_input = self._attend(noisy_imag, att_imag, norm)

        fb_m, fb_r, fb_i = self._fb_towers(f)
        fb_output = fb_m(fb_input).reshape(b, 1, f, t)
        fbr_output = fb_r(fbr_input).reshape(b, 1, f, t)
        fbi_output = fb_i(fbi_input).reshape(b, 1, f, t)

        fb_w = c.fb_num_neighbors * 2 + 1
        sb_w = c.sb_num_neighbors * 2 + 1
        fb_unf = band_unfold(fb_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        fbr_unf = band_unfold(fbr_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        fbi_unf = band_unfold(fbi_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        mag_unf = band_unfold(fb_input.reshape(b, 1, f, t),
                              c.sb_num_neighbors).reshape(b, f, sb_w, t)

        sb_input = jnp.concatenate([mag_unf, fb_unf, fbr_unf, fbi_unf], axis=2)
        sb_input = norm(sb_input)

        num_freqs = f
        if b > 1:
            sb_input = drop_band(jnp.transpose(sb_input, (0, 2, 1, 3)),
                                 num_groups=c.num_groups_in_drop_band)
            num_freqs = sb_input.shape[2]
            sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

        sb_input = sb_input.reshape(b * num_freqs, sb_w + 3 * fb_w, t)
        if self.subband_sharding is not None:
            sb_input = jax.lax.with_sharding_constraint(
                sb_input, self.subband_sharding)
        sb_model = self._make_seq("sb_model", sb_w + 3 * fb_w, c.output_size,
                                  c.sb_model_hidden_size, c.sequence_model,
                                  c.sb_output_activate_function)
        sb_mask = sb_model(sb_input)                      # [B*F, out, T]
        sb_mask = sb_mask.reshape(b, num_freqs, c.output_size, t)
        sb_mask = jnp.transpose(sb_mask, (0, 2, 1, 3))    # [B, out, F, T]
        return sb_mask[:, :, :, c.look_ahead:]


@dataclasses.dataclass(frozen=True)
class MultiDirectionConfig(FullSubNetPlusConfig):
    """nppc_audio/networks.py:9-15 — output_size is forced to 2*n_directions."""
    n_directions: int = 4


class MultiDirectionFullSubNetPlus(nn.Module):
    """NPPC-denoising head: FullSubNet+ skeleton taking concat(noisy, enhanced)
    streams, emitting n_directions cRMs. Ref nppc_audio/networks.py:17-163."""
    config: MultiDirectionConfig = MultiDirectionConfig()
    compute_dtype: jnp.dtype = jnp.float32
    subband_sharding: Optional[object] = None

    @nn.compact
    def __call__(self, noisy_mag, noisy_real, noisy_imag,
                 enhanced_mag, enhanced_real, enhanced_imag) -> jnp.ndarray:
        """Six [B, 1, F, T] inputs -> [B, 2*n_directions, F, T]."""
        c = self.config
        n_dirs = c.n_directions
        output_size = 2 * n_dirs
        norm = get_norm(c.norm_type)
        pad = [(0, 0), (0, 0), (0, 0), (0, c.look_ahead)]
        streams = [jnp.pad(s, pad) for s in
                   (noisy_mag, noisy_real, noisy_imag,
                    enhanced_mag, enhanced_real, enhanced_imag)]
        (noisy_mag, noisy_real, noisy_imag,
         enhanced_mag, enhanced_real, enhanced_imag) = streams
        b, ch, f, t = noisy_mag.shape

        att_mag = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention")
        att_real = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention_real")
        att_imag = make_channel_attention(
            c.channel_attention_model, c.num_channels, c.kersize,
            c.subband_num, name="channel_attention_imag")

        def prep(x, att):
            return att(norm(x).reshape(b, ch * f, t))

        fb_input = jnp.concatenate(
            [prep(noisy_mag, att_mag), prep(enhanced_mag, att_mag)], axis=1)
        fbr_input = jnp.concatenate(
            [prep(noisy_real, att_real), prep(enhanced_real, att_real)], axis=1)
        fbi_input = jnp.concatenate(
            [prep(noisy_imag, att_imag), prep(enhanced_imag, att_imag)], axis=1)

        def mk_fb(name):
            return SequenceModel(
                input_size=2 * f, output_size=f,
                hidden_size=c.fb_model_hidden_size, num_layers=2,
                bidirectional=False, sequence_model="TCN",
                output_activate_function=c.fb_output_activate_function,
                compute_dtype=self.compute_dtype, name=name)

        fb_output = mk_fb("fb_model")(fb_input).reshape(b, 1, f, t)
        fbr_output = mk_fb("fb_model_real")(fbr_input).reshape(b, 1, f, t)
        fbi_output = mk_fb("fb_model_imag")(fbi_input).reshape(b, 1, f, t)

        fb_w = c.fb_num_neighbors * 2 + 1
        sb_w = c.sb_num_neighbors * 2 + 1
        fb_unf = band_unfold(fb_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        fbr_unf = band_unfold(fbr_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        fbi_unf = band_unfold(fbi_output, c.fb_num_neighbors).reshape(b, f, fb_w, t)
        # NOTE: unlike FullSubNetPlus, the reference unfolds the RAW padded
        # noisy_mag here, not the attended stream (networks.py:139-141).
        mag_unf = band_unfold(noisy_mag, c.sb_num_neighbors).reshape(b, f, sb_w, t)

        sb_input = jnp.concatenate([mag_unf, fb_unf, fbr_unf, fbi_unf], axis=2)
        sb_input = norm(sb_input)

        num_freqs = f
        if b > 1:
            sb_input = drop_band(jnp.transpose(sb_input, (0, 2, 1, 3)),
                                 num_groups=c.num_groups_in_drop_band)
            num_freqs = sb_input.shape[2]
            sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

        sb_input = sb_input.reshape(b * num_freqs, sb_w + 3 * fb_w, t)
        if self.subband_sharding is not None:
            sb_input = jax.lax.with_sharding_constraint(
                sb_input, self.subband_sharding)
        sb_model = SequenceModel(
            input_size=sb_w + 3 * fb_w, output_size=output_size,
            hidden_size=c.sb_model_hidden_size, num_layers=2,
            bidirectional=False, sequence_model=c.sequence_model,
            output_activate_function=c.sb_output_activate_function,
            compute_dtype=self.compute_dtype, name="sb_model")
        sb_masks = sb_model(sb_input)                     # [B*F, 2*n_dirs, T]
        sb_masks = sb_masks.reshape(b, num_freqs, n_dirs, 2, t)
        sb_masks = jnp.transpose(sb_masks, (0, 2, 3, 1, 4))
        out = sb_masks[..., c.look_ahead:]
        return out.reshape(b, 2 * n_dirs, num_freqs, -1)
