"""Convert reference PyTorch state_dicts into generative_audio_tpu flax params.

This is the checkpoint-transplant path: the public FullSubNet+ `best_model.tar`
(and any reference-trained UNet/NPPC checkpoint) loads into the JAX models
with bit-faithful forward behavior. Conversion logic works on plain dicts of
numpy arrays, so torch is only needed to *read* .tar/.pt files.

Key layout transforms:
  torch Linear  W [out, in]            -> flax Dense kernel [in, out]
  torch Conv1d  W [out, in/g, k]       -> flax Conv kernel [k, in/g, out]
  torch Conv2d  W [out, in/g, kh, kw]  -> flax Conv kernel [kh, kw, in/g, out]
  torch LSTM/GRU weight_ih_l{n} [G*H, in] -> w_ih [in, G*H]  (gate order kept)

Reference checkpoint formats:
  FullSubNet+ .tar: {"model": state_dict} (base_trainer.py:160-201,
  /root/reference/utils.py:82-99); author trainers .pt:
  {"model_state_dict": ...} (nppc_trainer.py:604-628).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_sequence_model",
    "convert_tsse",
    "convert_se",
    "convert_fullsubnet_plus",
    "convert_fullsubnet",
    "convert_multidirection",
    "convert_unet",
]

Params = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into {name: np.ndarray}. Handles the
    reference's .tar ({"model": sd}) and .pt ({"model_state_dict": sd})
    wrappers as well as bare state_dicts."""
    import torch  # local import: only needed when actually reading torch files

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, Mapping):
        for key in ("model", "model_state_dict", "state_dict"):
            if key in ckpt and isinstance(ckpt[key], Mapping):
                ckpt = ckpt[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in ckpt.items()}


def _np(sd, key):
    v = sd[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _dense(sd, prefix):
    return {"kernel": _np(sd, f"{prefix}.weight").T,
            "bias": _np(sd, f"{prefix}.bias")}


def _conv1d(sd, prefix, bias=True):
    out = {"kernel": _np(sd, f"{prefix}.weight").transpose(2, 1, 0)}
    if bias:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def _conv2d(sd, prefix, bias=True):
    out = {"kernel": _np(sd, f"{prefix}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def convert_sequence_model(sd, prefix: str, kind: str,
                           num_layers: int = 2,
                           bidirectional: bool = False) -> Params:
    """SequenceModel (sequence_model.py:5-123) -> recurrent.SequenceModel."""
    params: Params = {}
    if kind in ("LSTM", "GRU"):
        for layer in range(num_layers):
            entry = {}
            for suffix, tsuffix in [("", ""), ("_reverse", "_reverse")]:
                if suffix and not bidirectional:
                    continue
                entry[f"w_ih{suffix}"] = _np(
                    sd, f"{prefix}sequence_model.weight_ih_l{layer}{tsuffix}").T
                entry[f"w_hh{suffix}"] = _np(
                    sd, f"{prefix}sequence_model.weight_hh_l{layer}{tsuffix}").T
                entry[f"b_ih{suffix}"] = _np(
                    sd, f"{prefix}sequence_model.bias_ih_l{layer}{tsuffix}")
                entry[f"b_hh{suffix}"] = _np(
                    sd, f"{prefix}sequence_model.bias_hh_l{layer}{tsuffix}")
            params[f"layer_{layer}"] = entry
    elif kind in ("TCN", "TCN-subband"):
        blocks: Params = {}
        for i in range(8):
            p = f"{prefix}sequence_model.{i}."
            blocks[f"block_{i}"] = {
                # 1x1 convs are Dense layers in the flax model
                "conv1x1": {
                    "kernel": _np(sd, p + "conv1x1.weight")[:, :, 0].T,
                    "bias": _np(sd, p + "conv1x1.bias")},
                "prelu1": _np(sd, p + "prelu1.weight"),
                "norm1": {"scale": _np(sd, p + "norm1.weight"),
                          "bias": _np(sd, p + "norm1.bias")},
                "depthwise_conv": _conv1d(sd, p + "depthwise_conv"),
                "prelu2": _np(sd, p + "prelu2.weight"),
                "norm2": {"scale": _np(sd, p + "norm2.weight"),
                          "bias": _np(sd, p + "norm2.bias")},
                "sconv": {"kernel": _np(sd, p + "sconv.weight")[:, :, 0].T,
                          "bias": _np(sd, p + "sconv.bias")},
            }
        params["tcn"] = blocks
    else:
        raise NotImplementedError(kind)
    params["fc_output_layer"] = _dense(sd, f"{prefix}fc_output_layer")
    return params


def convert_tsse(sd, prefix: str) -> Params:
    """ChannelTimeSenseSELayer (attention_model.py:43-100)."""
    return {
        "smallConv1d": {"conv": _conv1d(sd, f"{prefix}smallConv1d.0")},
        "middleConv1d": {"conv": _conv1d(sd, f"{prefix}middleConv1d.0")},
        "largeConv1d": {"conv": _conv1d(sd, f"{prefix}largeConv1d.0")},
        "feature_concate_fc": _dense(sd, f"{prefix}feature_concate_fc"),
        "fc1": _dense(sd, f"{prefix}fc1"),
        "fc2": _dense(sd, f"{prefix}fc2"),
    }


def convert_se(sd, prefix: str) -> Params:
    """ChannelSELayer (attention_model.py:6-41)."""
    return {"fc1": _dense(sd, f"{prefix}fc1"),
            "fc2": _dense(sd, f"{prefix}fc2")}


def _convert_attention(sd, prefix: str, kind: str) -> Params:
    if kind == "TSSE":
        return convert_tsse(sd, prefix)
    if kind in ("SE", "CBAM"):
        return convert_se(sd, prefix)
    if kind == "ECA":
        return {"conv": {"kernel": _np(sd, f"{prefix}conv.weight")
                         .transpose(2, 1, 0)}}
    raise NotImplementedError(kind)


def convert_fullsubnet_plus(sd, sequence_model: str = "LSTM",
                            attention: str = "TSSE") -> Params:
    """FullSubNet_Plus state_dict -> models.FullSubNetPlus params
    (fullsubnet_plus.py:46-143)."""
    return {
        "channel_attention": _convert_attention(sd, "channel_attention.", attention),
        "channel_attention_real": _convert_attention(sd, "channel_attention_real.", attention),
        "channel_attention_imag": _convert_attention(sd, "channel_attention_imag.", attention),
        "fb_model": convert_sequence_model(sd, "fb_model.", "TCN"),
        "fb_model_real": convert_sequence_model(sd, "fb_model_real.", "TCN"),
        "fb_model_imag": convert_sequence_model(sd, "fb_model_imag.", "TCN"),
        "sb_model": convert_sequence_model(sd, "sb_model.", sequence_model),
    }


def convert_fullsubnet(sd, sequence_model: str = "LSTM") -> Params:
    """FullSubNet (v1) state_dict -> models.FullSubNet params
    (fullsubnet/model/fullsubnet.py:12-118)."""
    return {
        "fb_model": convert_sequence_model(sd, "fb_model.", sequence_model),
        "sb_model": convert_sequence_model(sd, "sb_model.", sequence_model),
    }


convert_multidirection = convert_fullsubnet_plus


def _double_conv(sd, prefix, dropout=False):
    return {
        "conv0": _conv2d(sd, f"{prefix}conv.0"),
        "bn0": _bn(sd, f"{prefix}conv.1"),
        "conv1": _conv2d(sd, f"{prefix}conv.3"),
        "bn1": _bn(sd, f"{prefix}conv.4"),
    }


def _bn(sd, prefix):
    return {"scale": _np(sd, f"{prefix}.weight"),
            "bias": _np(sd, f"{prefix}.bias")}


def _bn_stats(sd, prefix):
    return {"mean": _np(sd, f"{prefix}.running_mean"),
            "var": _np(sd, f"{prefix}.running_var")}


def _double_conv_stats(sd, prefix):
    return {"bn0": _bn_stats(sd, f"{prefix}conv.1"),
            "bn1": _bn_stats(sd, f"{prefix}conv.4")}


def convert_unet(sd, prefix: str = "") -> Dict[str, Params]:
    """Inpainting UNet (unet.py:247-291 + tmp_utils.py) ->
    {"params": ..., "batch_stats": ...} for nn.unet.UNet."""
    params: Params = {"inc": _double_conv(sd, f"{prefix}inc.conv.")}
    stats: Params = {"inc": _double_conv_stats(sd, f"{prefix}inc.conv.")}
    for i in range(1, 5):
        params[f"down{i}"] = {"conv": _double_conv(sd, f"{prefix}down{i}.mpconv.1.")}
        stats[f"down{i}"] = {"conv": _double_conv_stats(sd, f"{prefix}down{i}.mpconv.1.")}
    for i in range(1, 5):
        params[f"up{i}"] = {"conv": _double_conv(sd, f"{prefix}up{i}.conv.")}
        stats[f"up{i}"] = {"conv": _double_conv_stats(sd, f"{prefix}up{i}.conv.")}
    params["outc"] = _conv2d(sd, f"{prefix}outc.conv")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Image nets (nppc/networks.py) -> nn.image_nets modules
# ---------------------------------------------------------------------------
def _gn(sd, prefix):
    """torch GroupNorm -> flax GroupNorm."""
    return {"scale": _np(sd, f"{prefix}.weight"),
            "bias": _np(sd, f"{prefix}.bias")}


def _res_block(sd, prefix, has_shortcut):
    """nppc/networks.py:36-52 ResBlock (ShortcutBlock(Sequential(conv,GN,
    SiLU,conv,GN,SiLU), shortcut=1x1) -> image_nets.ResBlock."""
    out = {"conv1": _conv2d(sd, f"{prefix}.block.base.0"),
           "norm1": _gn(sd, f"{prefix}.block.base.1"),
           "conv2": _conv2d(sd, f"{prefix}.block.base.3"),
           "norm2": _gn(sd, f"{prefix}.block.base.4")}
    if has_shortcut:
        out["shortcut"] = _conv2d(sd, f"{prefix}.block.shortcut")
    return out


def _attention_block(sd, prefix):
    """nppc/networks.py:56-93 Attention -> image_nets.AttentionBlock.
    Conv1d 1x1 weights become Dense kernels ([O,I,1] -> [I,O])."""
    return {"conv_in": {"kernel": _np(sd, f"{prefix}.conv_in.weight")[:, :, 0].T},
            "conv_out": {"kernel": _np(sd, f"{prefix}.conv_out.weight")[:, :, 0].T,
                         "bias": _np(sd, f"{prefix}.conv_out.bias")}}


def convert_image_unet(sd, config, prefix: str = "") -> Params:
    """Vanilla image UNet (nppc/networks.py:96-203) -> image_nets.ImageUNet.

    `config` is the ImageUNet module (field values drive the torch
    Sequential index arithmetic)."""
    import numpy as _np_mod
    params: Params = {}
    params["in_conv"] = _conv2d(sd, f"{prefix}encoder_blocks.0.0")
    for i_level, down in enumerate(config.downsample_list):
        d = 1 if down else 0
        for j in range(config.n_blocks):
            blk = f"{prefix}encoder_blocks.{1 + i_level}"
            params[f"enc_{i_level}_{j}"] = {
                "conv": _conv2d(sd, f"{blk}.{d + 3 * j}"),
                "norm": _gn(sd, f"{blk}.{d + 3 * j + 1}")}
    for j in range(config.n_blocks_bottleneck):
        params[f"bottleneck_{j}"] = {
            "conv": _conv2d(sd, f"{prefix}bottleneck.{3 * j}"),
            "norm": _gn(sd, f"{prefix}bottleneck.{3 * j + 1}")}
    n_levels = len(config.channels_list)
    for idx in range(n_levels):
        blk = f"{prefix}decoder_blocks.{idx}"
        for j in range(config.n_blocks):
            params[f"dec_{idx}_{j}"] = {
                "conv": _conv2d(sd, f"{blk}.{3 * j}"),
                "norm": _gn(sd, f"{blk}.{3 * j + 1}")}
    final = f"{prefix}decoder_blocks.{n_levels}"
    k = 0
    if config.upscale_factor != 1:
        n_factors = int(_np_mod.log2(config.upscale_factor))
        for fi in range(n_factors):
            params[f"upscale_{fi}"] = _conv2d(sd, f"{final}.{2 * fi}")
        k = 2 * n_factors
    params["out_conv"] = _conv2d(sd, f"{final}.{k}")
    return {"params": params}


def convert_res_unet(sd, config, prefix: str = "") -> Params:
    """ResUNet (nppc/networks.py:203-325) -> image_nets.ResUNet."""
    import numpy as _np_mod
    params: Params = {}
    params["in_conv"] = _conv2d(sd, f"{prefix}encoder_blocks.0.0")

    # channel bookkeeping mirrors the reference constructor exactly
    enc_idx = 1
    ch = config.channels_list[0]
    for i_level, (ch_, down, attn) in enumerate(zip(
            config.channels_list, config.downsample_list, config.attn_list)):
        if down:
            params[f"down_{i_level}"] = _conv2d(
                sd, f"{prefix}encoder_blocks.{enc_idx}.0")
            enc_idx += 1
        for j in range(config.n_blocks):
            blk = f"{prefix}encoder_blocks.{enc_idx}"
            params[f"enc_{i_level}_{j}"] = _res_block(
                sd, f"{blk}.0", has_shortcut=(ch != ch_))
            ch = ch_
            if attn:
                params[f"enc_attn_{i_level}_{j}"] = _attention_block(
                    sd, f"{blk}.1")
            enc_idx += 1

    params["bottleneck_res1"] = _res_block(
        sd, f"{prefix}bottleneck.0",
        has_shortcut=(ch != config.bottleneck_channels))
    ch = config.bottleneck_channels
    params["bottleneck_attn"] = _attention_block(sd, f"{prefix}bottleneck.1")
    params["bottleneck_res2"] = _res_block(sd, f"{prefix}bottleneck.2",
                                           has_shortcut=False)

    # decoder: skip channels pop in reverse of the encoder push order
    skip_chs = [config.channels_list[0]]
    c = config.channels_list[0]
    for ch_, down, attn in zip(config.channels_list, config.downsample_list,
                               config.attn_list):
        if down:
            skip_chs.append(c)
        for _ in range(config.n_blocks):
            c = ch_
            skip_chs.append(c)

    dec_idx = 0
    for i_level in reversed(range(len(config.channels_list))):
        ch_ = max(config.channels_list[i_level], config.min_channels_decoder)
        down = config.downsample_list[i_level]
        attn = config.attn_list[i_level]
        for j in range(config.n_blocks):
            blk = f"{prefix}decoder_blocks.{dec_idx}"
            cat_ch = ch + skip_chs.pop()
            params[f"dec_{i_level}_{j}"] = _res_block(
                sd, f"{blk}.0", has_shortcut=(cat_ch != ch_))
            ch = ch_
            if attn:
                params[f"dec_attn_{i_level}_{j}"] = _attention_block(
                    sd, f"{blk}.1")
            dec_idx += 1
        if down:
            blk = f"{prefix}decoder_blocks.{dec_idx}"
            cat_ch = ch + skip_chs.pop()
            params[f"up_res_{i_level}"] = _res_block(
                sd, f"{blk}.0", has_shortcut=(cat_ch != ch))
            conv_idx = 2 if not attn else 3
            if attn:
                params[f"up_attn_{i_level}"] = _attention_block(sd, f"{blk}.1")
            params[f"up_conv_{i_level}"] = _conv2d(sd, f"{blk}.{conv_idx}")
            dec_idx += 1

    final = f"{prefix}decoder_blocks.{dec_idx}"
    cat_ch = ch + skip_chs.pop()
    ch_ = max(config.channels_list[0], config.min_channels_decoder)
    params["out_res"] = _res_block(sd, f"{final}.0",
                                   has_shortcut=(cat_ch != ch_))
    params["out_norm"] = _gn(sd, f"{final}.1")
    k = 3
    if config.upscale_factor != 1:
        n_factors = int(_np_mod.log2(config.upscale_factor))
        for fi in range(n_factors):
            params[f"upscale_{fi}"] = _conv2d(sd, f"{final}.{k}")
            k += 2
    params["out_conv"] = _conv2d(sd, f"{final}.{k}")
    return {"params": params}


def convert_res_cnn(sd, config, prefix: str = "") -> Params:
    """ResCNN / EDSR (nppc/networks.py:326-385) -> image_nets.ResCNN."""
    import numpy as _np_mod
    params: Params = {}
    params["in_conv"] = _conv2d(sd, f"{prefix}net.0")
    for i in range(config.n_blocks):
        blk = f"{prefix}net.{1 + i}"
        params[f"block_{i}_conv1"] = _conv2d(sd, f"{blk}.base.0")
        params[f"block_{i}_conv2"] = _conv2d(sd, f"{blk}.base.2")
    k = 1 + config.n_blocks
    params["mid_conv"] = _conv2d(sd, f"{prefix}net.{k}")
    k += 2  # empty ShortcutBlock holds no params
    if config.upscale_factor != 1:
        n_factors = int(_np_mod.log2(config.upscale_factor))
        for fi in range(n_factors):
            params[f"upscale_{fi}"] = _conv2d(sd, f"{prefix}net.{k}")
            k += 2
    params["out_conv"] = _conv2d(sd, f"{prefix}net.{k}")
    return {"params": params}


def convert_complex_sequence_model(sd, prefix: str = "", num_layers: int = 2,
                                   bidirectional: bool = False) -> Params:
    """Complex_SequenceModel (sequence_model.py:126-243) ->
    recurrent.ComplexSequenceModel."""
    params: Params = {}
    for tower in ("real", "imag"):
        for layer in range(num_layers):
            entry = {}
            for suffix in ([""] if not bidirectional else ["", "_reverse"]):
                mod = f"{prefix}{tower}_sequence_model"
                entry[f"w_ih{suffix}"] = _np(
                    sd, f"{mod}.weight_ih_l{layer}{suffix}").T
                entry[f"w_hh{suffix}"] = _np(
                    sd, f"{mod}.weight_hh_l{layer}{suffix}").T
                entry[f"b_ih{suffix}"] = _np(
                    sd, f"{mod}.bias_ih_l{layer}{suffix}")
                entry[f"b_hh{suffix}"] = _np(
                    sd, f"{mod}.bias_hh_l{layer}{suffix}")
            params[f"{tower}_layer_{layer}"] = entry
        params[f"{tower}_fc_output_layer"] = _dense(
            sd, f"{prefix}{tower}_fc_output_layer")
    return params


def convert_self_attention(sd, prefix: str = "") -> Params:
    """SelfAttentionlayer (attention_model.py:362-389)."""
    return {"q_linear": _dense(sd, f"{prefix}q_linear"),
            "k_linear": _dense(sd, f"{prefix}k_linear"),
            "v_linear": _dense(sd, f"{prefix}v_linear"),
            "out": _dense(sd, f"{prefix}out")}


def convert_deep_tsse(sd, prefix: str = "") -> Params:
    """ChannelDeepTimeSenseSELayer (attention_model.py:159-221): two stacked
    depthwise convs per branch (Sequential indices 0 and 2)."""
    out: Params = {}
    for branch in ("smallConv1d", "middleConv1d", "largeConv1d"):
        out[branch] = {"conv0": _conv1d(sd, f"{prefix}{branch}.0"),
                       "conv1": _conv1d(sd, f"{prefix}{branch}.2")}
    out["feature_concate_fc"] = _dense(sd, f"{prefix}feature_concate_fc")
    out["fc1"] = _dense(sd, f"{prefix}fc1")
    out["fc2"] = _dense(sd, f"{prefix}fc2")
    return out


def convert_attention_tsse(sd, prefix: str = "") -> Params:
    """ChannelTimeSenseAttentionSELayer (attention_model.py:247-293)."""
    out: Params = {}
    for branch in ("smallConv1d", "middleConv1d", "largeConv1d"):
        out[branch] = {
            "conv1d": _conv1d(sd, f"{prefix}{branch}.conv1d"),
            "attention": convert_self_attention(
                sd, f"{prefix}{branch}.attention.")}
    out["feature_concate_fc"] = _dense(sd, f"{prefix}feature_concate_fc")
    out["fc1"] = _dense(sd, f"{prefix}fc1")
    out["fc2"] = _dense(sd, f"{prefix}fc2")
    return out
