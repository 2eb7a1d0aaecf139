"""Image NPPC: PC-direction wrapper + model (frozen restoration + PC net).

Reference: nppc/nppc.py — NPPCModel :21-186 (loads frozen restoration model,
builds the PC net with in_channels = pre_out + x_shape[0] and
out_channels = x_shape[0] * n_dirs), PCWrapper :208-285 (normalize both
inputs, optional EDSR pre-net for super-resolution, concat(distorted,
restored), pad to the net's scale multiple, unflatten dirs, optional per-dir
project, Gram-Schmidt), gram_schmidt :189-205 (shared impl in
ops.gram_schmidt).

TPU design: the wrapper is a pure `(variables, x_distorted, x_restored) ->
w_mat` function. The restoration net is frozen — its variables are passed
separately and wrapped in stop_gradient by the trainer, keeping one jit
region for restoration forward + PC forward + Gram-Schmidt.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from generative_audio_tpu.nn.image_nets import ImageUNet, ResUNet, ResCNN
from generative_audio_tpu.ops.gram_schmidt import gram_schmidt
from generative_audio_tpu.models.image_restoration import (
    ImageRestorationModel, pad_to_multiple, unpad_from_multiple)

__all__ = ["ImagePCWrapper", "ImageNPPCConfig", "ImageNPPCModel",
           "build_pc_net"]


def build_pc_net(net_type: str, in_channels: int, out_channels: int):
    """PC net assembly with the reference hyperparameters (nppc.py:92-129)."""
    if net_type == "unet":
        return ImageUNet(
            in_channels=in_channels, out_channels=out_channels,
            channels_list=(32, 64, 128), bottleneck_channels=256,
            downsample_list=(False, True, True), n_blocks=1,
            n_blocks_bottleneck=2, min_channels_decoder=64)
    if net_type == "res_unet":
        return ResUNet(
            in_channels=in_channels, out_channels=out_channels,
            channels_list=(64, 64, 128, 128, 256, 256),
            bottleneck_channels=512,
            downsample_list=(False, True, True, True, True, True),
            attn_list=(False, False, False, False, True, False),
            n_blocks=2, n_groups=8, attn_heads=1)
    raise ValueError(f"Unsupported net_type: {net_type!r}")


class ImagePCWrapper:
    """Pure-function PCWrapper (nppc.py:208-285).

    w_mat = gram_schmidt(project(unflatten(net(cat(pre(x_dist), x_rest)))))
    """

    def __init__(self, net, n_dirs: int, pre_net=None,
                 offset: Optional[float] = None,
                 scale: Optional[float] = None,
                 project_func: Optional[Callable] = None,
                 pad_base_size: Optional[int] = None,
                 pre_pad_base_size: Optional[int] = None,
                 pre_upscale: int = 1):
        self.net = net
        self.pre_net = pre_net
        self.n_dirs = n_dirs
        self.offset = offset
        self.scale = scale
        self.project_func = project_func
        self.pad_base_size = pad_base_size
        self.pre_pad_base_size = pre_pad_base_size
        self.pre_upscale = pre_upscale  # nearest-upsample when pre_net is None

    def init(self, key, x_distorted, x_restored):
        import jax
        k_net, k_pre = jax.random.split(key)
        variables = {}
        if self.pre_net is not None:
            x_p, _ = pad_to_multiple(self._norm(x_distorted),
                                     self.pre_pad_base_size)
            variables["pre_net"] = self.pre_net.init(k_pre, x_p)
        x, _ = self._features(variables, x_distorted, x_restored)
        variables["net"] = self.net.init(k_net, x)
        return variables

    def _norm(self, x):
        if self.offset is not None:
            x = x - self.offset
        if self.scale is not None:
            x = x / self.scale
        return x

    def _upsample_nearest(self, x):
        if self.pre_upscale == 1:
            return x
        x = jnp.repeat(x, self.pre_upscale, axis=-2)
        return jnp.repeat(x, self.pre_upscale, axis=-1)

    def _features(self, variables, x_distorted, x_restored):
        x_distorted = self._norm(x_distorted)
        x_restored = self._norm(x_restored)
        if self.pre_net is None:
            x = self._upsample_nearest(x_distorted)
        else:
            x_p, pads = pad_to_multiple(x_distorted, self.pre_pad_base_size)
            x = self.pre_net.apply(variables["pre_net"], x_p)
            x = unpad_from_multiple(x, pads)
        x = jnp.concatenate([x, x_restored], axis=1)
        return pad_to_multiple(x, self.pad_base_size)

    def __call__(self, variables, x_distorted: jnp.ndarray,
                 x_restored: jnp.ndarray) -> jnp.ndarray:
        x, pads = self._features(variables, x_distorted, x_restored)
        w_mat = self.net.apply(variables["net"], x)
        if self.scale is not None:
            w_mat = w_mat * self.scale
        w_mat = unpad_from_multiple(w_mat, pads)
        b, ckd = w_mat.shape[0], w_mat.shape[1]
        w_mat = w_mat.reshape(b, self.n_dirs, ckd // self.n_dirs,
                              *w_mat.shape[2:])
        if self.project_func is not None:
            flat = w_mat.reshape((b * self.n_dirs,) + w_mat.shape[2:])
            flat = self.project_func(flat)
            w_mat = flat.reshape((b, self.n_dirs) + flat.shape[1:])
        shape = w_mat.shape
        w_mat = gram_schmidt(w_mat.reshape(b, self.n_dirs, -1))
        return w_mat.reshape(shape)


@dataclasses.dataclass(frozen=True)
class ImageNPPCConfig:
    """Constructor args of the reference NPPCModel (nppc.py:23-47)."""
    net_type: str = "unet"
    pre_net_type: str = "none"
    n_dirs: int = 5
    lr: float = 1e-4
    second_moment_loss_lambda: float = 1e-1
    second_moment_loss_grace: int = 200
    weight_decay: float = 0.0
    random_seed: int = 42


class ImageNPPCModel:
    """Frozen restoration model + PC wrapper (nppc.py:21-186)."""

    def __init__(self, config: ImageNPPCConfig,
                 restoration_model: ImageRestorationModel):
        self.config = config
        self.n_dirs = config.n_dirs
        self.restoration_model = restoration_model
        self.data_module = restoration_model.data_module
        self.x_shape = restoration_model.x_shape
        self.x_distorted_shape = restoration_model.x_distorted_shape

        upscale = self.x_shape[-1] // self.x_distorted_shape[-1]
        if config.pre_net_type == "none":
            pre_net = None
            pre_out_channels = self.x_distorted_shape[0]
        elif config.pre_net_type == "res_cnn":
            pre_out_channels = 64
            pre_net = ResCNN(
                in_channels=self.x_distorted_shape[0],
                out_channels=pre_out_channels, hidden_channels=64,
                n_blocks=16, upscale_factor=upscale)
        else:
            raise ValueError(
                f"Unsupported pre_net_type: {config.pre_net_type!r}")

        net = build_pc_net(config.net_type,
                           pre_out_channels + self.x_shape[0],
                           self.x_shape[0] * config.n_dirs)
        self.wrapper = ImagePCWrapper(
            net, config.n_dirs, pre_net=pre_net,
            offset=self.data_module.mean, scale=self.data_module.std,
            project_func=getattr(restoration_model.distortion, "project",
                                 None),
            pad_base_size=net.max_scale_factor,
            pre_pad_base_size=(pre_net.max_scale_factor
                               if pre_net is not None else None),
            pre_upscale=upscale if pre_net is None else 1)

    def init(self, key):
        import jax
        dummy_dist = jnp.zeros((1,) + tuple(self.x_distorted_shape),
                               jnp.float32)
        dummy_rest = jnp.zeros((1,) + tuple(self.x_shape), jnp.float32)
        return self.wrapper.init(key, dummy_dist, dummy_rest)

    def get_dirs(self, variables, x_distorted, x_restored) -> jnp.ndarray:
        """[B, n_dirs, C, H, W] PC directions."""
        return self.wrapper(variables, x_distorted, x_restored)
