"""Image restoration line: distortion models + RestorationModel.

Reference: nppc/restoration.py —
  Denoising :277 (sigma noise + clip), gen_mask :304 + Inpainting :310
  (mask + fill; project = x*mask), Colorization :336 (channel mean;
  project removes the channel mean), SuperResolution :353 (avg-pool 4x;
  naive_restore = nearest upsample; the reference's project references an
  unbound `x_proj` — here implemented with the clear intent: remove the
  low-frequency component), RestorationWrapper :225 (offset/scale,
  pad-to-multiple, `naive_restore(x) + project(net(x))`),
  RestorationModel :22-224 (dataset + distortion + net assembly, constructor
  round-trip save/load).

TPU design notes: distortions are pure functions of (x, key) — randomness is
explicit jax PRNG, not global torch state; the wrapper is a pure
`(variables, x_distorted) -> x_restored` function so the whole restoration
step stays inside one jit region.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.nn.image_nets import ImageUNet, ResUNet, ResCNN

__all__ = [
    "Denoising", "Inpainting", "Colorization", "SuperResolution", "gen_mask",
    "make_distortion", "ImageRestorationWrapper", "ImageRestorationModel",
    "ImageRestorationConfig", "pad_to_multiple", "unpad_from_multiple",
]


# --------------------------------------------------------------------------
# Distortion models (pure; x layout [B, C, H, W])
# --------------------------------------------------------------------------
class Denoising:
    """Additive Gaussian noise, optionally clipped to [0, 1] (ref :277)."""

    def __init__(self, noise_std: float, clip_noise: bool = False):
        self.noise_std = noise_std
        self.clip_noise = clip_noise

    def distort(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        x_distorted = x + jax.random.normal(key, x.shape, x.dtype) \
            * self.noise_std
        if self.clip_noise:
            x_distorted = jnp.clip(x_distorted, 0.0, 1.0)
        return x_distorted

    def naive_restore(self, x):
        return x

    def project(self, x):
        return x


def gen_mask(shape: Tuple[int, ...], top: int, bottom: int, left: int,
             right: int) -> jnp.ndarray:
    """1s inside [top..bottom] x [left..right] inclusive (ref :304)."""
    mask = np.zeros(shape, np.float32)
    mask[..., top:bottom + 1, left:right + 1] = 1.0
    return jnp.asarray(mask)


class Inpainting:
    """Known region kept, masked region filled (ref :310).

    mask == 1 marks the MISSING region (the reference's convention)."""

    def __init__(self, mask: jnp.ndarray, fill: float = 0.0):
        self.mask = mask
        self.fill = fill

    def distort(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        return x * (1 - self.mask) + self.fill * self.mask

    def naive_restore(self, x):
        return x

    def project(self, x):
        return x * self.mask


class Colorization:
    """Grayscale by channel mean (ref :336)."""

    def distort(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        return jnp.mean(x, axis=1)

    def naive_restore(self, x):
        return jnp.repeat(x[:, None] if x.ndim == 3 else x, 3, axis=1)

    def project(self, x):
        return x - jnp.mean(x, axis=1, keepdims=True)


class SuperResolution:
    """Average-pool downscale by `factor` (ref :353-382).

    project removes the avg-pool-then-upsample component so the net only
    adds high-frequency detail (the reference's clear intent; its code has
    an unbound-variable bug at restoration.py:380)."""

    def __init__(self, factor: int, noise_std: float = 0.0):
        self.factor = factor
        self.noise_std = noise_std

    def _avg_pool(self, x):
        b, c, h, w = x.shape
        f = self.factor
        return x.reshape(b, c, h // f, f, w // f, f).mean(axis=(3, 5))

    def _nearest_up(self, x):
        x = jnp.repeat(x, self.factor, axis=-2)
        return jnp.repeat(x, self.factor, axis=-1)

    def distort(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        x = self._avg_pool(x)
        if self.noise_std > 0 and key is not None:
            x = x + jax.random.normal(key, x.shape, x.dtype) * self.noise_std
        return x

    def naive_restore(self, x):
        return self._nearest_up(x)

    def project(self, x):
        if self.noise_std == 0:
            x = x - self._nearest_up(self._avg_pool(x))
        return x


def make_distortion(distortion_type: str, x_shape: Tuple[int, ...],
                    fill: float = 0.0):
    """Factory mirroring RestorationModel's dispatch (ref :80-106)."""
    if distortion_type == "denoising_1":
        return Denoising(noise_std=1.0, clip_noise=True)
    if distortion_type == "inpainting_1":
        mask = gen_mask(x_shape, 0, x_shape[-2] - 9, 0, x_shape[-1])
        return Inpainting(mask=mask, fill=fill)
    if distortion_type == "inpainting_2":
        mask = gen_mask(x_shape, 80, 149, 40, 214)
        return Inpainting(mask=mask, fill=fill)
    if distortion_type == "colorization_1":
        return Colorization()
    if distortion_type == "super_resolution_1":
        return SuperResolution(factor=4)
    raise ValueError(f"Unsupported distortion_type: {distortion_type!r}")


# --------------------------------------------------------------------------
# Padding helpers (pad-to-multiple for UNet scale factors; ref :238-248)
# --------------------------------------------------------------------------
def pad_to_multiple(x: jnp.ndarray, base: Optional[int]):
    """Symmetric spatial pad of [B,C,H,W] so H and W divide `base`.

    Returns (padded, pad_spec) where pad_spec crops back. The reference's
    formula (pad by `height % s`) only lands on a multiple in even-split
    cases like MNIST 28->32; this computes the general correct pad and
    coincides there."""
    if base is None:
        return x, None
    _, _, h, w = x.shape
    ph, pw = (-h) % base, (-w) % base
    if ph == 0 and pw == 0:
        return x, None
    pads = ((0, 0), (0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
    return jnp.pad(x, pads), pads


def unpad_from_multiple(x: jnp.ndarray, pads):
    if pads is None:
        return x
    (_, _), (_, _), (t, b), (l, r) = pads
    return x[:, :, t:x.shape[2] - b or None, l:x.shape[3] - r or None]


# --------------------------------------------------------------------------
# Restoration wrapper + model
# --------------------------------------------------------------------------
class ImageRestorationWrapper:
    """Pure-function analogue of the reference RestorationWrapper (:225-270).

    restored = naive_restore(x_distorted) + project(net((x - offset)/scale) * scale)
    """

    def __init__(self, net, distortion, offset: Optional[float] = None,
                 scale: Optional[float] = None,
                 pad_base_size: Optional[int] = None):
        self.net = net
        self.distortion = distortion
        self.offset = offset
        self.scale = scale
        self.pad_base_size = pad_base_size

    def init(self, key, x_distorted):
        return self.net.init(key, self._normalize_pad(x_distorted)[0])

    def _normalize_pad(self, x):
        if self.offset is not None:
            x = x - self.offset
        if self.scale is not None:
            x = x / self.scale
        return pad_to_multiple(x, self.pad_base_size)

    def __call__(self, variables, x_distorted: jnp.ndarray) -> jnp.ndarray:
        x, pads = self._normalize_pad(x_distorted)
        x_restored = self.net.apply(variables, x)
        x_restored = unpad_from_multiple(x_restored, pads)
        if self.scale is not None:
            x_restored = x_restored * self.scale
        return (self.distortion.naive_restore(x_distorted)
                + self.distortion.project(x_restored))


@dataclasses.dataclass(frozen=True)
class ImageRestorationConfig:
    """Constructor args of the reference RestorationModel (:23-48)."""
    dataset: str = "mnist"
    distortion_type: str = "denoising_1"
    net_type: str = "unet"
    img_size: Optional[int] = None
    loss_type: str = "mse"
    lr: float = 1e-4
    weight_decay: float = 0.0
    random_seed: int = 42


def build_restoration_net(net_type: str, in_channels: int, out_channels: int,
                          upscale_factor: int = 1):
    """Net assembly with the reference's exact hyperparameters (:120-159)."""
    if net_type == "unet":
        return ImageUNet(
            in_channels=in_channels, out_channels=out_channels,
            channels_list=(32, 64, 128), bottleneck_channels=256,
            downsample_list=(False, True, True), n_blocks=1,
            n_blocks_bottleneck=2, min_channels_decoder=64,
            upscale_factor=upscale_factor)
    if net_type == "res_unet":
        return ResUNet(
            in_channels=in_channels, out_channels=out_channels,
            channels_list=(64, 64, 128, 128, 256, 256),
            bottleneck_channels=512,
            downsample_list=(False, True, True, True, True, True),
            attn_list=(False, False, False, False, True, False),
            n_blocks=2, n_groups=8, attn_heads=1, min_channels_decoder=1,
            upscale_factor=upscale_factor)
    if net_type == "res_cnn":
        return ResCNN(in_channels=in_channels, out_channels=out_channels,
                      hidden_channels=64, n_blocks=16,
                      upscale_factor=upscale_factor)
    raise ValueError(f"Unsupported net_type: {net_type!r}")


class ImageRestorationModel:
    """Dataset + distortion + wrapped net (reference RestorationModel :22).

    Holds no torch-style mutable net — parameters live in the TrainState;
    this object carries the pure apply graph and the data/distortion spec."""

    def __init__(self, config: ImageRestorationConfig, data_module=None):
        from generative_audio_tpu.data.image_data import make_data_module
        self.config = config
        self.data_module = data_module or make_data_module(
            config.dataset, img_size=config.img_size)
        self.x_shape = self.data_module.shape  # (C, H, W)
        self.distortion = make_distortion(
            config.distortion_type, self.x_shape,
            fill=self.data_module.mean)

        dummy = jnp.zeros((1,) + tuple(self.x_shape), jnp.float32)
        x_distorted = self.distortion.distort(dummy, jax.random.PRNGKey(0))
        if x_distorted.ndim == 3:  # colorization collapses the channel axis
            x_distorted = x_distorted[:, None]
        self.x_distorted_shape = tuple(x_distorted.shape[1:])
        self.upscale_factor = self.x_shape[-1] // self.x_distorted_shape[-1]

        base_net = build_restoration_net(
            config.net_type, self.x_distorted_shape[0], self.x_shape[0],
            self.upscale_factor)
        self.base_net = base_net
        self.wrapper = ImageRestorationWrapper(
            base_net, self.distortion,
            offset=self.data_module.mean, scale=self.data_module.std,
            pad_base_size=base_net.max_scale_factor)

    def init(self, key) -> dict:
        dummy = jnp.zeros((1,) + self.x_distorted_shape, jnp.float32)
        return self.wrapper.init(key, dummy)

    def distort(self, x: jnp.ndarray, key) -> jnp.ndarray:
        x_distorted = self.distortion.distort(x, key)
        if x_distorted.ndim == 3:
            x_distorted = x_distorted[:, None]
        return x_distorted

    def restore(self, variables, x_distorted: jnp.ndarray) -> jnp.ndarray:
        return self.wrapper(variables, x_distorted)
