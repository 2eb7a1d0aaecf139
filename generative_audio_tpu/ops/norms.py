"""Normalization zoo matching audio_zen/model/base_model.py:90-329.

All are pure functions over [B, C, F, T] (or [B, F, T] for the forgetting
family) — the cumulative variants use cumsum instead of python-per-frame loops,
and the forgetting family uses lax.scan, so everything stays inside one XLA
program (the reference loops frame-by-frame in python: base_model.py:127-161).

torch parity notes:
  * offline_gaussian_norm uses torch.std's default Bessel correction (ddof=1).
  * forgetting_norm reproduces the reference's idx=0 quirk where
    alp = min((0-1)/(0+1), alpha) = -1 so mu_0 = 2 * mean(frame_0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-8  # audio_zen/constant.py

__all__ = [
    "offline_laplace_norm",
    "cumulative_laplace_norm",
    "offline_gaussian_norm",
    "cumulative_layer_norm",
    "forgetting_norm",
    "sband_forgetting_norm",
    "hybrid_norm",
    "get_norm",
]


def offline_laplace_norm(x: jnp.ndarray) -> jnp.ndarray:
    """x / (mean over (C, F, T) + 1e-5). Ref base_model.py:209-224."""
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return x / (mu + 1e-5)


def cumulative_laplace_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Causal running-mean norm. Ref base_model.py:227-257."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    step_sum = jnp.sum(xr, axis=1)                         # [B*C, T]
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cumulative_mean = cumulative_sum / entry_count
    normed = xr / (cumulative_mean[:, None, :] + EPSILON)
    return normed.reshape(b, c, f, t)


def offline_gaussian_norm(x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / (std + 1e-5), std with Bessel correction (torch default).
    Ref base_model.py:260-274."""
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1)
    return (x - mu) / (std + 1e-5)


def cumulative_layer_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Causal zero-mean/unit-variance norm. Ref base_model.py:277-315."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    step_sum = jnp.sum(xr, axis=1)                         # [B*C, T]
    step_pow_sum = jnp.sum(jnp.square(xr), axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    cumulative_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cumulative_mean = cumulative_sum / entry_count
    cumulative_var = ((cumulative_pow_sum
                       - 2 * cumulative_mean * cumulative_sum) / entry_count
                      + jnp.square(cumulative_mean))
    cumulative_std = jnp.sqrt(cumulative_var + EPSILON)
    normed = (xr - cumulative_mean[:, None, :]) / cumulative_std[:, None, :]
    return normed.reshape(b, c, f, t)


def forgetting_norm(x: jnp.ndarray,
                    sample_length_in_training: int = 192) -> jnp.ndarray:
    """Exponentially-smoothed running-mean norm over [B, F, T].
    Ref base_model.py:127-161 (python loop -> lax.scan here)."""
    assert x.ndim == 3
    b, f, t = x.shape
    eps = 1e-10
    alpha = (sample_length_in_training - 1) / (sample_length_in_training + 1)
    frame_means = jnp.mean(x, axis=1)                      # [B, T]
    idxs = jnp.arange(t)

    def step(mu, inp):
        idx, frame_mean = inp
        alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)
        alp = jnp.where(idx < sample_length_in_training, alp, alpha)
        mu = alp * mu + (1.0 - alp) * frame_mean
        return mu, mu

    _, mus = jax.lax.scan(step, jnp.zeros((b,), x.dtype),
                          (idxs.astype(x.dtype), frame_means.T))
    mu = mus.T[:, None, :]                                 # [B, 1, T]
    return x / (mu + eps)


def sband_forgetting_norm(x: jnp.ndarray,
                          train_sample_length: int = 192) -> jnp.ndarray:
    """forgetting_norm variant: past the warmup the running mean is updated
    from the MIDDLE frequency bin (f//2 - 1) only, not the frame mean.
    Ref base_model.py:90-126 (python loop -> lax.scan here)."""
    assert x.ndim == 3
    b, f, t = x.shape
    eps = 1e-10
    alpha = (train_sample_length - 1) / (train_sample_length + 1)
    frame_means = jnp.mean(x, axis=1)                      # [B, T]
    mid_band = x[:, f // 2 - 1, :]                         # [B, T]
    idxs = jnp.arange(t)

    def step(mu, inp):
        idx, frame_mean, mid = inp
        alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)
        warm = alp * mu + (1.0 - alp) * frame_mean
        cold = alpha * mu + (1.0 - alpha) * mid
        mu = jnp.where(idx < train_sample_length, warm, cold)
        return mu, mu

    _, mus = jax.lax.scan(step, jnp.zeros((b,), x.dtype),
                          (idxs.astype(x.dtype), frame_means.T, mid_band.T))
    return x / (mus.T[:, None, :] + eps)


def hybrid_norm(x: jnp.ndarray,
                sample_length_in_training: int = 192) -> jnp.ndarray:
    """Forgetting-norm warmup then cumulative mean. Ref base_model.py:164-206."""
    assert x.ndim == 3
    b, f, t = x.shape
    eps = 1e-10
    step_sum = jnp.sum(x, axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cumulative_sum / entry_count                # [B, T]

    warm = min(sample_length_in_training, t)
    alpha = (sample_length_in_training - 1) / (sample_length_in_training + 1)
    frame_means = jnp.mean(x[:, :, :warm], axis=1)         # [B, warm]
    idxs = jnp.arange(warm)

    def step(mu, inp):
        idx, frame_mean = inp
        alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)
        mu = alp * mu + (1.0 - alp) * frame_mean
        return mu, mu

    _, initial_mu = jax.lax.scan(step, jnp.zeros((b,), x.dtype),
                                 (idxs.astype(x.dtype), frame_means.T))
    cum_mean = cum_mean.at[:, :warm].set(initial_mu.T)
    return x / (cum_mean[:, None, :] + eps)


def _as_3d(norm_fn):
    """Adapt a [B, F, T] norm (the forgetting family) to the models' 4-D
    [B, C, F, T] call convention by folding channels into the frequency axis
    (the per-frame mean then runs over all C*F entries, consistent with how
    the 4-D norms pool over (C, F)). The reference's norm_wrapper
    (base_model.py:317-329) registers only the four 4-D norms and raises for
    these — this adapter makes every reference norm_type usable from model
    configs instead."""
    def wrapped(x, *args, **kwargs):
        if x.ndim == 3:
            return norm_fn(x, *args, **kwargs)
        b, c, f, t = x.shape
        out = norm_fn(x.reshape(b, c * f, t), *args, **kwargs)
        return out.reshape(b, c, f, t)
    return wrapped


# All SEVEN reference norms (base_model.py:90-315). The four 4-D norms are
# what norm_wrapper dispatches; the 3-D forgetting family is adapted so any
# reference norm_type works in a model config.
_NORMS = {
    "offline_laplace_norm": offline_laplace_norm,
    "cumulative_laplace_norm": cumulative_laplace_norm,
    "offline_gaussian_norm": offline_gaussian_norm,
    "cumulative_layer_norm": cumulative_layer_norm,
    "forgetting_norm": _as_3d(forgetting_norm),
    "sband_forgetting_norm": _as_3d(sband_forgetting_norm),
    "hybrid_norm": _as_3d(hybrid_norm),
}


def get_norm(norm_type: str):
    """Ref base_model.py:317-329 (norm_wrapper), extended to all 7 norms."""
    if norm_type not in _NORMS:
        raise NotImplementedError(
            f"Unknown norm type {norm_type!r}; expected one of {list(_NORMS)}")
    return _NORMS[norm_type]
