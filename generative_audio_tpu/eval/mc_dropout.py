"""MC-dropout uncertainty baseline: K stochastic UNet passes + per-item PCA.

Reference: /root/reference/utils.py:333-648 (enable_dropout,
mc_dropout_inference, compute_pca_sklearn_batch / compute_pca_and_
importance_weights, calculate_unet_baseline).

TPU-native design: the reference loops 50 forward passes and ships each
batch item to sklearn on the host (SURVEY.md §7 'host/device split' hard
part). Here the K passes are ONE vmapped jit over dropout rngs and the PCA is
a batched on-device SVD over the gap-masked (zeroed-known) spectrograms —
algebraically identical to masked-region PCA because the known region is
constant zero after centering.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mc_dropout_inference", "compute_pca_batch",
           "calculate_unet_baseline"]


def mc_dropout_inference(apply_fn: Callable, variables, masked_spec,
                         mask, rng, n_samples: int = 50) -> jnp.ndarray:
    """K stochastic passes with dropout active at eval (ref utils.py:341-353).

    apply_fn(variables, x, mask, rngs) -> [B, 1, F, T]
    Returns [K, B, 1, F, T].
    """
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return apply_fn(variables, masked_spec, mask,
                        rngs={"dropout": key})

    return jax.vmap(one)(keys)


def compute_pca_batch(outputs: jnp.ndarray, n_components: int = 5):
    """Per-batch-item PCA via SVD (ref utils.py:491-545, on-device).

    Args:
        outputs: [K, B, D] samples (gap region; known region zeros are fine).
    Returns:
        (components [B, n_components, D] — unit vectors,
         scaled_components [B, n_components, D] — x singular values,
         importance_weights [B, n_components],
         mean [B, D],
         singular_values [B, n_components])
    """
    k, b, d = outputs.shape
    n_components = min(n_components, k)
    mean = outputs.mean(axis=0)                          # [B, D]
    centered = jnp.transpose(outputs - mean[None], (1, 0, 2))  # [B, K, D]
    _, s, vh = jnp.linalg.svd(centered, full_matrices=False)
    components = vh[:, :n_components, :]                 # [B, n, D]
    singular_values = s[:, :n_components]
    scaled = components * singular_values[:, :, None]
    importance = singular_values / jnp.sum(singular_values, axis=1,
                                           keepdims=True)
    return components, scaled, importance, mean, singular_values


def calculate_unet_baseline(apply_fn: Callable, variables, masked_spec,
                            mask, rng=None, n_mc_samples: int = 50,
                            n_components: int = 5) -> Dict[str, np.ndarray]:
    """MC-dropout + PCA baseline (ref utils.py:545-648).

    Args:
        masked_spec: [B, 1, F, T]; mask: [B, 1, F, T] (1 = known).
    Returns dict with full-spectrogram-shaped results (zeros in known region):
        mean_prediction [B, 1, F, T], principal_components [B, n, F, T],
        scaled_principal_components [B, n, F, T], importance_weights [B, n],
        singular_vals [B, n].
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    preds = mc_dropout_inference(apply_fn, variables, masked_spec, mask, rng,
                                 n_mc_samples)            # [K, B, 1, F, T]
    k, b = preds.shape[:2]
    f, t = masked_spec.shape[2:]
    gap = (1.0 - mask)                                    # [B, 1, F, T]
    gap_flat = gap.reshape(b, -1)
    preds_flat = (preds[:, :, 0] * gap[None, :, 0]).reshape(k, b, -1)

    components, scaled, importance, mean, svals = compute_pca_batch(
        preds_flat, n_components)
    n = components.shape[1]
    return {
        "mean_prediction": (mean * gap_flat).reshape(b, 1, f, t),
        "principal_components": components.reshape(b, n, f, t),
        "scaled_principal_components": scaled.reshape(b, n, f, t),
        "importance_weights": importance,
        "singular_vals": svals,
    }
