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
                         mask, rng, n_samples: int = 50,
                         chunk_size: int = 0) -> jnp.ndarray:
    """K stochastic passes with dropout active at eval (ref utils.py:341-353).

    apply_fn(variables, x, mask, rngs) -> [B, 1, F, T]
    Returns [K, B, 1, F, T].

    chunk_size > 0 runs the K passes as lax.map over K/chunk_size vmapped
    chunks instead of one K-wide vmap: a full 50-wide vmap of the UNet
    materializes all 50 passes' activations simultaneously (measured
    37.6 GB HBM inside the mc_pca_aligned train step — an OOM on a 16 GB
    chip); chunking bounds live activations to one chunk.

    Per-pass dropout stays keyed by the same per-sample key under any
    chunking (flax dropout is deterministic per key), but raw
    jax.random SAMPLER bit-streams inside apply_fn may legally differ
    between batching layouts — both are valid iid draws
    (tests/test_nppc_validation.py::test_mc_dropout_chunked_matches_unchunked).
    """
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return apply_fn(variables, masked_spec, mask,
                        rngs={"dropout": key})

    if chunk_size <= 0 or chunk_size >= n_samples:
        return jax.vmap(one)(keys)
    if n_samples % chunk_size != 0:
        # largest divisor <= chunk_size keeps every pass without padding
        chunk_size = next(c for c in range(chunk_size, 0, -1)
                          if n_samples % c == 0)
    # keys may be typed key arrays [K] or raw uint32 [K, 2]
    chunked = keys.reshape(n_samples // chunk_size, chunk_size,
                           *keys.shape[1:])
    out = jax.lax.map(lambda ks: jax.vmap(one)(ks), chunked)
    return out.reshape(n_samples, *out.shape[2:])


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
    # TPU-native PCA: a direct batched SVD of [B, K, D] fails to lower on
    # TPU for large D (the mc_pca_aligned train step crashed the remote
    # compile helper, round 5). For K <= D the K x K Gram eigendecomposition
    # is algebraically identical (C = U S V^T  =>  C C^T = U S^2 U^T,
    # V^T = U^T C / S) and maps to one MXU matmul plus a tiny eigh.
    gram = jnp.einsum("bkd,bld->bkl", centered, centered)      # [B, K, K]
    evals, evecs = jnp.linalg.eigh(gram)                       # ascending
    top = jnp.flip(evals[:, -n_components:], axis=1)           # [B, n]
    vecs = jnp.flip(evecs[:, :, -n_components:], axis=2)       # [B, K, n]
    singular_values = jnp.sqrt(jnp.clip(top, 0.0, None))
    components = jnp.einsum("bkn,bkd->bnd", vecs, centered) \
        / (singular_values[:, :, None] + 1e-12)                # [B, n, D]
    scaled = components * singular_values[:, :, None]
    importance = singular_values / jnp.sum(singular_values, axis=1,
                                           keepdims=True)
    return components, scaled, importance, mean, singular_values


def calculate_unet_baseline(apply_fn: Callable, variables, masked_spec,
                            mask, rng=None, n_mc_samples: int = 50,
                            n_components: int = 5,
                            mc_chunk_size: int = 0) -> Dict[str, np.ndarray]:
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
                                 n_mc_samples,
                                 chunk_size=mc_chunk_size)  # [K, B, 1, F, T]
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
