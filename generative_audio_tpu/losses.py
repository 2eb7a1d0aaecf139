"""Training objectives.

References:
  cIRM MSE           — fullsubnet_plus/trainer/trainer.py:349-353 (MSE between
                       gt compressed cIRM after drop_band and predicted cRM)
  masked MSE         — inpainting/trainer/restoration_trainer.py:178-200
                       (sum((out-clean)^2 * (1-mask)) / sum(1-mask))
  NPPC objective     — nppc/nppc.py:510-559 (canonical), inpainting
                       nppc_trainer.py:609-656 (real, eps 1e-6), denoising
                       nppc_audio/trainer.py:234-317 (complex, eps 1e-8,
                       |err_proj| magnitude)
  lambda ramp        — nppc_trainer.py:680-687: -1 + 2*step/grace, clamped to
                       [1e-6, 1], scaled by second_moment_loss_lambda.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from jax import lax

__all__ = [
    "cirm_mse_loss",
    "cirm_l1_loss",
    "si_snr_loss",
    "masked_mse_loss",
    "second_moment_lambda",
    "nppc_objective_real",
    "nppc_objective_mc_aligned",
    "nppc_objective_complex",
]


def cirm_mse_loss(pred_crm: jnp.ndarray, gt_cirm: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE over compressed masks (both [B, 2, F', T])."""
    return jnp.mean(jnp.square(pred_crm - gt_cirm))


def cirm_l1_loss(pred_crm: jnp.ndarray, gt_cirm: jnp.ndarray) -> jnp.ndarray:
    """L1 over compressed masks — the reference's config-selectable
    `l1_loss` alias (audio_zen/loss.py:3, picked by `[loss_function]
    name` in train.toml via tools/train.py:66)."""
    return jnp.mean(jnp.abs(pred_crm - gt_cirm))


def si_snr_loss(enhanced: jnp.ndarray, reference: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    """Negative mean scale-invariant SNR over the last axis.

    audio_zen/loss.py:7-31: zero-mean both signals, project the enhanced
    signal onto the reference (`t`), and return
    -mean(20*log10(eps + ||t|| / (||x_zm - t|| + eps))) — the eps
    placements match the reference exactly. Works on waveforms [B, T] and,
    like the reference under `loss_function(gt_cIRM, cRM)`
    (trainer.py:347), on any [..., T] tensor (the mean runs over all
    leading axes).

    Deviation from the reference (which NaNs here): the norms are computed
    as sqrt(sum(x^2) + eps^2), so an exactly-silent reference row (t == 0,
    where d||t||/dt = t/||t|| is 0/0) yields a finite gradient instead of
    NaN-poisoning the optimizer state."""
    def _safe_norm(x):
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1) + eps * eps)

    x_zm = enhanced - jnp.mean(enhanced, axis=-1, keepdims=True)
    s_zm = reference - jnp.mean(reference, axis=-1, keepdims=True)
    dot = jnp.sum(x_zm * s_zm, axis=-1, keepdims=True)
    s_energy = jnp.sum(jnp.square(s_zm), axis=-1, keepdims=True)
    t = dot * s_zm / (s_energy + eps)
    return -jnp.mean(20.0 * jnp.log10(
        eps + _safe_norm(t) / (_safe_norm(x_zm - t) + eps)))


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """MSE restricted to the gap (mask == 0 is the inpainted region).
    Ref restoration_trainer.py:193-199."""
    gap = 1.0 - mask
    # maximum(., 1) guards the degenerate no-gap batch: 0/0 would return NaN
    # and permanently poison the optimizer state.
    return (jnp.sum(jnp.square(pred - target) * gap)
            / jnp.maximum(jnp.sum(gap), 1.0))


def second_moment_lambda(step: jnp.ndarray, grace: int,
                         scale: float = 1.0) -> jnp.ndarray:
    """λ ramp: -1 -> 1 over `grace` steps, clamped to [1e-6, 1], x scale."""
    lam = -1.0 + 2.0 * step / grace
    return jnp.clip(lam, 1e-6, 1.0) * scale


def nppc_objective_real(w_mat: jnp.ndarray, err: jnp.ndarray,
                        step: jnp.ndarray, grace: int,
                        lambda_scale: float = 1.0,
                        eps: float = 1e-6
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """The inpainting-line NPPC loss.

    Args:
        w_mat: [B, n_dirs, ...] PC directions (post Gram-Schmidt).
        err:   [B, ...] restoration error (clean - frozen prediction).
        step:  global step (for the λ ramp).
    Returns:
        (reconst_err [B], objective scalar, log dict).
    Ref nppc_trainer.py:609-656.
    """
    b, n_dirs = w_mat.shape[:2]
    w_flat = w_mat.reshape(b, n_dirs, -1)
    w_norms = jnp.linalg.norm(w_flat, axis=2) + eps          # [B, n_dirs]
    w_hat = w_flat / w_norms[:, :, None]

    e = err.reshape(b, -1)
    err_norm = jnp.linalg.norm(e, axis=1) + eps              # [B]
    e = e / err_norm[:, None]
    w_norms = w_norms / err_norm[:, None]

    err_proj = jnp.einsum("bki,bi->bk", w_hat, e)            # [B, n_dirs]
    reconst_err = 1.0 - jnp.sum(jnp.square(err_proj), axis=1)
    second_moment_mse = jnp.square(
        jnp.square(w_norms) - lax.stop_gradient(jnp.square(err_proj)))

    lam = second_moment_lambda(step, grace, lambda_scale)
    objective = jnp.mean(reconst_err) + lam * jnp.mean(second_moment_mse)
    log = {"err_proj": err_proj, "w_norms": w_norms,
           "reconst_err": reconst_err,
           "second_moment_mse": second_moment_mse,
           "second_moment_lambda": lam}
    return reconst_err, objective, log


def nppc_objective_mc_aligned(w_mat: jnp.ndarray, w_mc_scaled: jnp.ndarray,
                              singular_values: jnp.ndarray, step: jnp.ndarray,
                              grace: int, lambda_scale: float = 1.0,
                              eps: float = 1e-6
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """The `base_step2` MC-PCA-aligned NPPC objective.

    Instead of projecting the restoration *error* onto the PC directions, each
    NPPC direction i is aligned to the i-th MC-dropout-PCA direction
    (reconst_err_i = 1 - <w_hat_i, w_mc_hat_i>^2) and the second moment targets
    the PCA *singular value* of that direction rather than the detached error
    projection. Ref nppc_trainer.py:244-336 (proj :298-307, stack/mean
    :313-315, objective :323).

    Args:
        w_mat: [B, n_dirs, ...] NPPC directions (post Gram-Schmidt).
        w_mc_scaled: [B, n_dirs, ...] MC-dropout PCA directions scaled by
            their singular values (calculate_unet_baseline
            'scaled_principal_components').
        singular_values: [B, n_dirs] the PCA singular values.
    Returns:
        (reconst_err [B] — per-item mean over dirs, objective scalar, log).
    """
    b, n_dirs = w_mat.shape[:2]
    w_flat = w_mat.reshape(b, n_dirs, -1)
    w_norms = jnp.linalg.norm(w_flat, axis=2) + eps          # [B, n_dirs]
    w_hat = w_flat / w_norms[:, :, None]

    # the MC basis is a fixed target: no gradient flows into it
    w_mc = lax.stop_gradient(w_mc_scaled.reshape(b, n_dirs, -1))
    mc_norms = jnp.linalg.norm(w_mc, axis=2) + eps
    w_mc_hat = w_mc / mc_norms[:, :, None]
    svals = lax.stop_gradient(singular_values)

    # per-direction cosine between NPPC dir i and MC-PCA dir i (ref :303)
    proj = jnp.sum(w_hat * w_mc_hat, axis=2)                 # [B, n_dirs]
    reconst_err = jnp.mean(1.0 - jnp.square(proj), axis=1)   # [B] (ref :313)
    second_moment_mse = jnp.mean(
        jnp.square(jnp.square(w_norms) - jnp.square(svals)), axis=1)

    lam = second_moment_lambda(step, grace, lambda_scale)
    objective = jnp.mean(reconst_err) + lam * jnp.mean(second_moment_mse)
    log = {"proj_w_mc_on_w_nppc": proj, "w_norms": w_norms,
           "reconst_err": reconst_err,
           "second_moment_mse": second_moment_mse,
           "second_moment_lambda": lam}
    return reconst_err, objective, log


def nppc_objective_complex(w_mat: jnp.ndarray, gt_crm: jnp.ndarray,
                           pred_crm: jnp.ndarray, step: jnp.ndarray,
                           grace: int, lambda_scale: float = 1.0,
                           eps: float = 1e-8
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """The denoising-line NPPC loss in cRM space (complex math in real pairs —
    no complex dtype on TPU).

    Args:
        w_mat: [B, n_dirs, 2, F, T] cRM directions.
        gt_crm, pred_crm: [B, 2, F', T] compressed masks (post drop_band).
    Ref nppc_audio/trainer.py:234-317.
    """
    b, n_dirs = w_mat.shape[:2]
    w_flat = w_mat.reshape(b, n_dirs, 2, -1)                 # [B, K, 2, D]
    w_norms = jnp.sqrt(jnp.sum(jnp.square(w_flat), axis=(2, 3)))  # [B, K]
    w_hat = w_flat / (w_norms[:, :, None, None] + eps)

    err = (gt_crm - pred_crm).reshape(b, 2, -1)              # [B, 2, D]
    err_norm = jnp.sqrt(jnp.sum(jnp.square(err), axis=(1, 2)))
    err = err / (err_norm[:, None, None] + eps)
    w_norms = w_norms / (err_norm[:, None] + eps)

    # err_proj = sum(conj(w_hat) * err) over D, complex in real pairs:
    # (wr - i wi) (er + i ei) = (wr*er + wi*ei) + i (wr*ei - wi*er)
    wr, wi = w_hat[:, :, 0], w_hat[:, :, 1]                  # [B, K, D]
    er, ei = err[:, 0][:, None], err[:, 1][:, None]          # [B, 1, D]
    proj_r = jnp.sum(wr * er + wi * ei, axis=-1)             # [B, K]
    proj_i = jnp.sum(wr * ei - wi * er, axis=-1)
    err_proj_mag = jnp.sqrt(proj_r ** 2 + proj_i ** 2)

    reconst_err = 1.0 - jnp.sum(jnp.square(err_proj_mag), axis=1)
    second_moment_mse = jnp.square(
        jnp.square(w_norms)
        - lax.stop_gradient(jnp.square(err_proj_mag)))
    lam = second_moment_lambda(step, grace, lambda_scale)
    objective = jnp.mean(reconst_err) + lam * jnp.mean(second_moment_mse)
    log = {"err_proj_mag": err_proj_mag, "w_norms": w_norms,
           "reconst_err": reconst_err,
           "second_moment_mse": second_moment_mse,
           "second_moment_lambda": lam}
    return reconst_err, objective, log
