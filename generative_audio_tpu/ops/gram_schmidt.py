"""Gram-Schmidt orthogonalization for NPPC principal-component heads.

Matches the reference's training-time gradient semantics exactly: the
projection vectors are *detached* (stop_gradient) normalized copies, while the
emitted orthogonalized directions stay un-normalized and differentiable.

References:
  real   — nppc_audio/inpainting/nppc/pc_wrapper.py:43-59
           (gram_schmidt_to_spec_mag), nppc/nppc.py:189-205 (gram_schmidt)
  complex — nppc_audio/pc_wrapper.py:8-44 (gram_schmidt_to_crm)

n_dirs is small (<= 5 in every reference config) so the sequential dependence
is a static python loop that XLA unrolls; each step is one batched inner
product + AXPY over [B, D] — pure VPU work that fuses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gram_schmidt", "gram_schmidt_to_spec_mag", "gram_schmidt_to_crm"]


def gram_schmidt(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Sequential Gram-Schmidt over axis 1.

    Args:
        x: [B, n_dirs, D] real or complex.
    Returns:
        [B, n_dirs, D] orthogonal (NOT normalized) directions; gradients flow
        through each direction but not through the projection basis.
    """
    n_dirs = x.shape[1]
    x_orth = []
    proj_vecs = []
    for i in range(n_dirs):
        w = x[:, i, :]
        for w2 in proj_vecs:
            # coefficient <w2, w> = sum(conj(w2) * w): the conjugate MUST
            # sit on the (unit) basis vector so that <w2, w'> == 0 after
            # the update. For real inputs this equals the reference's form;
            # for complex inputs the reference conjugates the wrong side
            # (see gram_schmidt_to_crm below).
            inner = jnp.sum(jnp.conj(w2) * w, axis=-1, keepdims=True)
            w = w - w2 * inner
        w_detached = jax.lax.stop_gradient(w)
        norm = jnp.linalg.norm(w_detached, axis=-1, keepdims=True) + eps
        proj_vecs.append(w_detached / norm)
        x_orth.append(w)
    return jnp.stack(x_orth, axis=1)


def gram_schmidt_to_spec_mag(x: jnp.ndarray) -> jnp.ndarray:
    """Real Gram-Schmidt over flattened [B, n_dirs, F, T] spectrogram dirs.
    Ref: inpainting/nppc/pc_wrapper.py:43-59."""
    shape = x.shape
    out = gram_schmidt(x.reshape(shape[0], shape[1], -1))
    return out.reshape(shape)


def gram_schmidt_to_crm(x: jnp.ndarray) -> jnp.ndarray:
    """Complex Gram-Schmidt over cRM directions [B, n_dirs, 2, F, T],
    computed entirely in real (real, imag) pair arithmetic — the axon TPU
    backend has no complex dtype support.

    DELIBERATE DIVERGENCE from the reference: nppc_audio/pc_wrapper.py:8-44
    computes the coefficient as sum(w.conj() * w2) — conjugate on the vector
    being orthogonalized instead of on the unit basis w2. With that
    convention <w2, w'> = inner - conj(inner) = 2i*Im<w, w2> != 0, so the
    reference's "orthogonalized" cRM directions are NOT orthogonal (only the
    real part of the overlap is removed), Sum|<w_hat_i, e>|^2 can exceed 1,
    and the NPPC reconst_err objective can be gamed below 0 by emitting
    near-parallel directions (observed: training collapses all directions
    onto the error). We implement the textbook coefficient
    sum(conj(w2) * w), which gives exact complex orthogonality and reduces
    to the reference's arithmetic for real inputs.
    """
    b, n_dirs, _, f, t = x.shape
    xr = x[:, :, 0].reshape(b, n_dirs, -1)
    xi = x[:, :, 1].reshape(b, n_dirs, -1)

    out_r, out_i = [], []
    proj_vecs = []  # list of (real, imag) detached unit vectors
    for i in range(n_dirs):
        wr, wi = xr[:, i, :], xi[:, i, :]
        for (pr, pi) in proj_vecs:
            # inner = sum(conj(w2) * w) = sum((pr - i pi)(wr + i wi))
            inner_r = jnp.sum(pr * wr + pi * wi, axis=-1, keepdims=True)
            inner_i = jnp.sum(pr * wi - pi * wr, axis=-1, keepdims=True)
            # w <- w - w2 * inner   (complex multiply w2 * inner)
            wr = wr - (pr * inner_r - pi * inner_i)
            wi = wi - (pr * inner_i + pi * inner_r)
        wr_d = jax.lax.stop_gradient(wr)
        wi_d = jax.lax.stop_gradient(wi)
        norm = jnp.sqrt(jnp.sum(wr_d ** 2 + wi_d ** 2, axis=-1, keepdims=True))
        proj_vecs.append((wr_d / norm, wi_d / norm))
        out_r.append(wr)
        out_i.append(wi)
    res_r = jnp.stack(out_r, axis=1).reshape(b, n_dirs, f, t)
    res_i = jnp.stack(out_i, axis=1).reshape(b, n_dirs, f, t)
    return jnp.stack([res_r, res_i], axis=2)
