"""Golden tests for cIRM math, unfold, drop_band, norms, Gram-Schmidt —
each checked against an independent torch/numpy re-derivation of the
reference semantics (SURVEY.md §2.1/§2.2)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from generative_audio_tpu.ops import (
    band_unfold, drop_band, build_complex_ideal_ratio_mask,
    build_ideal_ratio_mask, compress_cIRM, decompress_cIRM, apply_crm,
    offline_laplace_norm, cumulative_laplace_norm, offline_gaussian_norm,
    cumulative_layer_norm, forgetting_norm, sband_forgetting_norm,
    hybrid_norm, get_norm,
    gram_schmidt, gram_schmidt_to_crm, gram_schmidt_to_spec_mag,
    preprocess_data,
)


# ---------------------------------------------------------------- cIRM ----
def test_cirm_compress_decompress_roundtrip(rng):
    m = rng.uniform(-8, 8, size=(4, 17, 9, 2)).astype(np.float32)
    compressed = compress_cIRM(m)
    assert np.all(np.abs(np.asarray(compressed)) < 10)
    back = decompress_cIRM(compressed)
    np.testing.assert_allclose(np.asarray(back), m, atol=1e-3, rtol=1e-3)


def test_decompress_saturates_at_limit():
    out = np.asarray(decompress_cIRM(np.array([9.95, -9.95, 12.0])))
    expected = -10 * np.log((10 - 9.9) / (10 + 9.9))
    np.testing.assert_allclose(out, [expected, -expected, expected], rtol=1e-4)


def test_complex_irm_matches_torch_formula(rng):
    noisy = (rng.standard_normal((2, 5, 7))
             + 1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    clean = (rng.standard_normal((2, 5, 7))
             + 1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    ours = np.asarray(build_complex_ideal_ratio_mask(noisy, clean))

    tn, tc = torch.from_numpy(noisy), torch.from_numpy(clean)
    denom = tn.real ** 2 + tn.imag ** 2 + 1e-8
    mr = (tn.real * tc.real + tn.imag * tc.imag) / denom
    mi = (tn.real * tc.imag - tn.imag * tc.real) / denom
    ref = torch.stack((mr, mi), dim=-1)
    ref = 10 * (1 - torch.exp(-0.1 * ref)) / (1 + torch.exp(-0.1 * ref))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4, rtol=1e-4)


def test_apply_crm_inverts_ideal_mask(rng):
    noisy = (rng.standard_normal((2, 5, 7))
             + 1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    clean = (rng.standard_normal((2, 5, 7))
             + 1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    crm = decompress_cIRM(build_complex_ideal_ratio_mask(noisy, clean))
    er, ei = apply_crm(np.asarray(crm), noisy.real, noisy.imag)
    np.testing.assert_allclose(np.asarray(er), clean.real, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ei), clean.imag, atol=1e-2)


def test_magnitude_irm_shape(rng):
    out = build_ideal_ratio_mask(
        np.abs(rng.standard_normal((2, 5, 7))).astype(np.float32),
        np.abs(rng.standard_normal((2, 5, 7))).astype(np.float32))
    assert out.shape == (2, 5, 7, 1)


# -------------------------------------------------------------- unfold ----
def _torch_unfold(x, num_neighbor):
    """Literal re-derivation of BaseModel.unfold (base_model.py:14-46)."""
    x = torch.from_numpy(x)
    b, c, f, t = x.shape
    if num_neighbor < 1:
        return x.permute(0, 2, 1, 3).reshape(b, f, c, 1, t).numpy()
    out = x.reshape(b * c, 1, f, t)
    size = num_neighbor * 2 + 1
    out = tF.pad(out, [0, 0, num_neighbor, num_neighbor], mode="reflect")
    out = tF.unfold(out, (size, t))
    out = out.reshape(b, c, size, t, f).permute(0, 4, 1, 2, 3)
    return out.numpy()


@pytest.mark.parametrize("n", [0, 1, 5, 15])
def test_band_unfold_matches_reference(rng, n):
    x = rng.standard_normal((2, 1, 64, 12)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(band_unfold(x, n)),
                               _torch_unfold(x, n), atol=1e-6)


# ----------------------------------------------------------- drop_band ----
def _torch_drop_band(x, num_groups):
    """Literal re-derivation of feature.py:254-285."""
    x = torch.from_numpy(x)
    b, _, f, _ = x.shape
    if num_groups <= 1:
        return x.numpy()
    if f % num_groups != 0:
        x = x[..., : f - (f % num_groups), :]
        f = x.shape[2]
    out = []
    for g in range(num_groups):
        s = torch.index_select(x, 0, torch.arange(g, b, num_groups))
        s = torch.index_select(s, 2, torch.arange(g, f, num_groups))
        out.append(s)
    return torch.cat(out, dim=0).numpy()


@pytest.mark.parametrize("groups,freqs,batch", [(1, 257, 4), (2, 257, 6),
                                                (3, 32, 7), (4, 64, 8)])
def test_drop_band_matches_reference(rng, groups, freqs, batch):
    x = rng.standard_normal((batch, 2, freqs, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(drop_band(x, groups)),
                               _torch_drop_band(x, groups), atol=1e-6)


# --------------------------------------------------------------- norms ----
def test_offline_laplace_norm(rng):
    x = np.abs(rng.standard_normal((2, 1, 8, 6))).astype(np.float32)
    ref = x / (x.mean(axis=(1, 2, 3), keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(offline_laplace_norm(x)), ref,
                               rtol=1e-5)


def test_offline_gaussian_norm_uses_bessel(rng):
    x = rng.standard_normal((2, 1, 8, 6)).astype(np.float32)
    tx = torch.from_numpy(x)
    ref = ((tx - tx.mean(dim=(1, 2, 3), keepdim=True))
           / (tx.std(dim=(1, 2, 3), keepdim=True) + 1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(offline_gaussian_norm(x)), ref,
                               rtol=1e-4, atol=1e-5)


def test_cumulative_laplace_norm(rng):
    x = np.abs(rng.standard_normal((2, 1, 8, 6))).astype(np.float32)
    out = np.asarray(cumulative_laplace_norm(x))
    # Independent rederivation (base_model.py:227-257)
    f = 8
    cum = np.cumsum(x.sum(axis=2), axis=-1)           # [B, 1, T]
    counts = np.arange(f, f * 6 + 1, f, dtype=np.float32)
    ref = x / (cum / counts + 1e-8)[:, :, None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_cumulative_layer_norm_runs(rng):
    x = rng.standard_normal((2, 1, 8, 6)).astype(np.float32)
    out = np.asarray(cumulative_layer_norm(x))
    assert out.shape == x.shape and np.all(np.isfinite(out))


def test_forgetting_norm_matches_python_loop(rng):
    x = np.abs(rng.standard_normal((3, 8, 20))).astype(np.float32)
    out = np.asarray(forgetting_norm(x, sample_length_in_training=10))
    # python re-derivation (base_model.py:127-161)
    alpha = (10 - 1) / (10 + 1)
    mu = np.zeros((3,))
    mus = []
    for idx in range(20):
        fm = x[:, :, idx].mean(axis=1)
        if idx < 10:
            alp = min((idx - 1) / (idx + 1), alpha)
        else:
            alp = alpha
        mu = alp * mu + (1 - alp) * fm
        mus.append(mu)
    ref = x / (np.stack(mus, -1)[:, None, :] + 1e-10)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def _reference_base_model():
    from tests.reference_loader import load_reference
    load_reference()
    from FullSubNet_plus.speech_enhance.audio_zen.model.base_model import (
        BaseModel)
    return BaseModel


def test_forgetting_norm_reference_parity(rng):
    """Direct parity with the torch BaseModel.forgetting_norm loop."""
    BaseModel = _reference_base_model()
    x = np.abs(rng.standard_normal((2, 8, 24))).astype(np.float32)
    ref = BaseModel.forgetting_norm(torch.from_numpy(x), 10).numpy()
    np.testing.assert_allclose(
        np.asarray(forgetting_norm(x, sample_length_in_training=10)), ref,
        rtol=1e-3, atol=1e-5)


def test_sband_forgetting_norm_reference_parity(rng):
    """Parity with BaseModel.sband_forgetting_norm (base_model.py:90-126):
    past warmup the running mean updates from the middle band only."""
    BaseModel = _reference_base_model()
    x = np.abs(rng.standard_normal((2, 8, 24))).astype(np.float32) + 0.1
    ref = BaseModel.sband_forgetting_norm(torch.from_numpy(x), 10).numpy()
    np.testing.assert_allclose(
        np.asarray(sband_forgetting_norm(x, train_sample_length=10)), ref,
        rtol=1e-3, atol=1e-5)
    # differs from plain forgetting_norm once the cold branch engages
    plain = np.asarray(forgetting_norm(x, sample_length_in_training=10))
    assert np.abs(plain[..., 12:] - ref[..., 12:]).max() > 1e-4


def test_hybrid_norm_reference_parity(rng):
    """Parity with BaseModel.hybrid_norm (base_model.py:164-206)."""
    BaseModel = _reference_base_model()
    x = np.abs(rng.standard_normal((2, 8, 24))).astype(np.float32) + 0.1
    ref = BaseModel.hybrid_norm(torch.from_numpy(x), 10).numpy()
    np.testing.assert_allclose(
        np.asarray(hybrid_norm(x, sample_length_in_training=10)), ref,
        rtol=1e-3, atol=1e-5)


def test_get_norm_registers_all_seven(rng):
    """Every reference norm_type (base_model.py:90-315) is reachable from
    model configs; the 3-D forgetting family accepts the models' 4-D inputs
    through the channel-folding adapter."""
    names = ["offline_laplace_norm", "cumulative_laplace_norm",
             "offline_gaussian_norm", "cumulative_layer_norm",
             "forgetting_norm", "sband_forgetting_norm", "hybrid_norm"]
    x4 = np.abs(rng.standard_normal((2, 3, 8, 6))).astype(np.float32) + 0.1
    for name in names:
        out = np.asarray(get_norm(name)(x4))
        assert out.shape == x4.shape and np.all(np.isfinite(out)), name
    # 4-D adapter folds channels into frequency
    ref = np.asarray(forgetting_norm(x4.reshape(2, 24, 6))).reshape(x4.shape)
    np.testing.assert_allclose(
        np.asarray(get_norm("forgetting_norm")(x4)), ref, rtol=1e-6)
    with pytest.raises(NotImplementedError):
        get_norm("nope")


def test_fullsubnet_plus_accepts_forgetting_family_norms(rng):
    """A reference config with a forgetting-family norm_type must build and
    run (the reference's norm_wrapper raises for these; VERDICT round-1
    missing item #2)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.models import (
        FullSubNetPlus, FullSubNetPlusConfig)
    cfg = FullSubNetPlusConfig(
        num_freqs=16, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8, norm_type="sband_forgetting_norm")
    model = FullSubNetPlus(cfg, compute_dtype=jnp.float32)
    x = jnp.asarray(np.abs(rng.standard_normal((1, 1, 16, 12))),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, x, x)["params"]
    out = model.apply({"params": params}, x, x, x)
    assert out.shape == (1, 2, 16, 12)
    assert np.all(np.isfinite(np.asarray(out)))


# -------------------------------------------------------- gram-schmidt ----
def _torch_gs_real(x):
    """Literal re-derivation of inpainting pc_wrapper.py:43-59."""
    x = torch.from_numpy(x)
    shape = x.shape
    x = x.flatten(2)
    x_orth, proj = [], []
    for i in range(x.shape[1]):
        w = x[:, i, :]
        for w2 in proj:
            w = w - w2 * torch.sum(w * w2, dim=-1, keepdim=True)
        w_hat = w.detach() / w.detach().norm(dim=-1, keepdim=True)
        x_orth.append(w)
        proj.append(w_hat)
    return torch.stack(x_orth, dim=1).view(*shape).numpy()


def test_gram_schmidt_real_matches_reference(rng):
    x = rng.standard_normal((2, 5, 16, 10)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(gram_schmidt_to_spec_mag(x)),
                               _torch_gs_real(x), atol=1e-4)


def test_gram_schmidt_orthogonality(rng):
    x = rng.standard_normal((3, 4, 64)).astype(np.float32)
    w = np.asarray(gram_schmidt(x))
    g = np.einsum("bid,bjd->bij", w, w)
    off = g - np.eye(4)[None] * np.einsum("bid,bid->bi", w, w)[:, :, None]
    assert np.abs(off * (1 - np.eye(4))).max() < 1e-3


def _torch_gs_crm(x, reference_convention: bool):
    """Torch re-derivation of nppc_audio/pc_wrapper.py:8-44. With
    reference_convention=True uses the reference's literal coefficient
    sum(w.conj() * w2) — which does NOT orthogonalize complex vectors
    (<w2, w'> = 2i*Im<w, w2>); False uses the textbook sum(w2.conj() * w)."""
    x = torch.from_numpy(x)
    xc = torch.complex(x[:, :, 0], x[:, :, 1])
    b, n, f, t = xc.shape
    xf = xc.reshape(b, n, -1)
    x_orth, proj = [], []
    for i in range(n):
        w = xf[:, i]
        for w2 in proj:
            if reference_convention:
                coef = torch.sum(w.conj() * w2, dim=1, keepdim=True)
            else:
                coef = torch.sum(w2.conj() * w, dim=1, keepdim=True)
            w = w - w2 * coef
        w_hat = w.detach() / w.detach().norm(dim=1, keepdim=True)
        x_orth.append(w)
        proj.append(w_hat)
    out = torch.stack(x_orth, dim=1).reshape(b, n, f, t)
    return torch.stack([out.real, out.imag], dim=2).numpy()


def _complex_cosines(w):
    """Pairwise |<w_i, w_j>| / (|w_i||w_j|) over [B, n, 2, F, T]."""
    b, n = w.shape[:2]
    wf = w.reshape(b, n, 2, -1)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            rr = (wf[:, i, 0] * wf[:, j, 0] + wf[:, i, 1] * wf[:, j, 1]).sum(-1)
            im = (wf[:, i, 0] * wf[:, j, 1] - wf[:, i, 1] * wf[:, j, 0]).sum(-1)
            ni = np.sqrt((wf[:, i] ** 2).sum((1, 2)))
            nj = np.sqrt((wf[:, j] ** 2).sum((1, 2)))
            out[i, j] = (np.sqrt(rr ** 2 + im ** 2) / (ni * nj + 1e-12)).max()
    return out


def test_gram_schmidt_complex_orthogonality_and_convention(rng):
    """The complex GS must produce truly orthogonal directions — the
    reference's literal coefficient (conj on the wrong side,
    nppc_audio/pc_wrapper.py:42) does not, which lets the NPPC objective
    collapse (reconst_err < 0). We match the corrected torch rederivation
    and assert the reference convention is indeed broken."""
    x = rng.standard_normal((2, 3, 2, 8, 6)).astype(np.float32)
    ours = np.asarray(gram_schmidt_to_crm(x))
    np.testing.assert_allclose(ours, _torch_gs_crm(x, False), atol=1e-4)

    cos = _complex_cosines(ours)
    assert cos[~np.eye(3, dtype=bool).reshape(3, 3)].max() < 1e-3

    ref = _torch_gs_crm(x, True)
    ref_cos = _complex_cosines(ref)
    assert ref_cos[~np.eye(3, dtype=bool)].max() > 0.05  # genuinely broken


# ---------------------------------------------------------- preprocess ----
def test_preprocess_data_matches_reference(rng):
    clean = rng.standard_normal((2, 2, 16, 12)).astype(np.float32)
    mask = (rng.uniform(size=(2, 12)) > 0.3).astype(np.float32)
    masked = clean * mask[:, None, None, :]
    c_out, m_out, x_out = preprocess_data(clean, masked, mask)

    tc, tm = torch.from_numpy(clean), torch.from_numpy(masked)
    tmask = torch.from_numpy(mask).unsqueeze(1).unsqueeze(2).expand(-1, 1, 16, -1)
    cmag = torch.sqrt(tc[:, 0] ** 2 + tc[:, 1] ** 2).unsqueeze(1)
    mmag = torch.sqrt(tm[:, 0] ** 2 + tm[:, 1] ** 2).unsqueeze(1)
    clog = torch.log(cmag + 1e-6)
    mean, std = clog.mean(), clog.std()
    ref_c = (clog - mean) / std
    ref_m = (torch.log(mmag + 1e-6) - mean) / std
    np.testing.assert_allclose(np.asarray(c_out), ref_c.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_out), ref_m.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_out), tmask.numpy(), atol=1e-6)
