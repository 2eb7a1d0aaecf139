"""NPPC validation stack tests: MC-dropout PCA vs sklearn, principal angles
vs torch rederivation, YIN pitch on known tones, end-to-end validator run."""
import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from generative_audio_tpu.eval.mc_dropout import (
    compute_pca_batch, calculate_unet_baseline)
from generative_audio_tpu.eval.nppc_validator import (
    compute_metrics, NPPCValidator, NPPCValidatorConfig, organize_jsons)
from generative_audio_tpu.eval.pitch import yin_pitch_track


def test_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA
    x = rng.standard_normal((20, 3, 40)).astype(np.float32)
    comps, scaled, importance, mean, svals = compute_pca_batch(x, 5)
    for b in range(3):
        pca = PCA(n_components=5)
        pca.fit(x[:, b, :])
        ours = np.asarray(comps)[b]
        ref = pca.components_
        # match up to sign per component
        for k in range(5):
            dot = abs(np.dot(ours[k], ref[k])
                      / (np.linalg.norm(ours[k]) * np.linalg.norm(ref[k])))
            assert dot > 0.999, f"component {k} mismatch (b={b})"
        np.testing.assert_allclose(np.asarray(svals)[b],
                                   pca.singular_values_, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(mean)[b], pca.mean_, atol=1e-5)


def test_mc_dropout_chunked_matches_unchunked(rng):
    """lax.map-chunked MC passes (the round-5 HBM fix: a 50-wide vmapped
    UNet needs ~38 GB of simultaneous activations) must be bit-identical
    to the one-shot vmap — same keys, same outputs, any chunk size
    including non-dividing ones (largest-divisor fallback)."""
    from generative_audio_tpu.eval.mc_dropout import mc_dropout_inference

    x = jnp.asarray(rng.standard_normal((2, 1, 8, 10)).astype(np.float32))
    mask = jnp.ones_like(x)

    def apply_fn(variables, spec, m, rngs):
        # derive the per-pass perturbation from the key BITS, not from a
        # jax.random sampler: sampler bit-streams can legally differ
        # between batching layouts, while flax's per-key dropout (the real
        # consumer) is deterministic per key — key-bits model that
        key = rngs["dropout"]
        bits = jnp.asarray(jax.random.key_data(key), jnp.float32).sum()
        return spec * m + 1e-9 * bits

    key = jax.random.PRNGKey(3)
    ref = np.asarray(mc_dropout_inference(apply_fn, {}, x, mask, key, 12))
    for chunk in (1, 3, 4, 5, 12, 40):   # 5 exercises the divisor fallback
        out = np.asarray(mc_dropout_inference(apply_fn, {}, x, mask, key,
                                              12, chunk_size=chunk))
        np.testing.assert_array_equal(out, ref, err_msg=f"chunk={chunk}")


def test_principal_angles_match_torch(rng):
    import torch
    a = rng.standard_normal((1, 4, 8, 10)).astype(np.float32)
    b = rng.standard_normal((1, 4, 8, 10)).astype(np.float32)
    pred = rng.standard_normal((1, 1, 8, 10)).astype(np.float32)
    clean = rng.standard_normal((1, 1, 8, 10)).astype(np.float32)
    mask = np.ones((1, 1, 8, 10), np.float32)
    mask[..., 3:6] = 0
    m = compute_metrics(a, b, pred, pred, clean, mask)

    # torch rederivation of the angle computation (ref :785-810)
    ta = torch.from_numpy(a).reshape(4, -1)
    tb = torch.from_numpy(b).reshape(4, -1)
    qa, _ = torch.linalg.qr(ta.T)
    qb, _ = torch.linalg.qr(tb.T)
    s = torch.linalg.svdvals(qa.T @ qb)
    ref_angles = (torch.arccos(torch.clamp(s, -1, 1)) * 180 / np.pi).tolist()
    np.testing.assert_allclose(m["principal_angles"], ref_angles, atol=1e-2)

    # identical subspace -> all angles ~ 0
    m2 = compute_metrics(a, a, pred, pred, clean, mask)
    assert max(m2["principal_angles"]) < 0.1  # float32 QR/SVD noise


def test_residual_error_zero_when_error_in_span(rng):
    e = rng.standard_normal((1, 1, 4, 5)).astype(np.float32)
    dirs = e.reshape(1, 1, 4, 5)  # error IS the single direction
    clean = np.zeros_like(e)
    mask = np.zeros_like(e)
    m = compute_metrics(dirs, dirs, e, e, clean, mask)
    assert m["nppc"]["residual_error"] < 1e-4


def test_yin_pitch_tracks_tone():
    sr = 16000
    t = np.arange(sr) / sr
    for f0 in (110.0, 220.0, 330.0):
        tone = np.sin(2 * np.pi * f0 * t)
        est, voiced, _ = yin_pitch_track(tone, sr)
        assert voiced.mean() > 0.8
        assert abs(np.nanmedian(est) - f0) < 3.0
    noise = np.random.default_rng(0).standard_normal(sr) * 0.01
    est, voiced, _ = yin_pitch_track(noise, sr)
    assert voiced.mean() < 0.5


def test_mc_dropout_baseline_shapes(rng):
    f, t = 16, 20

    def fake_apply(variables, x, mask, rngs=None):
        key = rngs["dropout"] if rngs else jax.random.PRNGKey(0)
        noise = jax.random.normal(key, x.shape)
        return x + 0.1 * noise

    masked = jnp.asarray(rng.standard_normal((2, 1, f, t)), jnp.float32)
    mask = np.ones((2, 1, f, t), np.float32)
    mask[..., 8:12] = 0
    out = calculate_unet_baseline(fake_apply, {}, masked, jnp.asarray(mask),
                                  jax.random.PRNGKey(1), n_mc_samples=12,
                                  n_components=4)
    assert out["mean_prediction"].shape == (2, 1, f, t)
    assert out["principal_components"].shape == (2, 4, f, t)
    assert out["importance_weights"].shape == (2, 4)
    # PCs live only in the gap
    pcs = np.asarray(out["principal_components"])
    assert np.abs(pcs * mask[:, :1]).max() < 1e-6


def test_validator_end_to_end(tmp_path, rng):
    """Full validate_sample with tiny fake models -> JSON + PNG + wavs."""
    f, t = 16, 32

    def nppc_apply(v, x, m):
        key = jax.random.PRNGKey(3)
        dirs = jax.random.normal(key, (x.shape[0], 3, f, t))
        return dirs * (1 - m)

    def rest_apply(v, x, m, rngs=None):
        if rngs is not None:
            return x + 0.05 * jax.random.normal(rngs["dropout"], x.shape)
        return x

    cfg = NPPCValidatorConfig(save_dir=str(tmp_path), n_mc_samples=10,
                              n_components=3, nfft=30, hop_length=16,
                              win_length=30)
    val = NPPCValidator(nppc_apply, {}, rest_apply, {}, cfg)
    masked = jnp.asarray(rng.standard_normal((1, 1, f, t)), jnp.float32)
    mask = np.ones((1, 1, f, t), np.float32)
    mask[..., 10:20] = 0
    clean = jnp.asarray(rng.standard_normal((1, 1, f, t)), jnp.float32)
    phase = rng.uniform(-np.pi, np.pi, (f, t)).astype(np.float32)

    metrics = val.validate_sample(masked, jnp.asarray(mask), clean,
                                  sample_idx=7, stats=(0.0, 1.0),
                                  clean_phase=phase)
    assert "principal_angles" in metrics
    out_dir = tmp_path / "sample_7"
    assert (out_dir / "metrics_sample_7.json").exists()
    assert (out_dir / "pc_spectrograms.png").exists()
    assert len(list(out_dir.glob("pc*alpha*.wav"))) == 3 * 5

    df = organize_jsons(tmp_path, output_path=tmp_path / "agg.png")
    assert len(df) == 1 and (tmp_path / "agg.png").exists()


def test_denoising_validator(tmp_path, rng):
    from generative_audio_tpu.eval.nppc_denoising_validator import (
        DenoisingNPPCValidator, DenoisingNPPCValidatorConfig)
    from generative_audio_tpu.ops.mask import compress_cIRM

    def model_apply(v, wav):
        key = jax.random.PRNGKey(0)
        return 0.1 * jax.random.normal(key, (wav.shape[0], 2, 2, 257, 63))

    def crm_apply(v, wav):
        ones = jnp.ones((wav.shape[0], 257, 63))
        return compress_cIRM(jnp.stack([ones, jnp.zeros_like(ones)], axis=1))

    cfg = DenoisingNPPCValidatorConfig(save_dir=str(tmp_path))
    val = DenoisingNPPCValidator(model_apply, crm_apply, {}, cfg)
    noisy = rng.standard_normal(16000 - 128).astype(np.float32) * 0.1
    clean = rng.standard_normal(16000 - 128).astype(np.float32) * 0.1
    out = val.validate_sample(noisy, clean_waveform=clean, sample_idx=0)
    d = Path(out["save_dir"])
    # the reference's 9-column figure name (validator.py:293)
    assert (d / "pc_spectrograms_variations.png").exists()
    assert (d / "enhanced.wav").exists()
    assert (d / "clean.wav").exists()
    assert len(out["variations"]) == 2 * 6


def test_restoration_validator(tmp_path, rng):
    """Standalone restoration validator (validator_restoration_model.py:43-166):
    gap MSE matches the reference formula; 2x2 figure + JSON written."""
    import torch
    from generative_audio_tpu.eval.restoration_validator import (
        RestorationValidator, RestorationValidatorConfig)
    from generative_audio_tpu.ops.preprocess import preprocess_data

    b, f, t = 1, 16, 32
    clean_spec = rng.standard_normal((b, 2, f, t)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, 10:18] = 0
    masked_spec = clean_spec * mask[:, None, None, :]

    # a deterministic fake model: echoes the masked input
    def apply_fn(variables, x, mask4):
        return np.asarray(x)

    cfg = RestorationValidatorConfig(save_dir=str(tmp_path / "v"),
                                     sample_len_seconds=0.5)
    val = RestorationValidator(apply_fn, None, cfg)
    r = val.validate_sample(masked_spec, mask, clean_spec, sample_idx=0)

    # torch rederivation of the gap MSE (ref :153-156)
    cl, m4, mk = preprocess_data(clean_spec, masked_spec, mask)
    out = torch.from_numpy(np.asarray(mk))
    clean_t = torch.from_numpy(np.asarray(cl))
    omask = 1 - torch.from_numpy(np.asarray(m4))
    ref_mse = (((out - clean_t) ** 2) * omask).sum() / omask.sum()
    np.testing.assert_allclose(r["mse"], float(ref_mse), rtol=1e-5)
    assert (tmp_path / "v" / "spectrogram_comparison_0.png").exists()

    # loader-level aggregation
    loader = [(masked_spec, mask, clean_spec)] * 3
    summary = val.validate_dataloader(loader, max_samples=2)
    assert summary["num_samples"] == 2
    np.testing.assert_allclose(summary["mean_gap_mse"], r["mse"], rtol=1e-5)
    assert (tmp_path / "v" / "restoration_validation.json").exists()
