"""Golden tests for the training objectives vs torch rederivations of the
reference formulas (nppc_trainer.py:609-687, nppc_audio/trainer.py:234-317,
restoration_trainer.py:178-200)."""
import numpy as np
import torch

from generative_audio_tpu import losses


def test_masked_mse(rng):
    pred = rng.standard_normal((2, 1, 8, 10)).astype(np.float32)
    tgt = rng.standard_normal((2, 1, 8, 10)).astype(np.float32)
    mask = (rng.uniform(size=(2, 1, 8, 10)) > 0.4).astype(np.float32)
    out = float(losses.masked_mse_loss(pred, tgt, mask))
    tp, tt, tm = map(torch.from_numpy, (pred, tgt, mask))
    ref = (((tp - tt) ** 2) * (1 - tm)).sum() / (1 - tm).sum()
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_lambda_ramp():
    # -1 + 2*step/grace clamped to [1e-6, 1]
    np.testing.assert_allclose(
        float(losses.second_moment_lambda(np.float32(0), 500)), 1e-6,
        rtol=1e-4)
    np.testing.assert_allclose(
        float(losses.second_moment_lambda(np.float32(375), 500)), 0.5,
        rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.second_moment_lambda(np.float32(10000), 500)), 1.0,
        rtol=1e-6)


def test_nppc_objective_real_matches_reference(rng):
    w_mat = rng.standard_normal((3, 5, 16, 12)).astype(np.float32)
    err = rng.standard_normal((3, 1, 16, 12)).astype(np.float32)
    step = np.float32(600)
    reconst, obj, log = losses.nppc_objective_real(
        w_mat, err, step, grace=500, lambda_scale=1.0)

    # torch rederivation (nppc_trainer.py:616-656, 680-687)
    tw = torch.from_numpy(w_mat).flatten(2)
    w_norms = tw.norm(dim=2) + 1e-6
    w_hat = tw / w_norms[:, :, None]
    e = torch.from_numpy(err).flatten(1)
    err_norm = e.norm(dim=1) + 1e-6
    e = e / err_norm[:, None]
    w_norms = w_norms / err_norm[:, None]
    err_proj = torch.einsum("bki,bi->bk", w_hat, e)
    reconst_ref = 1 - err_proj.pow(2).sum(dim=1)
    smm = (w_norms.pow(2) - err_proj.detach().pow(2)).pow(2)
    lam = min(max(-1 + 2 * 600 / 500, 1e-6), 1)
    obj_ref = reconst_ref.mean() + lam * smm.mean()

    np.testing.assert_allclose(np.asarray(reconst), reconst_ref.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(obj), float(obj_ref), rtol=1e-4)


def test_nppc_objective_complex_matches_reference(rng):
    w_mat = rng.standard_normal((2, 4, 2, 8, 6)).astype(np.float32)
    gt = rng.standard_normal((2, 2, 8, 6)).astype(np.float32)
    pred = rng.standard_normal((2, 2, 8, 6)).astype(np.float32)
    step = np.float32(100)
    reconst, obj, log = losses.nppc_objective_complex(
        w_mat, gt, pred, step, grace=500, lambda_scale=1.0)

    # torch rederivation (nppc_audio/trainer.py:253-305)
    tw = torch.from_numpy(w_mat).reshape(2, 4, 2, -1)
    w_norms = torch.norm(tw, dim=(2, 3))
    w_hat = tw / (w_norms[..., None, None] + 1e-8)
    e = (torch.from_numpy(gt) - torch.from_numpy(pred)).reshape(2, 2, -1)
    err_norm = torch.norm(e, dim=(1, 2))
    e = e / (err_norm[:, None, None] + 1e-8)
    w_norms = w_norms / (err_norm[:, None] + 1e-8)
    ec = torch.complex(e[:, 0], e[:, 1])
    wc = torch.complex(w_hat[:, :, 0], w_hat[:, :, 1])
    err_proj = torch.sum(wc.conj() * ec[:, None], dim=-1)
    err_proj_mag = torch.abs(err_proj)
    reconst_ref = 1 - err_proj_mag.pow(2).sum(dim=1)
    smm = (w_norms.pow(2) - err_proj_mag.detach().pow(2)).pow(2)
    lam = min(max(-1 + 2 * 100 / 500, 1e-6), 1)
    obj_ref = reconst_ref.mean() + lam * smm.mean()

    np.testing.assert_allclose(np.asarray(reconst), reconst_ref.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(obj), float(obj_ref), rtol=1e-4)


def test_nppc_real_gradient_pattern(rng):
    """second-moment term must not backprop through err_proj (detached)."""
    import jax
    w = rng.standard_normal((1, 2, 10)).astype(np.float32)
    e = rng.standard_normal((1, 10)).astype(np.float32)

    def obj(w):
        _, o, _ = losses.nppc_objective_real(w, e, np.float32(10000),
                                             grace=500)
        return o

    g = jax.grad(obj)(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_nppc_objective_mc_aligned_matches_reference(rng):
    """base_step2 rederivation (nppc_trainer.py:244-336): per-direction
    cosine to the MC-PCA basis + singular-value second moment."""
    w_mat = rng.standard_normal((3, 4, 16, 12)).astype(np.float32)
    w_mc = rng.standard_normal((3, 4, 16, 12)).astype(np.float32)
    svals = np.abs(rng.standard_normal((3, 4))).astype(np.float32)
    step = np.float32(600)
    reconst, obj, log = losses.nppc_objective_mc_aligned(
        w_mat, w_mc, svals, step, grace=500, lambda_scale=1.0)

    # torch rederivation (nppc_trainer.py:254-323)
    tw = torch.from_numpy(w_mat).flatten(2)
    w_norms = tw.norm(dim=2) + 1e-6
    w_hat = tw / w_norms[:, :, None]
    tmc = torch.from_numpy(w_mc).flatten(2)
    mc_norms = tmc.norm(dim=2) + 1e-6
    mc_hat = tmc / mc_norms[:, :, None]
    proj, rec_l, smm_l = [], [], []
    for i in range(w_hat.shape[1]):               # ref :298-310
        p = torch.sum(w_hat[:, i] * mc_hat[:, i], dim=1)
        proj.append(p)
        rec_l.append(1 - p.pow(2))
        smm_l.append((w_norms[:, i].pow(2)
                      - torch.from_numpy(svals)[:, i].pow(2)).pow(2))
    reconst_ref = torch.stack(rec_l, dim=1).mean(dim=1)     # ref :313
    smm_ref = torch.stack(smm_l, dim=1).mean(dim=1)         # ref :314
    lam = min(max(-1 + 2 * 600 / 500, 1e-6), 1)
    obj_ref = reconst_ref.mean() + lam * smm_ref.mean()

    np.testing.assert_allclose(np.asarray(reconst), reconst_ref.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(obj), float(obj_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(log["proj_w_mc_on_w_nppc"]),
                               torch.stack(proj, dim=1).numpy(),
                               atol=1e-5, rtol=1e-4)


def test_nppc_mc_aligned_gradient_pattern():
    """Gradient flows only through w_mat; the MC basis and singular values
    are fixed targets (ref: W_mc comes from a frozen no-grad model)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((2, 3, 8, 6)), jnp.float32)
    mc = jnp.asarray(rng.standard_normal((2, 3, 8, 6)), jnp.float32)
    sv = jnp.asarray(np.abs(rng.standard_normal((2, 3))), jnp.float32)

    def f(w, mc, sv):
        return losses.nppc_objective_mc_aligned(
            w, mc, sv, jnp.float32(1000), grace=500)[1]

    gw, gmc, gsv = jax.grad(f, argnums=(0, 1, 2))(w, mc, sv)
    assert float(jnp.abs(gw).max()) > 0
    assert float(jnp.abs(gmc).max()) == 0
    assert float(jnp.abs(gsv).max()) == 0


def test_masked_mse_no_gap_is_finite():
    """A degenerate all-known mask (no gap) must not produce NaN (0/0) —
    one poisoned batch would corrupt Adam state for the rest of the run."""
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.losses import masked_mse_loss

    pred = jnp.ones((2, 1, 4, 6))
    target = jnp.zeros((2, 1, 4, 6))
    mask = jnp.ones((2, 1, 4, 6))          # 1 = known everywhere
    loss = masked_mse_loss(pred, target, mask)
    assert jnp.isfinite(loss)
    assert float(loss) == 0.0
    g = jax.grad(lambda p: masked_mse_loss(p, target, mask))(pred)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_si_snr_loss_matches_reference(rng):
    """Torch rederivation of audio_zen/loss.py:7-31 (si_snr_loss), eps
    placements included: -mean(20*log10(eps + ||t|| / (||x-t|| + eps)))."""
    from generative_audio_tpu.losses import si_snr_loss

    s = rng.standard_normal((3, 4000)).astype(np.float32)
    x = s + 0.3 * rng.standard_normal((3, 4000)).astype(np.float32)
    out = float(si_snr_loss(x, s))

    eps = 1e-8
    tx, ts = torch.from_numpy(x), torch.from_numpy(s)
    x_zm = tx - tx.mean(dim=-1, keepdim=True)
    s_zm = ts - ts.mean(dim=-1, keepdim=True)
    t = ((x_zm * s_zm).sum(dim=-1, keepdim=True) * s_zm
         / (s_zm.norm(dim=-1, keepdim=True) ** 2 + eps))
    ref = -torch.mean(20 * torch.log10(
        eps + t.norm(dim=-1) / ((x_zm - t).norm(dim=-1) + eps)))
    np.testing.assert_allclose(out, float(ref), rtol=1e-4)

    # perfect reconstruction (up to scale — the loss is scale-invariant):
    # strongly negative loss, and scaling must not change it materially
    perfect = float(si_snr_loss(2.0 * s, s))
    assert perfect < -80.0


def test_cirm_l1_loss(rng):
    from generative_audio_tpu.losses import cirm_l1_loss
    a = rng.standard_normal((2, 2, 8, 10)).astype(np.float32)
    b = rng.standard_normal((2, 2, 8, 10)).astype(np.float32)
    np.testing.assert_allclose(float(cirm_l1_loss(a, b)),
                               np.abs(a - b).mean(), rtol=1e-6)


def test_enhance_loss_type_variants(rng):
    """The [loss_function] config block (train.toml:17-19): every selectable
    loss trains to a finite scalar; invalid combinations raise."""
    import jax
    import pytest
    from generative_audio_tpu import train as T
    from generative_audio_tpu.models.fullsubnet_plus import (
        FullSubNetPlusConfig)

    tiny = FullSubNetPlusConfig(
        num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
        sb_model_hidden_size=8, num_groups_in_drop_band=2)
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)

    vals = {}
    for loss_type in ("mse", "l1", "si_snr", "si_snr_wave"):
        cfg = T.EnhanceTrainConfig(model=tiny, n_fft=62, hop_length=32,
                                   win_length=62, compute_dtype="float32",
                                   loss_type=loss_type)
        state = T.init_enhance_state(cfg, jax.random.PRNGKey(0))
        step = T.make_enhance_train_step(cfg, donate=False)
        state, loss = step(state, noisy, clean)
        assert np.isfinite(float(loss))
        vals[loss_type] = float(loss)
    # si_snr variants are in (negative) dB, not mask units
    assert vals["mse"] != vals["si_snr"]
    assert vals["si_snr"] != vals["si_snr_wave"]

    # invalid combinations fail at CONFIG construction, before any jit
    with pytest.raises(ValueError):
        T.EnhanceTrainConfig(model=tiny, loss_type="si_snr",
                             loss_alpha=0.5)
    with pytest.raises(ValueError):
        T.EnhanceTrainConfig(model=tiny, loss_type="nope")


def test_si_snr_loss_silent_reference_grad_finite():
    """A silent clean row makes the projection t exactly zero; the safe-norm
    form must keep gradients finite (the torch reference NaNs here)."""
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.losses import si_snr_loss

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 256)),
                    jnp.float32)
    s = x.at[1].set(0.0)                      # one silent reference row
    g = jax.grad(lambda x: si_snr_loss(x, s))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
