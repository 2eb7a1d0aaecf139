"""End-to-end training smoke tests: tiny models, synthetic data, a few steps
each for the three training lines; checkpoint save/restore roundtrips."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from generative_audio_tpu.models import FullSubNetPlusConfig
from generative_audio_tpu.models.nppc_model import (
    UNetModelConfig, InpaintingNPPCConfig)
from generative_audio_tpu.models.pc_wrapper import (
    AudioInpaintingPCWrapperConfig)
from generative_audio_tpu import train as T


TINY_FSP = FullSubNetPlusConfig(
    num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
    sb_model_hidden_size=8, num_groups_in_drop_band=2)


def _enhance_cfg():
    return T.EnhanceTrainConfig(model=TINY_FSP, n_fft=62, hop_length=32,
                                win_length=62, compute_dtype="float32")


def test_enhance_train_step_reduces_loss(rng):
    cfg = _enhance_cfg()
    state = T.init_enhance_state(cfg, jax.random.PRNGKey(0))
    step = T.make_enhance_train_step(cfg, donate=False)
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    losses = []
    for _ in range(8):
        state, loss = step(state, noisy, clean)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_enhance_trainer_epochs_and_checkpoint(tmp_path, rng):
    from generative_audio_tpu.utils.tracking import ExperimentTracker
    cfg = _enhance_cfg()
    tracker = ExperimentTracker(tmp_path / "runs", run_name="enh")
    trainer = T.EnhanceTrainer(cfg, checkpoint_dir=tmp_path / "ckpt",
                               tracker=tracker)
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    loader = [(noisy, clean)] * 2
    trainer.train(loader, epochs=2, log=lambda *a: None)
    assert len(trainer.loss_history) == 2
    assert (tmp_path / "ckpt" / "latest").exists()
    assert trainer.ckpt.latest_step() == 4
    # tracker scalars + self-contained HTML run report
    rows = tracker.read_scalars()
    assert len(rows) == 2 and "train_loss" in rows[0]
    report = (tmp_path / "ckpt" / "report.html").read_text()
    assert "data:image/png;base64," in report


def test_enhance_probe_inclusive_selection(tmp_path, rng):
    """Opt-in probe-inclusive best-model selection: with probe_weight the
    criterion is (1-w)*val + w*probe composite, so a checkpoint that wins
    in-distribution but regresses the robustness probe loses selection —
    the policy lever the round-4 near-clean A/B motivated (default stays
    the reference's in-distribution composite, base_trainer.py:296-303)."""
    import json

    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    loader = [(noisy, clean)]
    # scripted (val, probe) composites: epoch 1 robust, epoch 2 wins
    # in-distribution only
    script = {"val": [0.50, 0.60], "probe": [0.90, 0.20]}

    def run(probe_weight):
        cfg = _enhance_cfg()
        d = tmp_path / f"ckpt_w{probe_weight}"
        trainer = T.EnhanceTrainer(cfg, checkpoint_dir=d)
        calls = {"n": 0}

        def fake_validate(dataset, max_items=10):
            kind = "val" if dataset == "VAL" else "probe"
            idx = calls["n"] // (2 if probe_weight else 1)
            calls["n"] += 1
            return {"composite": script[kind][min(idx, 1)]}

        trainer.validate = fake_validate
        trainer.train(loader, epochs=2, val_dataset="VAL",
                      probe_dataset="PROBE" if probe_weight else None,
                      probe_weight=probe_weight, log=lambda *a: None)
        return json.loads((d / "best_score.json").read_text())

    default = run(0.0)
    assert default["step"] == 2          # in-distribution pick: epoch 2
    blended = run(0.5)
    assert blended["step"] == 1          # probe-inclusive pick: epoch 1
    assert blended["score"] == pytest.approx(0.5 * 0.50 + 0.5 * 0.90)


def test_enhance_probe_recorded_at_zero_weight(tmp_path, rng):
    """A probe_dataset with probe_weight=0 is evaluated and RECORDED
    (probe_history) but never drives selection — the post-hoc-sweep
    regime (round 5): selection stays the reference's in-distribution
    composite while every validation point carries the probe score."""
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    loader = [(noisy, clean)]
    script = {"val": [0.50, 0.60], "probe": [0.90, 0.20]}
    cfg = _enhance_cfg()
    trainer = T.EnhanceTrainer(cfg, checkpoint_dir=tmp_path / "c")
    calls = {"n": 0}

    def fake_validate(dataset, max_items=10):
        kind = "val" if dataset == "VAL" else "probe"
        idx = calls["n"] // 2
        calls["n"] += 1
        return {"composite": script[kind][min(idx, 1)]}

    trainer.validate = fake_validate
    trainer.train(loader, epochs=2, val_dataset="VAL",
                  probe_dataset="PROBE", probe_weight=0.0,
                  log=lambda *a: None)
    assert [p for _, p in trainer.probe_history] == [0.90, 0.20]
    import json
    meta = json.loads((tmp_path / "c" / "best_score.json").read_text())
    assert meta["step"] == 2 and meta["probe_weight"] == 0.0
    assert meta["score"] == pytest.approx(0.60)   # pure val composite


def test_enhance_selection_criterion_reset_on_resume(tmp_path, rng):
    """A resume that changes probe_weight must not compare a blended
    best score against plain composites (incommensurate scales): the
    trainer warns and resets best-model tracking."""
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    loader = [(noisy, clean)]
    cfg = _enhance_cfg()
    d = tmp_path / "c"
    trainer = T.EnhanceTrainer(cfg, checkpoint_dir=d)
    trainer.validate = lambda ds, max_items=10: {"composite": 0.9}
    trainer.train(loader, epochs=1, val_dataset="VAL",
                  probe_dataset="PROBE", probe_weight=0.5,
                  log=lambda *a: None)
    assert trainer.best_score == pytest.approx(0.9)   # blended (both 0.9)

    resumed = T.EnhanceTrainer(cfg, checkpoint_dir=d)
    assert resumed.restore_latest()
    assert resumed.best_score == pytest.approx(0.9)
    resumed.validate = lambda ds, max_items=10: {"composite": 0.5}
    with pytest.warns(UserWarning, match="incommensurate"):
        resumed.train(loader, epochs=1, val_dataset="VAL",
                      log=lambda *a: None)
    # best was reset, so the (lower) plain composite claimed best/
    import json
    meta = json.loads((d / "best_score.json").read_text())
    assert meta["score"] == pytest.approx(0.5)
    assert meta["probe_weight"] == 0.0


def _inpaint_batch(rng, b=2, f=32, t=64):
    clean_spec = rng.standard_normal((b, 2, f, t)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, 20:30] = 0
    masked_spec = clean_spec * mask[:, None, None, :]
    return masked_spec, mask, clean_spec


def test_restoration_trainer(tmp_path, rng):
    cfg = T.RestorationTrainConfig(
        model=UNetModelConfig(in_channels=1, out_channels=1, dropout=0.2),
        num_freqs=32, num_frames=64, log_interval=2, save_interval=100)
    trainer = T.RestorationTrainer(cfg, checkpoint_dir=tmp_path / "r")
    batch = _inpaint_batch(rng)
    losses = trainer.train([batch] * 3, n_steps=6, val_loader=[batch],
                           log=lambda *a: None)
    assert len(losses) == 6
    assert losses[-1] < losses[0] * 1.5  # moving; UNet smoke not strict
    # val-minimum checkpoint: best/ saved with the recorded minimum, and a
    # restart seeds best_val from it so a worse resume can't overwrite it
    assert (tmp_path / "r" / "best").exists()
    assert trainer.best_val == min(v for _, v in trainer.val_loss_history)
    assert trainer.ckpt.best_score() == pytest.approx(trainer.best_val)
    # checkpoint roundtrip
    best_before = trainer.best_val
    assert trainer.restore_latest()
    assert int(trainer.state.step) == 6
    assert trainer.best_val == pytest.approx(best_before)


def test_restoration_trainer_ema_weight_decay(tmp_path, rng):
    """EMA + AdamW weight decay (reference NetWrapper, nppc/auxil.py:
    316-322, 370-378): the EMA shadow is a distinct buffer (donation-safe),
    validation/selection run on it, best/ stores it, and resume restores
    it alongside params."""
    cfg = T.RestorationTrainConfig(
        model=UNetModelConfig(in_channels=1, out_channels=1, dropout=0.2),
        num_freqs=32, num_frames=64, log_interval=2, save_interval=4,
        ema_decay=0.9, optimizer="adamw", weight_decay=1e-4)
    trainer = T.RestorationTrainer(cfg, checkpoint_dir=tmp_path / "r")
    batch = _inpaint_batch(rng)
    trainer.train([batch] * 3, n_steps=6, val_loader=[batch],
                  log=lambda *a: None)
    p = jax.tree_util.tree_leaves(trainer.state.params)[0]
    e = jax.tree_util.tree_leaves(trainer.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    meta = trainer.ckpt.best_meta()
    assert meta["ema_decay"] == pytest.approx(0.9)
    # best/ holds the EMA params at the val-minimum step
    restored = trainer.ckpt.restore(
        "best", {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}, partial=True)
    assert restored is not None
    # resume restores the EMA shadow
    trainer2 = T.RestorationTrainer(cfg, checkpoint_dir=tmp_path / "r")
    assert trainer2.restore_latest()
    assert trainer2.state.ema_params is not None
    e2 = jax.tree_util.tree_leaves(trainer2.state.ema_params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    assert not np.allclose(np.asarray(p2), np.asarray(e2))


def test_nppc_inpainting_trainer_freezes_restoration(rng):
    cfg = T.NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UNetModelConfig(1, 1, 0.0),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=3, n_dirs=3)),
        num_freqs=32, num_frames=64, second_moment_loss_grace=4)
    trainer = T.NPPCInpaintingTrainer(cfg)
    frozen_before = jax.tree.map(
        np.asarray, trainer.state.params["pretrained_restoration_model"])
    pc_before = jax.tree.map(np.asarray, trainer.state.params["pc_wrapper"])

    batch = _inpaint_batch(rng)
    losses = trainer.train([batch] * 2, n_steps=4, log=lambda *a: None)
    assert len(losses) == 4 and np.isfinite(losses).all()

    frozen_after = trainer.state.params["pretrained_restoration_model"]
    for a, b in zip(jax.tree.leaves(frozen_before),
                    jax.tree.leaves(frozen_after)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the PC wrapper DID move
    moved = any(not np.allclose(a, np.asarray(b))
                for a, b in zip(jax.tree.leaves(pc_before),
                                jax.tree.leaves(trainer.state.params["pc_wrapper"])))
    assert moved


def test_nppc_denoising_trainer(rng):
    from generative_audio_tpu.models.nppc_model import (
        DenoisingNPPCConfig, StftConfig)
    from generative_audio_tpu.models import MultiDirectionConfig
    tiny_md = MultiDirectionConfig(
        num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
        sb_model_hidden_size=8, num_groups_in_drop_band=2, n_directions=2)
    # the frozen pretrained enhancer runs with num_groups=1 (its inference
    # config), like the reference denoising line
    tiny_restoration = FullSubNetPlusConfig(
        num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
        sb_model_hidden_size=8, num_groups_in_drop_band=1)
    cfg = T.NPPCDenoisingTrainConfig(
        model=DenoisingNPPCConfig(
            restoration=tiny_restoration, pc_wrapper=tiny_md,
            stft=StftConfig(nfft=62, hop_length=32, win_length=62)),
        second_moment_loss_grace=4)
    trainer = T.NPPCDenoisingTrainer(cfg, example_length=2048)
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    losses = trainer.train([(noisy, clean)] * 2, n_steps=3,
                           log=lambda *a: None)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_nppc_denoising_trainer_on_the_fly_loader(tmp_path):
    """`denoising_nppc_e2e.py --pool 0` path: training straight from the
    stochastic AudioDataset through BatchLoader, so every step sees a
    fresh (subsample, noise, SNR) mixture — the round-5 pool-memorization
    fix (artifacts/denoising_nppc/REPORT.md split controls)."""
    from generative_audio_tpu import data as D
    from generative_audio_tpu.models.nppc_model import (
        DenoisingNPPCConfig, StftConfig)
    from generative_audio_tpu.models import MultiDirectionConfig
    clean_dir, noise_dir = D.write_synthetic_corpus(
        tmp_path, n_clean=6, n_noise=2, seconds=0.5)
    ds = D.AudioDataset(D.AudioDataSetConfig(
        clean_path=str(clean_dir), noisy_path=str(noise_dir),
        sub_sample_length_seconds=2048 / 16000), seed=0)
    loader = D.BatchLoader(ds, 4, shuffle=True, seed=1, num_workers=2)
    # the property --pool 0 relies on: re-iterating the SAME loader draws
    # new mixtures (stochastic __getitem__), so no batch is ever reused
    a = next(iter(loader))
    b = next(iter(loader))
    assert a[0].shape == (4, 2048) and not np.allclose(a[0], b[0])
    tiny_md = MultiDirectionConfig(
        num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
        sb_model_hidden_size=8, num_groups_in_drop_band=2, n_directions=2)
    tiny_restoration = FullSubNetPlusConfig(
        num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
        sb_model_hidden_size=8, num_groups_in_drop_band=1)
    cfg = T.NPPCDenoisingTrainConfig(
        model=DenoisingNPPCConfig(
            restoration=tiny_restoration, pc_wrapper=tiny_md,
            stft=StftConfig(nfft=62, hop_length=32, win_length=62)),
        second_moment_loss_grace=4)
    trainer = T.NPPCDenoisingTrainer(cfg, example_length=2048)
    losses = trainer.train(loader, n_steps=3, log=lambda *a: None)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_enhance_trainer_fullsubnet_v1(rng):
    """v1 (mag-only) training line (fullsubnet/trainer/trainer.py:14-146)."""
    from generative_audio_tpu.models.fullsubnet import FullSubNetConfig
    cfg = T.EnhanceTrainConfig(
        model_type="fullsubnet",
        model_v1=FullSubNetConfig(
            num_freqs=16, sb_num_neighbors=2, fb_model_hidden_size=16,
            sb_model_hidden_size=8, num_groups_in_drop_band=1),
        n_fft=30, hop_length=16, win_length=30, compute_dtype="float32")
    trainer = T.EnhanceTrainer(cfg)
    clean = rng.standard_normal((2, 1024)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((2, 1024)).astype(np.float32)
    avg = trainer.train_epoch([(noisy, clean)] * 2, log=lambda *a: None)
    assert np.isfinite(avg)


def test_enhance_residual_loss_alpha(rng):
    """Residual_Trainer combined objective (trainer.py:162-228)."""
    cfg0 = _enhance_cfg()
    import dataclasses
    cfg = dataclasses.replace(cfg0, loss_alpha=0.5)
    state = T.init_enhance_state(cfg, jax.random.PRNGKey(0))
    step = T.make_enhance_train_step(cfg, donate=False)
    clean = rng.standard_normal((4, 1024)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 1024)).astype(np.float32)
    state, loss = step(state, noisy, clean)
    assert np.isfinite(float(loss))
    # differs from the pure-cIRM loss
    step0 = T.make_enhance_train_step(cfg0, donate=False)
    state0 = T.init_enhance_state(cfg0, jax.random.PRNGKey(0))
    _, loss0 = step0(state0, noisy, clean)
    assert abs(float(loss) - float(loss0)) > 1e-7


def test_enhance_residual_loss_alpha_full_band_alignment(rng):
    """The loss_alpha>0 (Residual_Trainer) objective must compute BOTH terms
    at full band with no drop_band (the reference comments its drop_band
    calls out, trainer.py:190-199) — drop_band would decimate frequencies
    AND permute batch rows, silently misaligning the spectral MSE."""
    import dataclasses
    from generative_audio_tpu.ops.stft import stft_ri
    from generative_audio_tpu.ops.mask import (
        build_complex_ideal_ratio_mask_ri, decompress_cIRM, apply_crm)
    from generative_audio_tpu.losses import cirm_mse_loss
    from generative_audio_tpu.train.enhance import enhance_loss_fn, _model

    cfg = dataclasses.replace(_enhance_cfg(), loss_alpha=0.3)
    assert cfg.model.num_groups_in_drop_band == 2  # the risky default
    state = T.init_enhance_state(cfg, jax.random.PRNGKey(0))
    clean = rng.standard_normal((4, 1024)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 1024)).astype(np.float32)

    loss = float(enhance_loss_fn(state.params, noisy, clean, cfg))

    # by-hand full-band construction
    nr, ni = stft_ri(noisy, cfg.n_fft, cfg.hop_length, cfg.win_length)
    cr, ci = stft_ri(clean, cfg.n_fft, cfg.hop_length, cfg.win_length)
    mag = jnp.sqrt(nr ** 2 + ni ** 2)
    gt = build_complex_ideal_ratio_mask_ri(nr, ni, cr, ci)
    model_full = _model(cfg, num_groups=1)
    crm = model_full.apply({"params": state.params}, mag[:, None],
                           nr[:, None], ni[:, None])
    assert crm.shape[2] == nr.shape[1]  # full band, no decimation
    l_cirm = cirm_mse_loss(crm, jnp.transpose(gt, (0, 3, 1, 2)))
    dec = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
    er, ei = apply_crm(dec, nr, ni)
    l_spec = (jnp.mean((er - cr) ** 2) + jnp.mean((ei - ci) ** 2)) / 2
    expected = float(0.3 * l_spec + 0.7 * l_cirm)
    assert np.isclose(loss, expected, rtol=1e-6)


def test_enhance_residual_loss_alpha_fullsubnet_v1(rng):
    """model_type='fullsubnet' + loss_alpha>0 must run (previously crashed
    calling the mag-only model with 3 args)."""
    import dataclasses
    from generative_audio_tpu.models.fullsubnet import FullSubNetConfig
    cfg = T.EnhanceTrainConfig(
        model_type="fullsubnet",
        model_v1=FullSubNetConfig(
            num_freqs=32, sb_num_neighbors=2, fb_model_hidden_size=16,
            sb_model_hidden_size=8, num_groups_in_drop_band=2),
        n_fft=62, hop_length=32, win_length=62, compute_dtype="float32",
        loss_alpha=0.5)
    state = T.init_enhance_state(cfg, jax.random.PRNGKey(0))
    step = T.make_enhance_train_step(cfg, donate=False)
    clean = rng.standard_normal((4, 1024)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 1024)).astype(np.float32)
    state, loss = step(state, noisy, clean)
    assert np.isfinite(float(loss))


def test_checkpoint_partial_restore_missing_key(tmp_path):
    """partial=True keeps target values (torch strict=False semantics,
    base_trainer.py:112-127) for keys absent from the checkpoint, with a
    warning — not a bare KeyError."""
    import warnings
    mgr = T.CheckpointManager(tmp_path)
    mgr.save_latest({"params": {"a": np.ones(3)}}, step=1)
    target = {"params": {"a": np.zeros(3), "new_head": np.full(2, 7.0)}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        restored = mgr.restore("latest", target, partial=True)
    assert np.allclose(restored["params"]["a"], 1.0)          # from ckpt
    assert np.allclose(restored["params"]["new_head"], 7.0)   # kept
    assert any("new_head" in str(x.message) for x in w)


def test_nppc_inpainting_mc_pca_aligned_variant(rng):
    """base_step2 (nppc_trainer.py:244-336): training with the MC-PCA-aligned
    objective moves the PC directions TOWARD the MC-dropout-PCA basis.
    Validation uses a fixed rng, so its MC basis is a deterministic target."""
    cfg = T.NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UNetModelConfig(1, 1, 0.2),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=3, n_dirs=3)),
        num_freqs=32, num_frames=64, second_moment_loss_grace=10000,
        objective_variant="mc_pca_aligned", n_mc_samples=6,
        learning_rate=3e-4)
    trainer = T.NPPCInpaintingTrainer(cfg)
    batch = _inpaint_batch(rng)
    frozen_before = jax.tree.map(
        np.asarray, trainer.state.params["pretrained_restoration_model"])

    _, rec_before = trainer._eval_fn(trainer.state, batch)
    losses = trainer.train([batch] * 2, n_steps=12, log=lambda *a: None)
    _, rec_after = trainer._eval_fn(trainer.state, batch)

    assert np.isfinite(losses).all()
    # alignment improved: mean_i (1 - <w_hat_i, w_mc_hat_i>^2) dropped
    assert float(rec_after) < float(rec_before)
    # the restoration branch stayed frozen
    for a, b in zip(jax.tree.leaves(frozen_before),
                    jax.tree.leaves(
                        trainer.state.params["pretrained_restoration_model"])):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_enhance_trainer_resume(tmp_path, rng):
    """restore_latest round-trips step, optimizer state and best_score —
    the reference's -R resume (base_trainer.py:129-158)."""
    cfg = _enhance_cfg()
    trainer = T.EnhanceTrainer(cfg, checkpoint_dir=tmp_path / "ckpt")
    clean = rng.standard_normal((4, 2048)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((4, 2048)).astype(np.float32)
    trainer.best_score = 0.5
    trainer.train([(noisy, clean)] * 3, epochs=1, log=lambda *a: None)

    fresh = T.EnhanceTrainer(cfg, checkpoint_dir=tmp_path / "ckpt")
    assert int(fresh.state.step) == 0
    assert fresh.restore_latest()
    assert int(fresh.state.step) == 3
    assert fresh.best_score == 0.5
    # restored params match the trained ones
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(fresh.state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # resumed training must actually step (structure-preserving restore)
    fresh.train([(noisy, clean)], epochs=1, log=lambda *a: None)
    assert int(fresh.state.step) == 4


def test_nppc_inpainting_trainer_resume(tmp_path, rng):
    from generative_audio_tpu.models.nppc_model import (
        UNetModelConfig as UC, InpaintingNPPCConfig)
    from generative_audio_tpu.models.pc_wrapper import (
        AudioInpaintingPCWrapperConfig)
    cfg = T.NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UC(1, 1, 0.2),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=3, n_dirs=3)),
        num_freqs=32, num_frames=64, second_moment_loss_grace=10,
        log_interval=100, save_interval=100)
    trainer = T.NPPCInpaintingTrainer(cfg, checkpoint_dir=tmp_path / "n")
    batch = _inpaint_batch(rng)
    trainer.train([batch] * 2, n_steps=4, log=lambda *a: None)

    fresh = T.NPPCInpaintingTrainer(cfg, checkpoint_dir=tmp_path / "n")
    assert fresh.restore_latest()
    assert int(fresh.state.step) == 4
    a = jax.tree_util.tree_leaves(trainer.state.opt_state)
    b = jax.tree_util.tree_leaves(fresh.state.opt_state)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # the restored opt_state must keep optax's NamedTuple structure —
    # a raw-dict restore only fails once you actually step
    fresh.train([batch], n_steps=1, log=lambda *a: None)
    assert int(fresh.state.step) == 5


def test_checkpoint_sidecars_gated_to_coordinator(tmp_path, monkeypatch):
    """Multi-process semantics: orbax saves are COLLECTIVE, so every rank
    must enter them (a rank-0-only call deadlocks rank 0 in orbax's
    internal barrier); only the plain-JSON sidecars are rank-0-gated (the
    reference's rank==0 gating, base_trainer.py:160). Here we fake a
    non-coordinator rank and assert the split: the orbax save still runs,
    the sidecars don't appear."""
    import generative_audio_tpu.train.checkpoint as C

    monkeypatch.setattr(C, "_is_coordinator", lambda: False)
    rank1 = C.CheckpointManager(tmp_path / "ck", config={"lr": 1.0})
    rank1.save_latest({"a": np.arange(2.0)}, 5)
    rank1.save_best({"a": np.arange(2.0)}, 1.0, 5)
    assert (tmp_path / "ck" / "latest").exists()     # collective save ran
    assert (tmp_path / "ck" / "best").exists()
    assert not (tmp_path / "ck" / "latest_step.json").exists()
    assert not (tmp_path / "ck" / "best_score.json").exists()
    assert not (tmp_path / "ck" / "config.json").exists()
    assert rank1.latest_step() is None

    monkeypatch.setattr(C, "_is_coordinator", lambda: True)
    rank0 = C.CheckpointManager(tmp_path / "ck", config={"lr": 1.0})
    rank0.save_latest({"a": np.arange(2.0)}, 7)
    restored = rank1.restore("latest", {"a": np.zeros(2)})
    np.testing.assert_array_equal(restored["a"], np.arange(2.0))
    assert rank1.latest_step() == 7                  # every rank restores
    assert rank0.load_config() == {"lr": 1.0}
