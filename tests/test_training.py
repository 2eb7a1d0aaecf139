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
    losses = trainer.train([batch] * 3, n_steps=6, log=lambda *a: None)
    assert len(losses) == 6
    assert losses[-1] < losses[0] * 1.5  # moving; UNet smoke not strict
    # checkpoint roundtrip
    assert trainer.restore_latest()
    assert int(trainer.state.step) == 6


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
