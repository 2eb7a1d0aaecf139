"""Image NPPC line: nets parity vs the torch reference, distortions,
PC wrapper orthogonality, restoration + NPPC training smoke.

Reference: nppc/networks.py, nppc/restoration.py, nppc/nppc.py.
"""
import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_audio_tpu.nn.image_nets import (
    ImageUNet, ResUNet, ResCNN, pixel_shuffle)
from generative_audio_tpu.models.image_restoration import (
    Denoising, Inpainting, Colorization, SuperResolution, gen_mask,
    ImageRestorationConfig, ImageRestorationModel, pad_to_multiple,
    unpad_from_multiple)
from generative_audio_tpu.models.image_nppc import (
    ImageNPPCConfig, ImageNPPCModel)
from generative_audio_tpu.data.image_data import (
    MNISTDataModule, synthetic_digits, split_batch, split_dataset,
    crop_scaled_pair)
from generative_audio_tpu.utils.torch_convert import (
    convert_image_unet, convert_res_unet, convert_res_cnn)


def _load_ref_networks():
    """Import nppc/networks.py directly (its package __init__ pulls plotly)."""
    path = Path("/root/reference/nppc/networks.py")
    if not path.exists():
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_nppc_networks", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_nppc_networks"] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_state_dict(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


# ---------------------------------------------------------------------------
# Net parity vs torch reference
# ---------------------------------------------------------------------------
class TestImageNetParity:
    def test_image_unet_parity(self):
        import torch
        ref = _load_ref_networks()
        kw = dict(in_channels=2, out_channels=3, channels_list=(8, 16),
                  bottleneck_channels=16, downsample_list=(False, True),
                  n_blocks=1, n_blocks_bottleneck=2, min_channels_decoder=8,
                  n_groups=4)
        tnet = ref.UNet(**kw).eval()
        jnet = ImageUNet(**kw)
        x = np.random.default_rng(0).standard_normal((2, 2, 12, 12)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        variables = convert_image_unet(_torch_state_dict(tnet), jnet)
        got = np.asarray(jnet.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)

    def test_image_unet_upscale_parity(self):
        import torch
        ref = _load_ref_networks()
        kw = dict(in_channels=1, out_channels=1, channels_list=(8, 16),
                  bottleneck_channels=16, downsample_list=(False, True),
                  n_blocks=1, n_blocks_bottleneck=1, min_channels_decoder=8,
                  upscale_factor=2, n_groups=4)
        tnet = ref.UNet(**kw).eval()
        jnet = ImageUNet(**kw)
        x = np.random.default_rng(1).standard_normal((1, 1, 8, 8)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        variables = convert_image_unet(_torch_state_dict(tnet), jnet)
        got = np.asarray(jnet.apply(variables, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 1, 16, 16)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)

    def test_res_unet_parity(self):
        import torch
        ref = _load_ref_networks()
        kw = dict(in_channels=2, out_channels=4, channels_list=(8, 8, 16),
                  bottleneck_channels=16,
                  downsample_list=(False, True, True),
                  attn_list=(False, False, True), n_blocks=1,
                  min_channels_decoder=1, n_groups=4, attn_heads=2)
        tnet = ref.ResUNet(**kw).eval()
        jnet = ResUNet(**kw)
        x = np.random.default_rng(2).standard_normal((2, 2, 8, 8)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        variables = convert_res_unet(_torch_state_dict(tnet), jnet)
        got = np.asarray(jnet.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)

    def test_res_cnn_parity(self):
        import torch
        ref = _load_ref_networks()
        kw = dict(in_channels=3, out_channels=3, hidden_channels=8,
                  n_blocks=2, upscale_factor=2)
        tnet = ref.ResCNN(**kw).eval()
        jnet = ResCNN(**kw)
        x = np.random.default_rng(3).standard_normal((1, 3, 6, 6)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        variables = convert_res_cnn(_torch_state_dict(tnet), jnet)
        got = np.asarray(jnet.apply(variables, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 3, 12, 12)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)

    def test_pixel_shuffle_matches_torch(self):
        import torch
        x = np.random.default_rng(4).standard_normal((2, 8, 3, 5)) \
            .astype(np.float32)
        want = torch.nn.functional.pixel_shuffle(
            torch.from_numpy(x), 2).numpy()
        got = np.asarray(pixel_shuffle(
            jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-7)


# ---------------------------------------------------------------------------
# Distortions
# ---------------------------------------------------------------------------
class TestDistortions:
    def test_denoising_clips(self):
        d = Denoising(noise_std=1.0, clip_noise=True)
        x = jnp.full((2, 1, 8, 8), 0.5)
        out = d.distort(x, jax.random.PRNGKey(0))
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        assert not np.allclose(np.asarray(out), 0.5)

    def test_inpainting_mask_and_project(self):
        mask = gen_mask((1, 8, 8), 0, 3, 0, 7)
        d = Inpainting(mask=mask, fill=0.25)
        x = jnp.ones((2, 1, 8, 8))
        out = np.asarray(d.distort(x))
        assert np.allclose(out[:, :, :4], 0.25)      # masked rows filled
        assert np.allclose(out[:, :, 4:], 1.0)       # known rows kept
        proj = np.asarray(d.project(x))
        assert np.allclose(proj[:, :, 4:], 0.0)

    def test_colorization_roundtrip_shapes(self):
        d = Colorization()
        x = jnp.asarray(np.random.default_rng(0)
                        .uniform(size=(2, 3, 8, 8)).astype(np.float32))
        gray = d.distort(x)
        assert gray.shape == (2, 8, 8)
        restored = d.naive_restore(gray[:, None])
        assert restored.shape == (2, 3, 8, 8)
        proj = np.asarray(d.project(x))
        np.testing.assert_allclose(proj.mean(axis=1), 0.0, atol=1e-6)

    def test_super_resolution(self):
        d = SuperResolution(factor=2)
        x = jnp.asarray(np.arange(2 * 1 * 8 * 8, dtype=np.float32)
                        .reshape(2, 1, 8, 8))
        lr = d.distort(x)
        assert lr.shape == (2, 1, 4, 4)
        up = d.naive_restore(lr)
        assert up.shape == (2, 1, 8, 8)
        # project removes the low-frequency part: avg-pool of proj is ~0
        proj = d.project(x)
        np.testing.assert_allclose(np.asarray(d._avg_pool(proj)), 0.0,
                                   atol=1e-4)

    def test_pad_to_multiple_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 1, 28, 28)).astype(np.float32))
        padded, pads = pad_to_multiple(x, 8)
        assert padded.shape == (1, 1, 32, 32)
        back = unpad_from_multiple(padded, pads)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


# ---------------------------------------------------------------------------
# Data module
# ---------------------------------------------------------------------------
class TestImageData:
    def test_synthetic_digits_deterministic(self):
        a = synthetic_digits(4, seed=7)
        b = synthetic_digits(4, seed=7)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (4, 1, 28, 28)
        assert a.max() <= 1.0 and a.min() >= 0.0
        assert a.max() > 0.5  # strokes actually drawn

    def test_mnist_module_split(self):
        dm = MNISTDataModule(n_valid=16, n_synthetic=64)
        assert len(dm.train_set) == 48
        assert len(dm.valid_set) == 16
        assert dm.train_set[0].shape == (1, 28, 28)

    def test_split_batch_recursive(self):
        batch = (np.arange(8).reshape(8, 1), np.arange(16).reshape(8, 2))
        chunks = split_batch(batch, 2)
        assert len(chunks) == 2
        assert chunks[0][0].shape == (4, 1) and chunks[0][1].shape == (4, 2)

    def test_crop_scaled_pair_center(self):
        hr = np.arange(3 * 16 * 16, dtype=np.float32).reshape(3, 16, 16)
        lr = hr[:, ::2, ::2]
        hr_p, lr_p = crop_scaled_pair(hr, lr, patch_size=8, method="center")
        assert hr_p.shape == (3, 8, 8) and lr_p.shape == (3, 4, 4)
        np.testing.assert_allclose(hr_p[:, ::2, ::2], lr_p)


# ---------------------------------------------------------------------------
# Restoration model + NPPC model end-to-end
# ---------------------------------------------------------------------------
def _small_restoration(distortion="denoising_1"):
    cfg = ImageRestorationConfig(dataset="mnist", distortion_type=distortion,
                                 net_type="unet")
    dm = MNISTDataModule(n_valid=8, n_synthetic=32)
    return ImageRestorationModel(cfg, data_module=dm), cfg


class TestImageRestorationModel:
    def test_restore_shapes(self):
        model, _ = _small_restoration()
        variables = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(synthetic_digits(2, seed=0))
        x_d = model.distort(x, jax.random.PRNGKey(1))
        out = model.restore(variables, x_d)
        assert out.shape == (2, 1, 28, 28)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_inpainting_known_region_preserved(self):
        model, _ = _small_restoration("inpainting_1")
        variables = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(synthetic_digits(2, seed=0))
        x_d = model.distort(x, None)
        out = np.asarray(model.restore(variables, x_d))
        mask = np.asarray(model.distortion.mask)
        # outside the mask the wrapper must reproduce x_distorted exactly
        np.testing.assert_allclose(out * (1 - mask),
                                   np.asarray(x_d) * (1 - mask), atol=1e-5)

    def test_nppc_dirs_orthogonal(self):
        model, cfg = _small_restoration()
        rvars = model.init(jax.random.PRNGKey(0))
        nppc = ImageNPPCModel(ImageNPPCConfig(n_dirs=3), model)
        pvars = nppc.init(jax.random.PRNGKey(1))
        x = jnp.asarray(synthetic_digits(2, seed=0))
        x_d = model.distort(x, jax.random.PRNGKey(2))
        x_r = model.restore(rvars, x_d)
        w = np.asarray(nppc.get_dirs(pvars, x_d, x_r))
        assert w.shape == (2, 3, 1, 28, 28)
        flat = w.reshape(2, 3, -1)
        gram = np.einsum("bki,bli->bkl", flat, flat)
        off = gram - np.eye(3) * np.einsum("bkk->bk", gram)[:, :, None] \
            * np.eye(3)
        for b in range(2):
            for i in range(3):
                for j in range(i):
                    denom = (np.linalg.norm(flat[b, i])
                             * np.linalg.norm(flat[b, j]) + 1e-9)
                    assert abs(gram[b, i, j]) / denom < 1e-4
        del off


class TestImageTraining:
    def test_restoration_training_reduces_loss(self):
        from generative_audio_tpu.train.image import ImageRestorationTrainer
        model, cfg = _small_restoration()
        trainer = ImageRestorationTrainer(cfg, model=model, seed=0)
        losses = trainer.train(n_steps=8, batch_size=8)
        assert len(losses) == 8
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_nppc_training_runs(self):
        from generative_audio_tpu.train.image import (
            ImageRestorationTrainer, ImageNPPCTrainer)
        model, cfg = _small_restoration()
        rtrainer = ImageRestorationTrainer(cfg, model=model, seed=0)
        rtrainer.train(n_steps=2, batch_size=4)
        variables = dict(rtrainer._variables_extra,
                         params=rtrainer.state.params)
        ntrainer = ImageNPPCTrainer(
            ImageNPPCConfig(n_dirs=2, second_moment_loss_grace=4),
            model, variables, seed=0)
        x = synthetic_digits(4, seed=3)
        l0 = ntrainer.step(x)
        l1 = ntrainer.step(x)
        assert np.isfinite(l0) and np.isfinite(l1)
        score = ntrainer.benchmark(batch_size=4, max_samples=8)
        assert np.isfinite(score)
        assert ntrainer._maybe_update_best(score)


class TestCelebAModules:
    def _make_image_tree(self, root, splits=("train", "valid", "test"), n=3):
        from PIL import Image
        rng = np.random.default_rng(0)
        for split in splits:
            d = root / "CelebAMask-HQ-256" / split
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.uniform(size=(16, 16, 3)) * 255).astype("uint8")
                Image.fromarray(arr).save(d / f"{i}.png")

    def test_celeba_hq_module(self, tmp_path):
        from generative_audio_tpu.data.image_data import CelebAHQ256DataModule
        self._make_image_tree(tmp_path)
        dm = CelebAHQ256DataModule(img_size=8, data_folder=tmp_path)
        assert len(dm.train_set) == 3
        img = dm.train_set[0]
        assert img.shape == (3, 8, 8)
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_celeba_srflow_module(self, tmp_path):
        from PIL import Image
        from generative_audio_tpu.data.image_data import (
            CelebASRFlowDataModule)
        rng = np.random.default_rng(1)
        for sub, size in (("GT", 16), ("x8", 2)):
            d = tmp_path / "CelebA_SRFlow" / sub
            d.mkdir(parents=True)
            for i in range(4):
                arr = (rng.uniform(size=(size, size, 3)) * 255).astype("uint8")
                Image.fromarray(arr).save(d / f"{i}.png")
        dm = CelebASRFlowDataModule(data_folder=tmp_path, scale=8, n_valid=1)
        hr, lr = dm.train_set[0]
        assert hr.shape == (3, 16, 16) and lr.shape == (3, 2, 2)
        assert len(dm.valid_set) == 1


def test_image_trainer_report(tmp_path):
    from generative_audio_tpu.train.image import ImageRestorationTrainer
    model, cfg = _small_restoration()
    trainer = ImageRestorationTrainer(cfg, model=model,
                                      checkpoint_dir=tmp_path / "ck", seed=0)
    trainer.train(n_steps=2, batch_size=4, benchmark_every=2,
                  log=lambda *a: None)
    report = (tmp_path / "ck" / "report.html").read_text()
    assert report.count("data:image/png;base64,") >= 4  # curve + 3 grids


class _Array3ChModule:
    """Minimal 3-channel data module for distortion-combination tests."""
    shape = (3, 16, 16)
    mean = 0.5
    std = 0.5

    def __init__(self, n=8):
        rng = np.random.default_rng(0)
        arr = rng.uniform(size=(n, 3, 16, 16)).astype(np.float32)
        self.train_set = self.valid_set = self.test_set = list(arr)


@pytest.mark.parametrize("distortion,pre_net", [
    ("colorization_1", "none"),
    ("super_resolution_1", "none"),
    ("super_resolution_1", "res_cnn"),
])
def test_nppc_distortion_combinations(distortion, pre_net):
    """Channel/upscale plumbing through restoration + PC wrapper for the
    non-trivial distortions (ref nppc.py:70-129 pre-net dispatch)."""
    cfg = ImageRestorationConfig(dataset="mnist", distortion_type=distortion,
                                 net_type="unet")
    model = ImageRestorationModel(cfg, data_module=_Array3ChModule())
    rvars = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.stack([model.data_module.valid_set[i]
                              for i in range(2)]))
    x_d = model.distort(x, jax.random.PRNGKey(1))
    x_r = model.restore(rvars, x_d)
    assert x_r.shape == (2, 3, 16, 16)

    nppc = ImageNPPCModel(ImageNPPCConfig(n_dirs=2, pre_net_type=pre_net),
                          model)
    pvars = nppc.init(jax.random.PRNGKey(2))
    w = np.asarray(nppc.get_dirs(pvars, x_d, x_r))
    assert w.shape == (2, 2, 3, 16, 16)
    assert np.all(np.isfinite(w))
    # orthogonality survives the per-dir project_func
    flat = w.reshape(2, 2, -1)
    dots = np.abs(np.einsum("bi,bi->b", flat[:, 0], flat[:, 1]))
    norms = (np.linalg.norm(flat[:, 0], axis=1)
             * np.linalg.norm(flat[:, 1], axis=1) + 1e-9)
    assert np.all(dots / norms < 1e-4)


def test_image_trainer_checkpoint_roundtrip(tmp_path):
    """Constructor round-trip load (reference RestorationModel.load)."""
    from generative_audio_tpu.train.image import ImageRestorationTrainer
    cfg = ImageRestorationConfig(dataset="mnist",
                                 distortion_type="denoising_1",
                                 net_type="unet")
    dm = MNISTDataModule(n_valid=8, n_synthetic=32)
    model = ImageRestorationModel(cfg, data_module=dm)
    t1 = ImageRestorationTrainer(cfg, model=model,
                                 checkpoint_dir=tmp_path / "ck", seed=0)
    t1.train(n_steps=2, batch_size=4)
    t2 = ImageRestorationTrainer.from_checkpoint(tmp_path / "ck")
    assert t2.config.distortion_type == "denoising_1"
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        t1.state.params, t2.state.params)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0


def test_image_trainer_best_params_survive_donation(tmp_path):
    """best_params captured at a NON-final benchmark must survive later
    donated steps (the step jit donates the TrainState; an aliased
    best-params tree would be deleted by the next step)."""
    from generative_audio_tpu.train.image import ImageRestorationTrainer
    model, cfg = _small_restoration()
    trainer = ImageRestorationTrainer(cfg, model=model,
                                      checkpoint_dir=tmp_path / "ck", seed=0)
    x = np.stack([np.asarray(model.data_module.train_set[i])
                  for i in range(4)])
    trainer.step(x)
    # capture best NOW, then run more donated steps: an aliased (uncopied)
    # best tree would be deleted by the donation below.
    assert trainer._maybe_update_best(0.0)     # 0.0 stays best forever
    trainer.step(x)
    trainer.step(x)
    # reading the tree must not raise "Array has been deleted"
    leaf_max = max(float(np.abs(np.asarray(x)).max())
                   for x in jax.tree_util.tree_leaves(trainer.best_params))
    assert np.isfinite(leaf_max)
    # restore(use_best=True) exercises the saved-best path end to end
    x = jnp.asarray(synthetic_digits(2, seed=3))
    x_d = model.distort(x, jax.random.PRNGKey(4))
    out = trainer.restore(x_d, use_best=True)
    assert np.all(np.isfinite(np.asarray(out)))
