"""Grad accumulation, artifact-based restoration loading, plot utils,
TensorBoard tracker option, downloader gating.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import generative_audio_tpu.train as T
from generative_audio_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from generative_audio_tpu.models.nppc_model import (
    UNetModelConfig, InpaintingNPPCConfig)
from generative_audio_tpu.models.pc_wrapper import (
    AudioInpaintingPCWrapperConfig)
from generative_audio_tpu.train.enhance import (
    EnhanceTrainConfig, init_enhance_state, make_enhance_train_step)
from generative_audio_tpu.train.nppc import (
    NPPCInpaintingTrainConfig, NPPCInpaintingTrainer)
from generative_audio_tpu.utils.tracking import ExperimentTracker


def _small_enhance_cfg():
    return EnhanceTrainConfig(
        model=FullSubNetPlusConfig(
            num_freqs=16, sb_num_neighbors=2, fb_model_hidden_size=16,
            sb_model_hidden_size=8, num_groups_in_drop_band=1),
        n_fft=30, hop_length=16, win_length=30, compute_dtype="float32")


class TestGradAccumulation:
    def test_accumulated_matches_full_batch(self):
        cfg = _small_enhance_cfg()
        state = init_enhance_state(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        clean = rng.standard_normal((4, 512)).astype(np.float32)
        noisy = clean + 0.3 * rng.standard_normal((4, 512)).astype(np.float32)

        step1 = make_enhance_train_step(cfg, donate=False)
        step2 = make_enhance_train_step(cfg, donate=False, accum_steps=2)
        s_full, loss_full = step1(state, noisy, clean)
        s_acc, loss_acc = step2(state, noisy, clean)
        # mean loss equal; grads equal => identical params after one Adam step
        assert np.isclose(float(loss_full), float(loss_acc), atol=1e-5)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s_full.params, s_acc.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-5


class TestArtifactRoundTrip:
    def test_restoration_to_nppc_via_artifact(self, tmp_path):
        rng = np.random.default_rng(0)
        # 1) train the restoration model a couple of steps + checkpoint
        rcfg = T.RestorationTrainConfig(
            model=UNetModelConfig(in_channels=1, out_channels=1, dropout=0.0),
            num_freqs=32, num_frames=64, save_interval=1000)
        rtrainer = T.RestorationTrainer(rcfg, checkpoint_dir=tmp_path / "r")
        clean_spec = rng.standard_normal((2, 2, 32, 64)).astype(np.float32)
        mask = np.ones((2, 64), np.float32)
        mask[:, 20:30] = 0
        masked = clean_spec * mask[:, None, None, :]
        rtrainer.train([(masked, mask, clean_spec)], n_steps=2,
                       log=lambda *a: None)

        # 2) push the checkpoint dir as a named artifact
        tracker = ExperimentTracker(tmp_path / "exp", run_name="rest")
        ref = tracker.log_artifact("restoration-model", tmp_path / "r",
                                   {"steps": 2})
        assert ref == "restoration-model:v0"

        # 3) build the NPPC trainer from the artifact
        ncfg = NPPCInpaintingTrainConfig(
            model=InpaintingNPPCConfig(
                restoration=UNetModelConfig(1, 1, 0.0),
                pc_wrapper=AudioInpaintingPCWrapperConfig(
                    in_channels=2, out_channels=2, n_dirs=2)),
            num_freqs=32, num_frames=64, second_moment_loss_grace=4)
        ntrainer = NPPCInpaintingTrainer.from_artifact(
            ncfg, tmp_path / "exp",
            "restoration-model:latest")
        # frozen restoration params must equal the trained ones
        got = ntrainer.state.params["pretrained_restoration_model"]
        want = rtrainer.state.params
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), got, want)
        assert max(jax.tree_util.tree_leaves(diff)) == 0.0


class TestPlotUtils:
    def test_plots_write_pngs(self, tmp_path):
        from generative_audio_tpu.utils import plot
        rng = np.random.default_rng(0)
        p1 = plot.plot_alignment(rng.uniform(size=(20, 30)), tmp_path / "a.png")
        p2 = plot.plot_spectrogram(rng.uniform(size=(80, 100)),
                                   tmp_path / "s.png")
        p3 = plot.plot_waveform([rng.uniform(-1, 1, 1000)], tmp_path / "w.png",
                                labels=["noisy"])
        fig = plot.spectrogram_figure(
            [rng.uniform(0.01, 1, size=(40, 50))] * 2,
            titles=["noisy", "clean"])
        assert p1.exists() and p2.exists() and p3.exists()
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)


class TestTrackerTensorboard:
    def test_tb_event_files_written(self, tmp_path):
        tracker = ExperimentTracker(tmp_path, run_name="tb",
                                    tensorboard=True)
        tracker.log({"loss": 1.5}, step=1)
        tracker.finish()
        events = list((tracker.run_dir / "tb").glob("events.*"))
        assert events, "no tensorboard event files written"


class TestDownloader:
    def test_unknown_subset_rejected(self, tmp_path):
        from generative_audio_tpu.data.download import download_librispeech
        with pytest.raises(ValueError):
            download_librispeech(tmp_path, subsets=("nope",))

    def test_existing_subset_skipped(self, tmp_path):
        from generative_audio_tpu.data.download import download_librispeech
        (tmp_path / "LibriSpeech" / "test-clean").mkdir(parents=True)
        msgs = []
        root = download_librispeech(tmp_path, subsets=("test-clean",),
                                    log=msgs.append)
        assert root == tmp_path / "LibriSpeech"
        assert any("skipping" in m for m in msgs)
