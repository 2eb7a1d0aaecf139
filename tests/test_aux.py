"""Aux subsystems: RNG capsule, timers, loop loader, tracking/artifacts,
HTML report, EMA train state.

Reference: nppc/auxil.py (Timer, EncapsulatedRandomState, LoopLoader,
NetWrapper EMA), wandb usage in inpainting trainers.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from generative_audio_tpu.utils.auxil import (
    set_random_seed, EncapsulatedRandomState, Timer, LoopLoader,
    run_and_profile)
from generative_audio_tpu.utils.tracking import (
    ExperimentTracker, ArtifactRegistry)
from generative_audio_tpu.utils.report import (
    HTMLReport, imgs_to_grid, img_to_png_base64)
from generative_audio_tpu.train.state import create_train_state


class TestRandomState:
    def test_capsule_restores_state(self):
        set_random_seed(1)
        a = np.random.rand()
        set_random_seed(1)
        with EncapsulatedRandomState(99):
            inner1 = np.random.rand()
        b = np.random.rand()
        assert a == b  # outer stream unaffected by the capsule
        with EncapsulatedRandomState(99):
            inner2 = np.random.rand()
        assert inner1 == inner2  # capsule deterministic


class TestTimerLoop:
    def test_timer(self):
        t = Timer(interval=None)
        assert not t
        t = Timer(interval=0.0)
        assert t
        t = Timer(interval=100.0)
        assert not t
        assert t.elapsed() < 10

    def test_loop_loader_steps(self):
        loader = [1, 2, 3]
        out = list(LoopLoader(loader, n_steps=7))
        assert out == [1, 2, 3, 1, 2, 3, 1]
        assert len(LoopLoader(loader, n_steps=7)) == 7

    def test_loop_loader_epochs(self):
        loader = [1, 2]
        out = list(LoopLoader(loader, n_epochs=3))
        assert out == [1, 2, 1, 2, 1, 2]
        assert len(LoopLoader(loader, n_epochs=3)) == 6

    def test_run_and_profile(self, tmp_path):
        logs = []
        result = run_and_profile(jax.jit(lambda x: x * 2), jnp.ones(4),
                                 log=logs.append)
        np.testing.assert_allclose(np.asarray(result), 2.0)
        assert logs and "took" in logs[0]


class TestTracking:
    def test_scalars_and_summary(self, tmp_path):
        tr = ExperimentTracker(tmp_path, run_name="test_run",
                               config={"lr": 1e-4})
        tr.log({"loss": 1.0}, step=1)
        tr.log({"loss": 0.5, "pesq": 2.0}, step=2)
        tr.finish()
        rows = tr.read_scalars()
        assert len(rows) == 2 and rows[1]["loss"] == 0.5
        summary = json.loads((tr.run_dir / "summary.json").read_text())
        assert summary["loss"] == 0.5 and summary["pesq"] == 2.0
        config = json.loads((tr.run_dir / "config.json").read_text())
        assert config["lr"] == 1e-4

    def test_artifact_versioning(self, tmp_path):
        reg = ArtifactRegistry(tmp_path)
        f = tmp_path / "ckpt.bin"
        f.write_bytes(b"v0")
        ref0 = reg.log_artifact("restoration-model", f, {"step": 10})
        f.write_bytes(b"v1")
        ref1 = reg.log_artifact("restoration-model", f, {"step": 20})
        assert ref0 == "restoration-model:v0"
        assert ref1 == "restoration-model:v1"
        latest = reg.get_artifact("restoration-model:latest")
        assert (latest / "ckpt.bin").read_bytes() == b"v1"
        v0 = reg.get_artifact("restoration-model:v0")
        assert (v0 / "ckpt.bin").read_bytes() == b"v0"
        assert reg.metadata("restoration-model")["step"] == 20

    def test_run_dir_dedupe(self, tmp_path):
        t1 = ExperimentTracker(tmp_path, run_name="r")
        t2 = ExperimentTracker(tmp_path, run_name="r")
        assert t1.run_dir != t2.run_dir
        t1.finish(), t2.finish()


class TestReport:
    def test_grid_and_png(self):
        imgs = np.random.default_rng(0).uniform(size=(5, 1, 8, 8))
        grid = imgs_to_grid(imgs, nrow=3)
        assert grid.shape[0] == 1
        s = img_to_png_base64(grid)
        assert isinstance(s, str) and len(s) > 100

    def test_html_report(self, tmp_path):
        rep = HTMLReport("run 1")
        rep.add_scalars("final metrics", {"pesq": 2.88, "stoi": 0.95})
        rep.add_curve("loss", {"train": [3, 2, 1],
                               "val": np.array([[0, 3.0], [2, 1.5]])})
        rep.add_image_grid("samples",
                           np.random.default_rng(0).uniform(size=(4, 1, 8, 8)))
        path = rep.write(tmp_path / "report.html")
        text = path.read_text()
        assert "pesq" in text and "data:image/png;base64," in text
        assert text.count("<img") == 2


class TestEMA:
    def test_ema_tracks_params(self):
        params = {"w": jnp.ones(3)}
        state = create_train_state(params, optax.sgd(0.5), ema_decay=0.5)
        grads = {"w": jnp.ones(3)}
        state = state.apply_gradients(grads)
        # reference warmup (auxil.py:376): decay = min(decay0, 1 - 1/step);
        # step 1 => decay 0, the EMA is a copy of the params
        np.testing.assert_allclose(np.asarray(state.params["w"]), 0.5)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.5)
        state = state.apply_gradients(grads)
        # step 2: params 0.5 - 0.5 = 0; decay = min(0.5, 0.5) = 0.5 =>
        # ema = 0.5*0.5 + 0.5*0 = 0.25
        np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.25)

    def test_ema_disabled(self):
        state = create_train_state({"w": jnp.ones(3)}, optax.sgd(0.1))
        assert state.ema_params is None
        state = state.apply_gradients({"w": jnp.ones(3)})
        assert state.ema_params is None


class TestLogging:
    """utils/logging — the module the reference checkout is missing
    (11 reference files import the absent utils/logger.py)."""

    def test_check_nan(self):
        from generative_audio_tpu.utils.logging import check_nan
        import pytest
        clean = np.array([1.0, 2.0])
        assert check_nan(clean, "x") is clean
        with pytest.raises(ValueError, match="Found NaN in bad"):
            check_nan(np.array([1.0, np.nan]), "bad")

    def test_execution_time(self):
        from generative_audio_tpu.utils.logging import ExecutionTime
        import time
        t = ExecutionTime()
        time.sleep(0.01)
        assert 0.0 < t.duration() < 5.0

    def test_file_logger(self, tmp_path):
        from generative_audio_tpu.utils.logging import (
            init_logging_file, log, get_logger)
        logger = init_logging_file(tmp_path / "run" / "train.log")
        log("hello", 42)
        for h in list(logger.handlers):
            h.flush()
            if hasattr(h, "close") and getattr(h, "baseFilename", None):
                logger.removeHandler(h)
                h.close()
        text = (tmp_path / "run" / "train.log").read_text()
        assert "hello 42" in text
        assert get_logger() is logger
