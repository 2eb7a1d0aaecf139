"""Multi-process runtime tests: launcher + jax.distributed + per-process
data sharding (the reference's mp.spawn + gloo + DistributedSampler stack,
tools/train.py:22-120, rebuilt TPU-native — SURVEY.md §2.9)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _launch_cmd(nprocs, devices_per_proc, command, timeout=900):
    cmd = [sys.executable, "-m", "generative_audio_tpu.cli.launch",
           "--nprocs", str(nprocs),
           "--devices-per-process", str(devices_per_proc), "--"] + command
    env = dict(os.environ)
    # Children must see ONLY the CPU backend: drop any PJRT-plugin site dirs
    # (the axon TPU tunnel plugin force-registers itself and breaks the
    # 2-process CPU rendezvous) and let the launcher set JAX_PLATFORMS.
    extra = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + extra)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(cmd, cwd=str(REPO), env=env, capture_output=True,
                          text=True, timeout=timeout)


def _launch(nprocs, devices_per_proc, worker_args, timeout=900):
    return _launch_cmd(
        nprocs, devices_per_proc,
        [sys.executable, str(Path(__file__).parent / "distributed_worker.py")]
        + worker_args, timeout=timeout)


def test_local_slice_and_per_process_batch():
    """Single-process semantics of the DistributedSampler helpers."""
    from generative_audio_tpu.parallel import distributed as D
    assert D.per_process_batch_size(8) == 8
    assert D.local_slice(8) == (0, 8)
    assert not D.initialize()  # no env contract -> single-process no-op


def test_two_process_job_matches_single_process(tmp_path):
    """Launch 2 processes x 2 virtual CPU devices; the data-parallel loss/
    grad over the 4-device mesh must equal the plain single-process value,
    and the assembled global batch must preserve the loader's row order."""
    out = tmp_path / "result.json"
    proc = _launch(2, 2, [str(out)])
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    result = json.loads(out.read_text())
    assert result["n_devices"] == 4

    # single-process reference value (same seed/shapes as the worker)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    y = rng.standard_normal((8,)).astype(np.float32)
    w = np.zeros(16, np.float32)
    pred = x @ w
    loss = np.mean((pred - y) ** 2)
    grad = 2.0 * (x * (pred - y)[:, None]).mean(axis=0)
    np.testing.assert_allclose(result["loss"], loss, rtol=1e-5)
    np.testing.assert_allclose(result["grad_l2"],
                               np.sqrt(np.sum(grad ** 2)), rtol=1e-4)
    order = float(np.sum(y * np.arange(8, dtype=np.float32)))
    np.testing.assert_allclose(result["order_stat"], order, rtol=1e-5)


def test_launcher_fails_fast_on_rank_failure():
    """A crashed rank must terminate the remaining ranks promptly (not
    block on the dead coordinator) and propagate its exit code."""
    import time

    cmd = [sys.executable, "-m", "generative_audio_tpu.cli.launch",
           "--nprocs", "2", "--backend", "", "--",
           sys.executable, "-c",
           "import os, sys, time\n"
           "if os.environ['GAT_PROCESS_ID'] == '1':\n"
           "    sys.exit(3)\n"
           "time.sleep(120)\n"]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=str(REPO), env=env, capture_output=True,
                          text=True, timeout=60)
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-500:])
    assert time.time() - t0 < 30  # rank 0's sleep(120) was terminated


def test_two_process_training_matches_single_process(tmp_path):
    """Two enhancement train steps (tiny dryrun config, drop_band G=2)
    through BatchLoader host-sharding + DistributedBatches across 2
    processes must match the single-process run to float32 tolerance."""
    out = tmp_path / "result.json"
    proc = _launch(2, 2, [str(out), "train"])
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    result = json.loads(out.read_text())

    sys.path.insert(0, str(Path(__file__).parent))
    import distributed_worker as W
    from generative_audio_tpu.data import BatchLoader
    loader = BatchLoader(W.SyntheticPairs(8), global_batch_size=4,
                         shuffle=False, num_workers=1)
    losses, l2 = W.run_train_steps(loader, mesh=None)
    np.testing.assert_allclose(result["losses"], losses, rtol=1e-5)
    np.testing.assert_allclose(result["param_l2"], l2, rtol=1e-5)


def test_distributed_cli_train_and_resume(tmp_path):
    """The PRODUCT distributed path (cli.train under the launcher env
    contract): state replicated over the 2-process mesh, global batches
    consumed, rank-0-gated checkpoints — then a -R resume, which must
    restore on every rank (broadcast from the coordinator) rather than
    silently diverge."""
    import yaml
    from generative_audio_tpu.data import write_synthetic_corpus

    clean_dir, noise_dir = write_synthetic_corpus(
        tmp_path / "corpus", n_clean=8, n_noise=2, seconds=1.0)
    ckpt_dir = tmp_path / "ckpt"
    cfg = {
        "line": "enhance",
        "checkpoint_dir": str(ckpt_dir),
        "train": {
            "model": {"num_freqs": 32, "sb_num_neighbors": 3,
                      "fb_model_hidden_size": 32, "sb_model_hidden_size": 16,
                      "num_groups_in_drop_band": 2},
            "n_fft": 62, "hop_length": 32, "win_length": 62,
            "compute_dtype": "float32",
        },
        "data": {
            "clean_path": str(clean_dir), "noisy_path": str(noise_dir),
            "sub_sample_length_seconds": 0.256,
        },
        "dataloader": {"global_batch_size": 4, "num_workers": 1,
                       "shuffle": False},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_cmd = [sys.executable, "-m", "generative_audio_tpu.cli.train",
                 "-C", str(cfg_path), "--epochs", "1"]

    proc = _launch_cmd(2, 2, train_cmd)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert (ckpt_dir / "latest").exists()
    step1 = json.loads((ckpt_dir / "latest_step.json").read_text())["step"]
    assert step1 == 2  # 8 clips / global batch 4

    proc = _launch_cmd(2, 2, train_cmd + ["-R"])
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    step2 = json.loads((ckpt_dir / "latest_step.json").read_text())["step"]
    assert step2 == step1 + 2  # resumed from step1, not from scratch


def _inpainting_cfg(tmp_path, clean_dir, ckpt_dir):
    """Tiny inpainting-restoration config shared by the dp>1 CLI test:
    nfft 255 / hop 128 (the canonical regime) on 0.508 s crops ->
    [F=128, T=64] spectrograms, 8 clips / global batch 4 = 2 steps/epoch."""
    return {
        "line": "restoration",
        "checkpoint_dir": str(ckpt_dir),
        "train": {
            "model": {"in_channels": 1, "out_channels": 1, "dropout": 0.2},
            "num_freqs": 128, "num_frames": 64,
            "log_interval": 1, "save_interval": 1000,
        },
        "data": {
            "clean_path": str(clean_dir), "file_glob": "*.wav",
            "sub_sample_length_seconds": 0.508,
            "missing_length_seconds": 0.064,
            "seed": 11, "is_random_sub_sample": False,
            "stft_configuration": {"nfft": 255, "hop_length": 128,
                                   "win_length": 255},
        },
        "dataloader": {"global_batch_size": 4, "num_workers": 1,
                       "shuffle": False},
    }


def _run_single_process(command, timeout=900):
    """Run cli.train directly (no launcher) on the CPU backend with the
    same axon-free env the launcher children get."""
    env = dict(os.environ)
    extra = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + extra)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(command, cwd=str(REPO), env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_distributed_cli_inpainting_matches_single_and_resumes(tmp_path):
    """The inpainting line over dp=2 (VERDICT r2 missing #2 'Done'
    criterion): cli.train under the launcher env contract must (a) write
    collective checkpoints, (b) produce the same trained params as the
    single-process run (deterministic dataset seeding + shuffle=False +
    same trainer seed), and (c) resume across a second launch."""
    import yaml
    from generative_audio_tpu.data import write_synthetic_corpus

    clean_dir, _ = write_synthetic_corpus(
        tmp_path / "corpus", n_clean=8, n_noise=1, seconds=1.0)

    def run(tag, launch2):
        ckpt_dir = tmp_path / f"ckpt_{tag}"
        cfg_path = tmp_path / f"cfg_{tag}.yaml"
        cfg_path.write_text(yaml.safe_dump(
            _inpainting_cfg(tmp_path, clean_dir, ckpt_dir)))
        cmd = [sys.executable, "-m", "generative_audio_tpu.cli.train",
               "-C", str(cfg_path), "--epochs", "1"]
        proc = _launch_cmd(2, 2, cmd) if launch2 else _run_single_process(cmd)
        assert proc.returncode == 0, (proc.stdout[-2000:],
                                      proc.stderr[-2000:])
        return ckpt_dir, cmd

    ckpt2, cmd2 = run("dp2", launch2=True)
    ckpt1, _ = run("dp1", launch2=False)
    step2 = json.loads((ckpt2 / "latest_step.json").read_text())["step"]
    step1 = json.loads((ckpt1 / "latest_step.json").read_text())["step"]
    assert step1 == step2 == 2    # 8 clips / global batch 4

    # (b) dp=2 params == single-process params. Restore both checkpoints
    # with a probe trainer's tree (same config, fresh init).
    import jax
    jax.config.update("jax_platforms", "cpu")
    from generative_audio_tpu import train as T
    from generative_audio_tpu.models.nppc_model import UNetModelConfig
    from generative_audio_tpu.train import CheckpointManager
    probe = T.RestorationTrainer(T.RestorationTrainConfig(
        model=UNetModelConfig(in_channels=1, out_channels=1, dropout=0.2),
        num_freqs=128, num_frames=64))
    tree = {"params": probe.state.params,
            "batch_stats": probe.state.batch_stats,
            "opt_state": probe.state.opt_state, "step": np.asarray(0)}
    r1 = CheckpointManager(str(ckpt1)).restore("latest", tree)
    r2 = CheckpointManager(str(ckpt2)).restore("latest", tree)
    import jax.tree_util as jtu
    worst = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        r1["params"], r2["params"])))
    # sharded-reduction reorder + 2 Adam steps (the TestTrainerMeshParity
    # bound); batch_stats are plain running means — no Adam amplification,
    # but step-2 stats flow through step-1's perturbed params -> a few 1e-4
    assert worst < 2e-3, worst
    worst_bs = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        r1["batch_stats"], r2["batch_stats"])))
    assert worst_bs < 5e-4, worst_bs

    # (c) resume under the launcher: steps continue from 2 -> 4
    proc = _launch_cmd(2, 2, cmd2 + ["-R"])
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    step3 = json.loads((ckpt2 / "latest_step.json").read_text())["step"]
    assert step3 == step2 + 2
