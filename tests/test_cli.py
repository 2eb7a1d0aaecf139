"""CLI end-to-end tests: train (restoration line) on a synthetic corpus,
inference over a wav dir with a small trained checkpoint, metric CLI."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from generative_audio_tpu.data import write_synthetic_corpus
from generative_audio_tpu.data.audio_io import write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    return write_synthetic_corpus(root, n_clean=3, n_noise=2, seconds=3.0)


def test_train_cli_restoration(tmp_path, corpus):
    clean_dir, noise_dir = corpus
    cfg = {
        "line": "restoration",
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "train": {
            "model": {"in_channels": 1, "out_channels": 1, "dropout": 0.2},
            "num_freqs": 128, "num_frames": 256,
            "log_interval": 2, "save_interval": 100,
        },
        "data": {
            "clean_path": str(clean_dir),
            "missing_length_seconds": 0.128,
            "sub_sample_length_seconds": 2.044,
            "file_glob": "*.wav",
        },
        "dataloader": {"global_batch_size": 2, "num_workers": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from generative_audio_tpu.cli.train import main
    main(["-C", str(cfg_path), "--steps", "3"])
    assert (tmp_path / "ckpt" / "latest").exists()


def test_train_cli_restoration_validation_block(tmp_path, corpus):
    """A `validation:` dataset block turns on periodic val at log_interval
    and the val-minimum best/ checkpoint (round-4 lever)."""
    clean_dir, _ = corpus
    data = {
        "clean_path": str(clean_dir),
        "missing_length_seconds": 0.128,
        "sub_sample_length_seconds": 2.044,
        "file_glob": "*.wav",
    }
    cfg = {
        "line": "restoration",
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "train": {
            "model": {"in_channels": 1, "out_channels": 1, "dropout": 0.2},
            "num_freqs": 128, "num_frames": 256,
            "log_interval": 2, "save_interval": 100,
        },
        "data": data,
        "validation": data,        # same synthetic corpus as a val stand-in
        "dataloader": {"global_batch_size": 2, "num_workers": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from generative_audio_tpu.cli.train import main
    main(["-C", str(cfg_path), "--steps", "4"])
    assert (tmp_path / "ckpt" / "best").exists()
    assert (tmp_path / "ckpt" / "best_score.json").exists()


def test_train_cli_enhance_validation_probe_block(tmp_path, corpus):
    """The enhance line's `validation:` block wires fixed pair dirs into
    in-loop best-model selection, with probe_dir/probe_weight as the
    promoted probe-inclusive criterion (round 5): best_score.json must
    record the criterion it was selected under."""
    clean_dir, noise_dir = corpus
    rng = np.random.default_rng(3)
    val = tmp_path / "val"
    (val / "noisy").mkdir(parents=True)
    (val / "clean").mkdir(parents=True)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    write_wav(val / "clean" / "v0.wav", x, 16000)
    write_wav(val / "noisy" / "v0.wav",
              x + rng.standard_normal(16000).astype(np.float32) * 0.03,
              16000)
    cfg = {
        "line": "enhance",
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "train": {
            "model": {"num_freqs": 32, "sb_num_neighbors": 2,
                      "fb_model_hidden_size": 16,
                      "sb_model_hidden_size": 8,
                      # batch 2 in this test; drop_band needs B > groups
                      "num_groups_in_drop_band": 1},
            "n_fft": 62, "hop_length": 32, "win_length": 62,
            "compute_dtype": "float32",
        },
        "data": {
            "clean_path": str(clean_dir), "noisy_path": str(noise_dir),
            "sub_sample_length_seconds": 0.5,
        },
        "validation": {"val_dir": str(val), "probe_dir": str(val),
                       "probe_weight": 0.3, "validation_interval": 1},
        "dataloader": {"global_batch_size": 2, "num_workers": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from generative_audio_tpu.cli.train import main
    main(["-C", str(cfg_path), "--epochs", "1"])
    meta = json.loads((tmp_path / "ckpt" / "best_score.json").read_text())
    assert meta["probe_weight"] == pytest.approx(0.3)
    assert "composite" in meta


def test_inference_cli(tmp_path, corpus):
    clean_dir, noise_dir = corpus
    # build a tiny model checkpoint
    import jax, jax.numpy as jnp
    from generative_audio_tpu.models import (
        FullSubNetPlus, FullSubNetPlusConfig)
    from generative_audio_tpu.train import CheckpointManager

    model_cfg_dict = dict(num_freqs=257, sb_num_neighbors=2,
                          fb_model_hidden_size=8, sb_model_hidden_size=8)
    model = FullSubNetPlus(FullSubNetPlusConfig(**model_cfg_dict))
    dummy = jnp.zeros((1, 1, 257, 8))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy)["params"]
    mgr = CheckpointManager(tmp_path / "model_ckpt")
    mgr.save_latest({"params": params}, 0)

    noisy_dir = tmp_path / "noisy"
    noisy_dir.mkdir()
    rng = np.random.default_rng(0)
    write_wav(noisy_dir / "a.wav",
              rng.standard_normal(12000).astype(np.float32) * 0.1, 16000)

    cfg = {"model": model_cfg_dict,
           "inferencer": {"length_bucket": 8000}}
    cfg_path = tmp_path / "inf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from generative_audio_tpu.cli.inference import main
    main(["-C", str(cfg_path), "-M", str(tmp_path / "model_ckpt"),
          "-I", str(noisy_dir), "-O", str(tmp_path / "enhanced")])
    out = list((tmp_path / "enhanced").glob("*.wav"))
    assert len(out) == 1


def test_calculate_metrics_cli(tmp_path, rng, capsys):
    ref_dir = tmp_path / "ref"
    est_dir = tmp_path / "est"
    ref_dir.mkdir()
    est_dir.mkdir()
    t = np.arange(32000) / 16000
    clean = (0.3 * np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    write_wav(ref_dir / "x.wav", clean, 16000)
    write_wav(est_dir / "x.wav",
              clean + 0.01 * rng.standard_normal(32000).astype(np.float32),
              16000)

    from generative_audio_tpu.cli.calculate_metrics import main
    main(["-R", str(ref_dir), "-E", str(est_dir), "-M", "SI_SDR,STOI",
          "-O", str(tmp_path / "res.json"), "--jobs", "1"])
    result = json.loads((tmp_path / "res.json").read_text())
    assert result["mean"]["SI_SDR"] > 20


def test_config_system(tmp_path):
    from generative_audio_tpu.utils.config import (
        merge_config, build_dataclass, initialize_module, load_config_file)
    from generative_audio_tpu.train import EnhanceTrainConfig

    base = {"a": {"b": 1, "c": 2}, "d": 3}
    merged = merge_config(base, {"a": {"c": 9}, "e": 4})
    assert merged == {"a": {"b": 1, "c": 9}, "d": 3, "e": 4}

    cfg = build_dataclass(EnhanceTrainConfig, {
        "model": {"num_freqs": 64}, "learning_rate": 0.01,
        "betas": [0.5, 0.9]})
    assert cfg.model.num_freqs == 64 and cfg.betas == (0.5, 0.9)
    with pytest.raises(ValueError):
        build_dataclass(EnhanceTrainConfig, {"bogus_key": 1})

    cls = initialize_module(
        "generative_audio_tpu.models.FullSubNetPlusConfig",
        args={"num_freqs": 99})
    assert cls.num_freqs == 99

    p = tmp_path / "x.toml"
    p.write_text("[model]\nnum_freqs = 33\n")
    assert load_config_file(p)["model"]["num_freqs"] == 33


def test_train_cli_image_restoration(tmp_path):
    """image_restoration line end-to-end through the train CLI (tiny)."""
    from generative_audio_tpu.cli import train as train_cli
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
line: image_restoration
checkpoint_dir: {tmp_path / 'ckpt'}
train:
  dataset: mnist
  distortion_type: denoising_1
  net_type: unet
run:
  n_steps: 2
  batch_size: 4
""")
    train_cli.main(["-C", str(cfg)])
    assert (tmp_path / "ckpt" / "latest").exists()


def test_validate_cli(tmp_path, corpus):
    """validate CLI end-to-end: tiny model checkpoint + synthetic corpus ->
    validation_results.json (use_pre_trained_model pipeline)."""
    import json
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.cli import validate as validate_cli
    from generative_audio_tpu.models import (FullSubNetPlus,
                                             FullSubNetPlusConfig)
    from generative_audio_tpu.train import CheckpointManager

    model_kw = dict(num_freqs=9, sb_num_neighbors=1, fb_model_hidden_size=8,
                    sb_model_hidden_size=8, num_groups_in_drop_band=1)
    model = FullSubNetPlus(FullSubNetPlusConfig(**model_kw))
    dummy = jnp.zeros((1, 1, 9, 16))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy)["params"]
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save_latest({"params": params}, 0)

    clean_dir, noise_dir = corpus
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  num_freqs: 9
  sb_num_neighbors: 1
  fb_model_hidden_size: 8
  sb_model_hidden_size: 8
  num_groups_in_drop_band: 1
data:
  clean_path: {clean_dir}
  noisy_path: {noise_dir}
  sub_sample_length_seconds: 0.5
stft:
  nfft: 16
  hop_length: 8
  win_length: 16
""")
    out = tmp_path / "validation_results.json"
    validate_cli.main(["-C", str(cfg), "-M", str(tmp_path / "ckpt"),
                       "-O", str(out), "--max_items", "2"])
    results = json.loads(out.read_text())
    assert "SI_SDR" in results and np.isfinite(results["SI_SDR"])


def test_dump_config_roundtrip():
    """dump_config -> build_dataclass round-trips a nested config."""
    from generative_audio_tpu.utils.config import dump_config, build_dataclass
    from generative_audio_tpu.models import FullSubNetPlusConfig
    cfg = FullSubNetPlusConfig(num_freqs=33, look_ahead=1)
    d = dump_config(cfg)
    assert d["num_freqs"] == 33
    back = build_dataclass(FullSubNetPlusConfig, d)
    assert back == cfg
    # plain-dict passthrough
    assert dump_config({"a": 1}) == {"a": 1}


def test_draw_hist(tmp_path):
    from generative_audio_tpu.cli.tools import draw_hist
    import numpy as np
    rng = np.random.default_rng(0)
    one = tmp_path / "one.png"
    two = tmp_path / "two.png"
    draw_hist(rng.standard_normal(100), one)
    draw_hist(rng.standard_normal(100), two,
              data2=rng.standard_normal(100) + 1, labels=("ref", "est"))
    assert one.stat().st_size > 0 and two.stat().st_size > 0
