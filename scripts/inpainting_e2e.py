"""End-to-end inpainting pipeline evidence run.

Reproduces the reference's de-facto acceptance harness
(nppc_audio/inpainting/validator/validator_nppc_model.py:930-1027) as one
driveable pipeline on real speech:

    python scripts/inpainting_e2e.py corpus            # build FLAC corpus
    python scripts/inpainting_e2e.py train-restoration # masked-MSE UNet (TPU)
    python scripts/inpainting_e2e.py train-nppc        # PC-direction head (TPU)
    python scripts/inpainting_e2e.py validate          # NPPCValidator + organize_jsons
    python scripts/inpainting_e2e.py report            # REPORT.md + report.html

Corpus: the 12 committed 16 kHz speech clips from the reference checkout
(FullSubNet_plus/out_dir/enhanced_0194/*.wav) re-encoded as a
LibriSpeech-layout FLAC corpus (speaker/chapter dirs + *.trans.txt) through
the from-scratch encoder in tests/flac_writer.py, exercising the native C++
FLAC decode path end to end. 10 files train / 2 files validation.

All hyperparameters follow the reference's canonical inpainting config
(inpainting/scripts/train/config/config.yaml): 2.044 s subsamples, 128 ms
gap at 0.4 s, nfft 255 / hop 128 / win 255 => [F=128, T=256] spectrograms,
Adam lr 1e-4 betas (0.5, 0.999); NPPC head n_dirs=5, second-moment grace
500 (config_nppc.yaml). Batch size is 16 (not 128) because the demo corpus
is 2 minutes of speech, not train-clean-360.
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

REF_WAVS = Path("/root/reference/FullSubNet_plus/out_dir/enhanced_0194")
CORPUS = REPO / "data" / "libri_demo"
WORK = REPO / "data" / "inpainting_e2e"
ARTIFACTS = REPO / "artifacts" / "inpainting_e2e"
REST_CKPT = WORK / "ckpt_restoration"
NPPC_CKPT = WORK / "ckpt_nppc"

CHUNK_SECONDS = 3.2
SR = 16000
BATCH = 16
N_TRAIN_POOL = 150         # distinct pre-staged device-resident batches
N_VAL_POOL = 4


# ----------------------------------------------------------------- corpus --
def build_corpus(augmented: bool = False):
    """FLAC corpus; with `augmented`, the round-4 overfit levers
    (VERDICT r3 item 4): wide speed perturbation (0.8x/1.25x on top of
    0.9x/1.1x, the 5x Kaldi recipe) and an image-source RIR reverb copy
    of every train source (data/rir.py — the same bank the enhancement
    line's reverb arm uses, ref dataset_train.py:129-182). Validation
    stays natural-speed dry so the held-out regime is unchanged."""
    from scipy.io import wavfile
    from scipy.signal import fftconvolve
    from tests.flac_writer import flac_stream, _subframe_header

    from generative_audio_tpu.data import speed_perturb

    rirs = []
    if augmented:
        from generative_audio_tpu.data.audio_io import load_audio
        from generative_audio_tpu.data.rir import make_rir_bank
        scp = make_rir_bank(WORK / "rir", n=20, seed=7, sr=SR)
        rirs = [load_audio(p, SR) for p in scp.read_text().splitlines()]

    wavs = sorted(REF_WAVS.glob("*.wav"))
    assert len(wavs) >= 12, f"expected reference wavs under {REF_WAVS}"
    splits = {"train": wavs[:10], "val": wavs[10:12]}
    chunk = int(CHUNK_SECONDS * SR)
    for split, files in splits.items():
        # Kaldi-style speed perturbation triples the effective TRAIN
        # speakers (0.9x/1.1x shift pitch + tempo); validation stays at
        # natural speed so the held-out metric regime is unchanged.
        variants = [(None, 1.0)]
        if split == "train":
            variants += [("sp0.9", 0.9), ("sp1.1", 1.1)]
            if augmented:
                variants += [("sp0.8", 0.8), ("sp1.25", 1.25)]
        sources = [(spk_base + 100 * vi, wav_path, factor, False)
                   for vi, (_, factor) in enumerate(variants)
                   for spk_base, wav_path in enumerate(files)]
        if split == "train" and augmented:
            sources += [(spk + 1000, wav_path, factor, True)
                        for spk, wav_path, factor, _ in sources]
        for spk, wav_path, factor, reverb in sources:
            sr, pcm = wavfile.read(wav_path)
            assert sr == SR and pcm.dtype == np.int16
            if factor != 1.0 or reverb:
                x = pcm.astype(np.float32) / 32768.0
                if factor != 1.0:
                    x = speed_perturb(x, factor)
                if reverb:
                    rir = rirs[spk % len(rirs)]
                    x = fftconvolve(x, rir)[: len(x)]
                    x *= 0.95 / max(np.abs(x).max(), 1e-9)
                pcm = np.clip(np.round(x * 32768.0),
                              -32768, 32767).astype(np.int16)
            chap_dir = CORPUS / split / f"{spk:03d}" / "000"
            chap_dir.mkdir(parents=True, exist_ok=True)
            trans_lines = []
            for ci, start in enumerate(range(0, len(pcm) - chunk + 1, chunk)):
                seg = pcm[start:start + chunk].astype(np.int64)
                frames = []
                for fs in range(0, len(seg), 4096):
                    block = seg[fs:fs + 4096]

                    def make(block=block):
                        def write(bw, bs):
                            _subframe_header(bw, 1)   # verbatim subframe
                            for s in block:
                                bw.write_signed(int(s), 16)
                        return write
                    frames.append((len(block), 0, make()))
                stem = f"{spk:03d}-000-{ci:04d}"
                (chap_dir / f"{stem}.flac").write_bytes(
                    flac_stream(frames, sr=SR, total=len(seg)))
                trans_lines.append(f"{stem} SPEECH SEGMENT {ci}")
            (chap_dir / f"{spk:03d}-000.trans.txt").write_text(
                "\n".join(trans_lines) + "\n")
        n = len(list((CORPUS / split).rglob("*.flac")))
        print(f"{split}: {n} FLAC utterances")


# ------------------------------------------------------------------- data --
def dataset_config(split: str, seed=None):
    from generative_audio_tpu.data import AudioInpaintingConfig
    from generative_audio_tpu.data.inpainting_dataset import StftSettings
    return AudioInpaintingConfig(
        clean_path=str(CORPUS / split),
        sample_rate=SR,
        missing_length_seconds=0.128,
        missing_start_seconds=0.4,
        sub_sample_length_seconds=2.044,
        target_dB_FS=-25.0,
        stft_configuration=StftSettings(nfft=255, hop_length=128,
                                        win_length=255),
        seed=seed,
    )


def stage_batches(split: str, n_batches: int, seed: int):
    """Draw n_batches x BATCH random subsamples on the CPU backend and stack
    them — staged once to the accelerator by the caller. Returns a list of
    (masked_stft, mask_frames, clean_stft) numpy batches."""
    import jax
    from generative_audio_tpu.data import AudioInpaintingDataset
    cpu = jax.devices("cpu")[0]
    ds = AudioInpaintingDataset(dataset_config(split, seed=None))
    rng = np.random.default_rng(seed)
    batches = []
    with jax.default_device(cpu):
        for _ in range(n_batches):
            items = [ds[int(rng.integers(0, len(ds)))] for _ in range(BATCH)]
            batches.append((
                np.stack([it.stft_masked for it in items]),
                np.stack([it.mask_frames for it in items]),
                np.stack([it.stft_clean for it in items])))
    return batches


class PoolLoader:
    """Minimal loader over pre-staged device-resident batches."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def put_pool(batches):
    import jax
    return PoolLoader([jax.device_put(b) for b in batches])


# ------------------------------------------------------------ restoration --
def train_restoration(steps: int, dropout: float = 0.2, tag: str = "",
                      fresh: bool = False, ema_decay: float = 0.0,
                      weight_decay: float = 0.0):
    import jax
    from generative_audio_tpu.models.nppc_model import UNetModelConfig
    from generative_audio_tpu.train import (
        RestorationTrainConfig, RestorationTrainer)

    print(f"backend={jax.default_backend()}, dropout={dropout}, tag={tag!r},"
          f" ema={ema_decay:g}, wd={weight_decay:g}")
    t0 = time.time()
    train_pool = put_pool(stage_batches("train", N_TRAIN_POOL, seed=1))
    val_pool = put_pool(stage_batches("val", N_VAL_POOL, seed=2))
    print(f"staged {N_TRAIN_POOL}+{N_VAL_POOL} batches "
          f"in {time.time() - t0:.1f}s")

    cfg = RestorationTrainConfig(
        model=UNetModelConfig(in_channels=1, out_channels=1,
                              dropout=dropout),
        num_freqs=128, num_frames=256,
        log_interval=100, save_interval=1000,
        ema_decay=ema_decay,
        optimizer=("adamw" if weight_decay > 0 else "Adam"),
        weight_decay=weight_decay)
    trainer = RestorationTrainer(cfg, checkpoint_dir=str(REST_CKPT) + tag)
    start = 0
    if not fresh and trainer.restore_latest():
        start = int(trainer.state.step)
        print(f"resumed from step {start} (outage-tolerant restart)")
    seg = max(steps - start, 0)
    if seg == 0:
        print(f"nothing to train (checkpoint already at step {start} >= "
              f"{steps}); history file left untouched — use --fresh for a "
              "from-scratch rerun")
        return
    t0 = time.time()
    trainer.train(train_pool, n_steps=seg, val_loader=val_pool, log=print)
    dt = time.time() - t0
    final_val = trainer.validate(val_pool)
    history = {
        "train_loss": trainer.loss_history,
        "val_loss": trainer.val_loss_history,
        "final_val_loss": final_val,
        "best_val_loss": (None if trainer.best_val == float("inf")
                          else trainer.best_val),
        "steps": steps,
        "resumed_from": start,
        "seconds": dt,
        "ms_per_step": 1000 * dt / max(seg, 1),
        "backend": jax.default_backend(),
        "dropout": dropout,
        "ema_decay": ema_decay,
        "weight_decay": weight_decay,
        "best_val_is_ema": ema_decay > 0,
        "n_train_sources": len(list((CORPUS / "train").rglob("*.flac"))),
    }
    WORK.mkdir(parents=True, exist_ok=True)
    ARTIFACTS.mkdir(parents=True, exist_ok=True)
    for root in (WORK, ARTIFACTS):
        (root / f"restoration_history{tag}.json").write_text(
            json.dumps(history, default=float))
    print(f"restoration{tag}: {steps} steps in {dt:.0f}s "
          f"({1000 * dt / steps:.0f} ms/step), final val masked-MSE "
          f"{final_val:.5f} (last-100 train "
          f"{float(np.mean(trainer.loss_history[-100:])):.5f})")


# ------------------------------------------------------------------- nppc --
def train_nppc(steps: int, dropout: float = 0.2, rest_tag: str = "",
               tag: str = "", fresh: bool = False,
               objective_variant: str = "standard"):
    import jax
    from generative_audio_tpu.train import (
        RestorationTrainConfig, RestorationTrainer, CheckpointManager)
    from generative_audio_tpu.train.nppc import (
        NPPCInpaintingTrainConfig, NPPCInpaintingTrainer)
    from generative_audio_tpu.models.nppc_model import (
        UNetModelConfig, InpaintingNPPCConfig)
    from generative_audio_tpu.models.pc_wrapper import (
        AudioInpaintingPCWrapperConfig)

    print(f"backend={jax.default_backend()}, rest_tag={rest_tag!r}")
    train_pool = put_pool(stage_batches("train", N_TRAIN_POOL, seed=3))
    val_pool = put_pool(stage_batches("val", N_VAL_POOL, seed=4))

    # restore the frozen restoration UNet
    probe = RestorationTrainer(RestorationTrainConfig(
        model=UNetModelConfig(1, 1, dropout),
        num_freqs=128, num_frames=256))
    rest_mgr = CheckpointManager(str(REST_CKPT) + rest_tag)
    # prefer the val-minimum checkpoint (best/) over the final snapshot —
    # masked-MSE val is noisy across checkpoints on this line
    restored = rest_mgr.restore(
        "best", {"params": probe.state.params,
                 "batch_stats": probe.state.batch_stats})
    if restored is None:
        restored = rest_mgr.restore(
            "latest", {"params": probe.state.params,
                       "batch_stats": probe.state.batch_stats,
                       "opt_state": probe.state.opt_state, "step": 0})
    else:
        print(f"using val-minimum restoration checkpoint "
              f"(val {rest_mgr.best_score():.5f})")
    assert restored is not None, "run train-restoration first"
    rest_vars = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    cfg = NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UNetModelConfig(1, 1, dropout),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=5, n_dirs=5)),
        num_freqs=128, num_frames=256,
        second_moment_loss_grace=500, log_interval=100, save_interval=1000,
        objective_variant=objective_variant)
    trainer = NPPCInpaintingTrainer(cfg, restoration_variables=rest_vars,
                                    checkpoint_dir=str(NPPC_CKPT) + tag)
    start = 0
    if not fresh and trainer.restore_latest():
        start = int(trainer.state.step)
        print(f"resumed from step {start} (outage-tolerant restart)")
    seg = max(steps - start, 0)
    if seg == 0:
        print(f"nothing to train (checkpoint already at step {start} >= "
              f"{steps}); history file left untouched — use --fresh for a "
              "from-scratch rerun")
        return
    t0 = time.time()
    trainer.train(train_pool, n_steps=seg, val_loader=val_pool, log=print)
    dt = time.time() - t0
    v_obj, v_rec = trainer.validate(val_pool)
    history = {
        "objective": trainer.loss_history,
        "reconst_err": trainer.reconst_err_history,
        "final_val_objective": v_obj,
        "final_val_reconst_err": v_rec,
        "steps": steps,
        "resumed_from": start,
        "seconds": dt,
        "ms_per_step": 1000 * dt / max(seg, 1),
        "backend": jax.default_backend(),
        "dropout": dropout,
        "restoration_tag": rest_tag,
        "objective_variant": objective_variant,
    }
    ARTIFACTS.mkdir(parents=True, exist_ok=True)
    for root in (WORK, ARTIFACTS):
        (root / f"nppc_history{tag}.json").write_text(
            json.dumps(history, default=float))
    print(f"nppc{tag}: {steps} steps in {dt:.0f}s ({1000 * dt / steps:.0f} "
          f"ms/step), final val reconst_err {v_rec:.5f}")


# --------------------------------------------------------------- validate --
def validate(n_samples: int, dropout: float = 0.2, tag: str = ""):
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.data import AudioInpaintingDataset
    from generative_audio_tpu.train import (
        RestorationTrainConfig, RestorationTrainer, CheckpointManager)
    from generative_audio_tpu.train.nppc import (
        NPPCInpaintingTrainConfig, NPPCInpaintingTrainer)
    from generative_audio_tpu.models.nppc_model import (
        UNetModelConfig, InpaintingNPPCConfig, InpaintingRestorationModel)
    from generative_audio_tpu.models.pc_wrapper import (
        AudioInpaintingPCWrapperConfig)
    from generative_audio_tpu.eval import (
        NPPCValidator, NPPCValidatorConfig)
    from generative_audio_tpu.eval.nppc_validator import organize_jsons
    from generative_audio_tpu.ops.preprocess import preprocess_data

    cfg = NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UNetModelConfig(1, 1, dropout),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=5, n_dirs=5)),
        num_freqs=128, num_frames=256)
    trainer = NPPCInpaintingTrainer(cfg)
    # partial=True: the checkpoint also carries opt_state (resume support);
    # the validator only consumes params/batch_stats — the artifact-consumer
    # restore path.
    restored = CheckpointManager(str(NPPC_CKPT) + tag).restore(
        "latest", {"params": trainer.state.params,
                   "batch_stats": trainer.state.batch_stats,
                   "step": 0}, partial=True)
    assert restored is not None, "run train-nppc first"
    nppc_vars = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    rest_model = InpaintingRestorationModel(cfg.model.restoration)
    rest_vars = {
        "params": nppc_vars["params"]["pretrained_restoration_model"],
        "batch_stats":
            nppc_vars["batch_stats"]["pretrained_restoration_model"]}

    def nppc_apply(v, masked_norm, mask4):
        return trainer.model.apply(v, masked_norm, mask4, train=False)

    def rest_apply(v, masked_norm, mask4, rngs=None):
        return rest_model.apply(v, masked_norm, mask4, train=False,
                                mc_dropout=rngs is not None, rngs=rngs)

    # per-variant output dir: round-5 validates both objective variants
    # side by side, and a shared dir would clobber the first's JSONs
    out_dir = ARTIFACTS / ("validation" + tag)
    out_dir.mkdir(parents=True, exist_ok=True)
    vcfg = NPPCValidatorConfig(save_dir=str(out_dir), n_mc_samples=50,
                               n_components=5)
    validator = NPPCValidator(nppc_apply, nppc_vars, rest_apply, rest_vars,
                              vcfg)

    # per-index seeding makes ds[i] deterministic, so wrapping past len(ds)
    # must REBUILD the dataset with a new seed per pass — otherwise
    # sample i and i+len(ds) are bit-identical (same subsample + mask) and
    # the report double-counts utterances
    ds = AudioInpaintingDataset(dataset_config("val", seed=123))
    datasets = {0: ds}

    def val_item(i):
        pass_idx = i // len(ds)
        if pass_idx not in datasets:
            datasets[pass_idx] = AudioInpaintingDataset(
                dataset_config("val", seed=123 + 1000 * pass_idx))
        return datasets[pass_idx][i % len(ds)]

    cpu = jax.devices("cpu")[0]
    reports = []
    for i in range(n_samples):
        item = val_item(i)
        with jax.default_device(cpu):
            clean_norm, mask4, masked_norm, mean, std = preprocess_data(
                jnp.asarray(item.stft_clean[None]),
                jnp.asarray(item.stft_masked[None]),
                jnp.asarray(item.mask_frames[None]), return_stats=True)
        clean_phase = np.arctan2(item.stft_clean[1], item.stft_clean[0])
        # masked_audio has the gap zeroed; the validator splices its own
        # reconstruction INTO the gap, so it is the right carrier clip
        full_audio = np.asarray(item.masked_audio)[0]
        report = validator.validate_sample(
            masked_norm, mask4, clean_norm, sample_idx=i,
            stats=(float(mean), float(std)), clean_phase=clean_phase,
            full_audio=full_audio,
            gap_bounds=(item.mask_start_idx, item.mask_end_idx),
            make_plots=(i < 2), make_audio=(i < 2))
        keep = {k: v for k, v in report.items() if k != "audio_variations"}
        print(f"sample {i}: {json.dumps(keep, default=float)[:300]}")
        reports.append(report)

    df = organize_jsons(out_dir, output_path=out_dir / "nppc_vs_mc.png")
    df.to_json(out_dir / "summary.json", orient="records", indent=2)
    print(df.to_string())


# ----------------------------------------------------------------- report --
def _history(name):
    """Run histories live in WORK (wiped between rounds) and are copied
    to ARTIFACTS (committed); read whichever exists."""
    for root in (WORK, ARTIFACTS):
        p = root / name
        if p.exists():
            return json.loads(p.read_text())
    return None


def _overfit_rows():
    """One row per restoration run history found (baseline + arms)."""
    names = sorted({p.name for root in (WORK, ARTIFACTS)
                    for p in root.glob("restoration_history*.json")})
    # the round-3 9000-step run's history lived in the (wiped) work dir;
    # its numbers survive in the committed round-3 REPORT training table
    rows = ["| r3 9000-step (REPORT r3 table) | 3x corpus | 0.2 | 0.0740 "
            "| 1.3126 | n/a | 17.7x |"]
    for name in names:
        h = _history(name)
        arm = (name[len("restoration_history"):-len(".json")]
               or "r3 3000-step")
        if h.get("ema_decay"):
            arm += f" ema{h['ema_decay']:g}"
        if h.get("weight_decay"):
            arm += f" wd{h['weight_decay']:g}"
        tr = float(np.mean(h["train_loss"][-100:]))
        va = float(h["final_val_loss"])
        bv = h.get("best_val_loss")
        rows.append(
            f"| {arm.lstrip('_')} | {h.get('n_train_sources', 'n/a')} | "
            f"{h.get('dropout', 0.2):g} | {tr:.4f} | {va:.4f} | "
            f"{bv:.4f} | {va / max(tr, 1e-9):.1f}x |" if bv is not None else
            f"| {arm.lstrip('_')} | {h.get('n_train_sources', 'n/a')} | "
            f"{h.get('dropout', 0.2):g} | {tr:.4f} | {va:.4f} | n/a | "
            f"{va / max(tr, 1e-9):.1f}x |")
    return rows


def report(tag: str = ""):
    from generative_audio_tpu.utils.report import HTMLReport

    nppc = _history(f"nppc_history{tag}.json")
    rest = _history(f"restoration_history{tag}.json")
    if rest is None and nppc and nppc.get("restoration_tag") is not None:
        # the NPPC arm may wrap a differently-tagged restoration (round 5:
        # _r5 wraps the _ema arm)
        rest = _history(
            f"restoration_history{nppc['restoration_tag']}.json")
    val_dir = ARTIFACTS / ("validation" + tag)
    if not (val_dir / "summary.json").exists():
        val_dir = ARTIFACTS / "validation"
    summary = json.loads((val_dir / "summary.json").read_text())

    rep = HTMLReport("Audio-inpainting NPPC end-to-end run")
    rep.add_scalars("Restoration training", {
        "steps": rest["steps"], "backend": rest["backend"],
        "ms_per_step": rest["ms_per_step"],
        "first-100-step masked MSE": float(np.mean(rest["train_loss"][:100])),
        "last-100-step masked MSE": float(np.mean(rest["train_loss"][-100:])),
        "final val masked MSE": rest["final_val_loss"]})
    rep.add_curve("Restoration masked-MSE", {
        "train": rest["train_loss"],
        "val": np.asarray(rest["val_loss"], float)
        if rest["val_loss"] else np.zeros((0, 2))}, logy=True)
    rep.add_scalars("NPPC training", {
        "steps": nppc["steps"], "backend": nppc["backend"],
        "ms_per_step": nppc["ms_per_step"],
        "first-100-step reconst_err":
            float(np.mean(nppc["reconst_err"][:100])),
        "last-100-step reconst_err":
            float(np.mean(nppc["reconst_err"][-100:])),
        "final val reconst_err": nppc["final_val_reconst_err"]})
    rep.add_curve("NPPC reconst_err", {"train": nppc["reconst_err"]})
    for row in summary:
        rep.add_scalars(f"Validation {row['sample']}", row)
    out = ARTIFACTS / "report.html"
    rep.write(out)

    lines = [
        "# Audio-inpainting NPPC — end-to-end evidence run",
        "",
        f"Date: {time.strftime('%Y-%m-%d')}; "
        f"backend: {rest['backend']}.",
        "",
        "Pipeline: LibriSpeech-style FLAC corpus (native C++ decode) -> "
        "restoration UNet (masked MSE) -> 5-direction NPPC head -> "
        "NPPCValidator (MC-dropout+PCA baseline, 50 passes) -> "
        "organize_jsons. Reference harness: "
        "inpainting/validator/validator_nppc_model.py:930-1027.",
        "",
        "## Training",
        "",
        "| stage | steps | ms/step | first-100 loss | last-100 loss | "
        "final val |",
        "|---|---|---|---|---|---|",
        f"| restoration (masked MSE) | {rest['steps']} | "
        f"{rest['ms_per_step']:.0f} | "
        f"{np.mean(rest['train_loss'][:100]):.4f} | "
        f"{np.mean(rest['train_loss'][-100:]):.4f} | "
        f"{rest['final_val_loss']:.4f} |",
        f"| NPPC (reconst_err) | {nppc['steps']} | "
        f"{nppc['ms_per_step']:.0f} | "
        f"{np.mean(nppc['reconst_err'][:100]):.4f} | "
        f"{np.mean(nppc['reconst_err'][-100:]):.4f} | "
        f"{nppc['final_val_reconst_err']:.4f} |",
    ]
    if rest.get("best_val_loss") is not None:
        lines += [
            "",
            f"The NPPC head wraps the restoration's VAL-MINIMUM "
            f"checkpoint (masked-MSE {rest['best_val_loss']:.4f}, saved "
            f"by the round-4 best-val checkpointing in "
            f"`train/restoration.py`), not the final snapshot "
            f"({rest['final_val_loss']:.4f}) — masked-MSE val is noisy "
            f"across checkpoints on this line.",
        ]
    lines += [
        "",
        "## Restoration overfit attack (round 4, VERDICT r3 item 4)",
        "",
        "The round-3 restoration overfit 17x train-to-val (0.0740 vs "
        "1.3126) on the 3x-speed corpus at the reference's canonical "
        "dropout 0.2. Round-4 arms apply the corpus levers measured on "
        "the enhancement line — wide 5x speed perturbation + image-source "
        "RIR reverb copies (`corpus --augmented`, 10x sources) — and "
        "sweep UNet dropout:",
        "",
        "| arm | corpus sources | dropout | last-100 train | final val | "
        "best val | val/train |",
        "|---|---|---|---|---|---|---|",
        *_overfit_rows(),
        "",
        "Sweep verdict (r4): corpus augmentation ALONE made final val "
        "worse (the reverb copies shift the train distribution), dropout "
        "0.4 is the sweep minimum (0.6 over-regularizes), and val-minimum "
        "checkpointing cut the selected-checkpoint val/train ratio to "
        "~10x from the r3 final-snapshot's 17.7x.",
        "",
        "Round-5 regularizer A/B (VERDICT r4 item 2 — the two untried "
        "remedies, reference NetWrapper ema/weight_decay, "
        "nppc/auxil.py:316-322,370-378, wired as `--ema`/`--wd`): EMA "
        "0.999 (with the reference's 1/step warmup; validation and best/ "
        "selection on the EMA shadow) is the decisive lever — best val "
        "0.4257 vs the d4b arm's 0.6854 (-38%), val/train ~6.2x. AdamW "
        "weight decay 1e-4 alone is a clear rejection (best val 1.0724, "
        "worse than no regularizer), and composing it with EMA adds "
        "nothing (0.4305 vs 0.4257). The remaining ~6x gap is the "
        "corpus-scale constraint: validation is 2 held-out SPEAKERS x 6 "
        "utterances, so speaker-level generalization of gap inpainting, "
        "not optimization, binds (no additional in-image speech exists; "
        "on a real LibriSpeech deployment the same stages apply "
        "unchanged).",
        "",
        "## Validation (held-out files, NPPC vs MC-dropout+PCA)",
        "",
        "| sample | NPPC residual | MC residual | NPPC rmse | MC rmse | "
        "min principal angle (deg) |",
        "|---|---|---|---|---|---|",
    ]
    for row in summary:
        lines.append(
            f"| {row['sample']} | {row['nppc_residual']:.4f} | "
            f"{row['mc_residual']:.4f} | {row['nppc_rmse']:.4f} | "
            f"{row['mc_rmse']:.4f} | {row['min_principal_angle']:.1f} |")
    nppc_res = np.mean([r["nppc_residual"] for r in summary])
    mc_res = np.mean([r["mc_residual"] for r in summary])
    wins = sum(r["nppc_residual"] < r["mc_residual"] for r in summary)
    lines += [
        "",
        f"Mean residual error: NPPC {nppc_res:.4f} vs MC-dropout "
        f"{mc_res:.4f} ({'NPPC <= MC' if nppc_res <= mc_res else 'MC < NPPC'}"
        f"; NPPC lower on {wins}/{len(summary)} samples).",
        "",
        "Margin trajectory across rounds, as the restoration improved "
        "(r3: 17x-overfit dropout-0.2; r4: dropout-0.4 + val-minimum "
        "best, 0.6854; r5: + EMA, 0.4257): NPPC 27.24 / MC 53.39 (r3) "
        "-> 27.92 / 36.20 (r4) -> "
        f"{nppc_res:.2f} / {mc_res:.2f} (r5). The NPPC residual is "
        "stable while every restoration improvement flows to the "
        "MC-dropout baseline — the early margins largely measured the "
        "restoration's overfit, and around a well-regularized "
        "restoration the two uncertainty methods converge (min "
        "principal angles 36-48 deg: the subspaces agree only "
        "moderately even as their quality converges).",
    ]
    std_p = ARTIFACTS / "validation_r5" / "summary.json"
    al_p = ARTIFACTS / "validation_r5al" / "summary.json"
    if std_p.exists() and al_p.exists():
        std = json.loads(std_p.read_text())
        al = json.loads(al_p.read_text())
        h_al = _history("nppc_history_r5al.json") or {}
        lines += [
            "",
            "## NPPC objective variants on-chip (round 5, VERDICT r4 "
            "item 3)",
            "",
            "Both heads trained 6000 steps around the SAME (EMA, best-val "
            "0.4257) frozen restoration: `base_step` (error-projection, "
            "nppc_trainer.py:338-385) vs `mc_pca_aligned` (base_step2, "
            "nppc_trainer.py:244-336 — each direction aligned to the "
            "matching MC-dropout-PCA direction, second moment targeting "
            "its singular value; in-step 50-pass MC baseline, "
            "lax.map-chunked).",
            "",
            "| sample | std residual | aligned residual | std rmse | "
            "aligned rmse | std min angle | aligned min angle |",
            "|---|---|---|---|---|---|---|",
        ]
        for s_row, a_row in zip(std, al):
            lines.append(
                f"| {s_row['sample']} | {s_row['nppc_residual']:.4f} | "
                f"{a_row['nppc_residual']:.4f} | {s_row['nppc_rmse']:.4f} "
                f"| {a_row['nppc_rmse']:.4f} | "
                f"{s_row['min_principal_angle']:.1f} | "
                f"{a_row['min_principal_angle']:.1f} |")
        s_ang = float(np.mean([r["min_principal_angle"] for r in std]))
        a_ang = float(np.mean([r["min_principal_angle"] for r in al]))
        s_res = float(np.mean([r["nppc_residual"] for r in std]))
        a_res = float(np.mean([r["nppc_residual"] for r in al]))
        lines += [
            "",
            f"Mean min principal angle vs the MC-PCA subspace: std "
            f"{s_ang:.1f} deg vs aligned {a_ang:.1f} deg — alignment "
            + ("closes" if a_ang < s_ang - 5 else "does not close")
            + f" the subspace gap; mean residual error std {s_res:.4f} "
            f"vs aligned {a_res:.4f} (residual measures error capture, "
            "which the aligned objective does not optimize — the "
            "reference keeps base_step2 experimental for the same "
            "reason).",
        ]
    # standing sections maintained as standalone artifacts (the
    # pesq_family_audit.md pattern) so a re-render never drops them
    vad_md = ARTIFACTS / "vad_ab_section.md"
    if vad_md.exists():
        lines += ["", vad_md.read_text().rstrip()]
    (ARTIFACTS / "REPORT.md").write_text("\n".join(lines) + "\n")
    print((ARTIFACTS / "REPORT.md").read_text())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=[
        "corpus", "train-restoration", "train-nppc", "validate", "report"])
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--samples", type=int, default=6)
    parser.add_argument("--augmented", action="store_true",
                        help="corpus: wide speed perturbation + RIR "
                        "reverb copies (round-4 overfit levers)")
    parser.add_argument("--dropout", type=float, default=0.2,
                        help="UNet dropout (reference canonical 0.2)")
    parser.add_argument("--tag", default="",
                        help="suffix for ckpt dir + history json")
    parser.add_argument("--rest_tag", default="",
                        help="train-nppc: tag of the restoration ckpt")
    parser.add_argument("--fresh", action="store_true",
                        help="train stages: ignore an existing checkpoint "
                        "and train from scratch")
    parser.add_argument("--ema", type=float, default=0.0,
                        help="train-restoration: EMA decay (reference "
                        "NetWrapper ema, nppc/auxil.py:370-378); val + "
                        "best-checkpoint selection use the EMA params")
    parser.add_argument("--wd", type=float, default=0.0,
                        help="train-restoration: AdamW weight decay")
    parser.add_argument("--objective", default="base_step",
                        choices=["base_step", "mc_pca_aligned"],
                        help="train-nppc: NPPC objective variant "
                        "(mc_pca_aligned = reference base_step2)")
    args = parser.parse_args()
    if args.stage == "corpus":
        build_corpus(augmented=args.augmented)
    elif args.stage == "train-restoration":
        train_restoration(args.steps or 3000, dropout=args.dropout,
                          tag=args.tag, fresh=args.fresh,
                          ema_decay=args.ema, weight_decay=args.wd)
    elif args.stage == "train-nppc":
        train_nppc(args.steps or 2000, dropout=args.dropout,
                   rest_tag=args.rest_tag, tag=args.tag, fresh=args.fresh,
                   objective_variant=args.objective)
    elif args.stage == "validate":
        validate(args.samples, dropout=args.dropout, tag=args.tag)
    elif args.stage == "report":
        report(tag=args.tag)


if __name__ == "__main__":
    main()
