"""Enhancement-line quality evidence run: FullSubNet+ trained on DNS-style
synthetic mixtures of real speech to a recorded SI-SDR/STOI table.

Reproduces the reference Trainer_Finetune acceptance loop
(fullsubnet_plus/trainer/trainer.py:309-446): epoch training, periodic
composite-score validation, best-model checkpointing, tracker + HTML report.

    python scripts/enhance_quality_run.py corpus
    python scripts/enhance_quality_run.py train [--epochs 40]
    python scripts/enhance_quality_run.py report

Corpus: the 12 committed 16 kHz speech clips from the reference checkout
(FullSubNet_plus/out_dir/enhanced_0194) — 10 speakers train / 2 held out —
mixed on the fly with a 9-type synthetic noise bank (white/pink/brown,
50 Hz hum stacks, band noise, babble built from OTHER train speakers).
Validation pairs are fixed files at SNR {0, 5} dB mixed with HELD-OUT
noise types, so the eval distribution is never seen in training.
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
ROOT = REPO / "data" / "enhance_quality"
ARTIFACTS = REPO / "artifacts" / "enhance_quality"
CKPT = ROOT / "ckpt"
SR = 16000


# ----------------------------------------------------------------- corpus --
def _noise_bank(rng, n_seconds=10.0, train_speech=None):
    """DNS-style noise family. Returns {name: waveform}."""
    n = int(n_seconds * SR)
    t = np.arange(n) / SR
    out = {}
    out["white"] = rng.standard_normal(n)
    # pink/brown via FFT 1/f^alpha shaping
    for name, alpha in [("pink", 1.0), ("brown", 2.0)]:
        spec = np.fft.rfft(rng.standard_normal(n))
        f = np.fft.rfftfreq(n, 1 / SR)
        f[0] = f[1]
        out[name] = np.fft.irfft(spec / f ** (alpha / 2), n)
    # mains hum + harmonics over a noise floor
    hum = sum(np.sin(2 * np.pi * 50 * k * t + rng.random() * 6.28) / k
              for k in range(1, 6))
    out["hum"] = hum + 0.1 * rng.standard_normal(n)
    # narrow-band noise (band-passed white, 300-1200 Hz)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SR)
    spec[(f < 300) | (f > 1200)] = 0
    out["band"] = np.fft.irfft(spec, n)
    # babble: overlapping shifted copies of other train speakers
    if train_speech is not None and len(train_speech) >= 3:
        bab = np.zeros(n)
        for k in range(6):
            src = train_speech[int(rng.integers(0, len(train_speech)))]
            start = int(rng.integers(0, max(1, len(src) - n)))
            seg = src[start:start + n]
            bab[:len(seg)] += seg * (0.5 + rng.random())
        out["babble"] = bab
    # amplitude-modulated white (machinery-like)
    out["machine"] = (rng.standard_normal(n)
                      * (0.5 + 0.5 * np.sin(2 * np.pi * 7.3 * t)))
    # impulsive clicks over a floor
    clicks = np.zeros(n)
    for pos in rng.integers(0, n, 40):
        clicks[pos:pos + 40] += rng.standard_normal(40) * 4
    out["clicks"] = clicks + 0.1 * rng.standard_normal(n)
    # chirps
    out["chirp"] = np.sin(2 * np.pi * (200 + 1800 * (t % 1.0)) * t) \
        + 0.1 * rng.standard_normal(n)
    return {k: (0.2 * v / (np.abs(v).max() + 1e-9)).astype(np.float32)
            for k, v in out.items()}


def build_corpus():
    from scipy.io import wavfile
    from generative_audio_tpu.data.audio_io import write_wav
    from generative_audio_tpu.ops.waveform import tailor_dB_FS

    rng = np.random.default_rng(0)
    wavs = sorted(REF_WAVS.glob("*.wav"))
    assert len(wavs) >= 12
    train_wavs, val_wavs = wavs[:10], wavs[10:12]

    train_speech = []
    clean_dir = ROOT / "train" / "clean"
    clean_dir.mkdir(parents=True, exist_ok=True)
    chunk = 5 * SR
    for i, p in enumerate(train_wavs):
        sr, pcm = wavfile.read(p)
        x = (pcm / 32768.0).astype(np.float32)
        train_speech.append(x)
        for ci, s in enumerate(range(0, len(x) - chunk + 1, chunk)):
            write_wav(clean_dir / f"spk{i:02d}_{ci}.wav", x[s:s + chunk], SR)

    bank = _noise_bank(rng, train_speech=train_speech)
    train_noise = {k: v for k, v in bank.items()
                   if k in ("white", "pink", "hum", "band", "babble",
                            "machine")}
    val_noise = {k: v for k, v in bank.items()
                 if k in ("brown", "clicks", "chirp")}
    noise_dir = ROOT / "train" / "noise"
    noise_dir.mkdir(parents=True, exist_ok=True)
    for k, v in train_noise.items():
        write_wav(noise_dir / f"{k}.wav", v, SR)

    # Fixed validation pairs from HELD-OUT SPEAKERS at SNR {0, 5}:
    #   val      — training noise TYPES, unseen segments (the reference's
    #              validation regime: same mixing distribution, unseen audio)
    #   val_hard — entirely unseen noise types (generalization probe)
    def write_pairs(val_dir, noise_set):
        (val_dir / "noisy").mkdir(parents=True, exist_ok=True)
        (val_dir / "clean").mkdir(parents=True, exist_ok=True)
        idx = 0
        for p in val_wavs:
            sr, pcm = wavfile.read(p)
            x = (pcm / 32768.0).astype(np.float32)
            for s in range(0, len(x) - chunk + 1, chunk):
                clean = x[s:s + chunk]
                clean, *_ = tailor_dB_FS(clean, -25.0)
                for snr in (0.0, 5.0):
                    nkey = list(noise_set)[idx % len(noise_set)]
                    nz = noise_set[nkey]
                    start = int(rng.integers(0, len(nz) - chunk + 1))
                    nz = nz[start:start + chunk].copy()
                    nz, *_ = tailor_dB_FS(nz, -25.0)
                    clean_rms = np.sqrt(np.mean(clean ** 2))
                    noise_rms = np.sqrt(np.mean(nz ** 2))
                    gain = clean_rms / (noise_rms * 10 ** (snr / 20) + 1e-9)
                    noisy = clean + gain * nz
                    peak = np.abs(noisy).max()
                    if peak > 0.99:
                        clean, noisy = clean * 0.99 / peak, noisy * 0.99 / peak
                    write_wav(val_dir / "noisy" / f"v{idx:03d}.wav", noisy, SR)
                    write_wav(val_dir / "clean" / f"v{idx:03d}.wav", clean, SR)
                    idx += 1
        return idx

    n_val = write_pairs(ROOT / "val", train_noise)
    n_hard = write_pairs(ROOT / "val_hard", val_noise)
    print(f"train clean: {len(list(clean_dir.glob('*.wav')))}, "
          f"noise: {len(train_noise)}, val pairs: {n_val}, "
          f"val_hard pairs: {n_hard}")


def augment_noise():
    """Broaden the TRAINING noise manifold (generalization fix).

    The first run's probe showed STOI regressing on unseen noise types
    (brown/clicks/chirp): those are mild degradations (noisy STOI 0.80) and a
    model trained only on dense wideband noise over-suppresses them. Add six
    families that widen coverage — impulsive, tonal, low-frequency-heavy,
    narrow-band, slow-AM — while keeping the probe types themselves unseen.
    """
    from generative_audio_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(7)
    n = int(10.0 * SR)
    t = np.arange(n) / SR
    out = {}
    # low-frequency rumble: 1/f^0.75 colored (probe's brown is 1/f^2)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SR)
    f[0] = f[1]
    out["rumble"] = np.fft.irfft(spec / f ** 0.75, n)
    # gated white-noise bursts, 30-120 ms (probe's clicks are 2.5 ms)
    gate = np.zeros(n)
    for pos in rng.integers(0, n - 2000, 60):
        w = int(rng.integers(480, 1920))
        gate[pos:pos + w] = 1.0
    out["bursts"] = gate * rng.standard_normal(n) + \
        0.05 * rng.standard_normal(n)
    # steady inharmonic tone stack (probe's chirp sweeps)
    out["tones"] = sum(np.sin(2 * np.pi * fk * t + rng.random() * 6.28)
                       for fk in (427.0, 951.0, 1713.0, 2222.0)) \
        + 0.1 * rng.standard_normal(n)
    # second narrow band, 2-4 kHz
    spec = np.fft.rfft(rng.standard_normal(n))
    spec[(f < 2000) | (f > 4000)] = 0
    out["band2"] = np.fft.irfft(spec, n)
    # slow AM white (2.5 Hz; "machine" uses 7.3 Hz)
    out["am_slow"] = (rng.standard_normal(n)
                      * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t)))
    # 60 Hz mains hum stack (train "hum" is 50 Hz)
    out["hum60"] = sum(np.sin(2 * np.pi * 60 * k * t + rng.random() * 6.28)
                       / k for k in range(1, 6)) \
        + 0.1 * rng.standard_normal(n)

    noise_dir = ROOT / "train" / "noise"
    for k, v in out.items():
        v = (0.2 * v / (np.abs(v).max() + 1e-9)).astype(np.float32)
        write_wav(noise_dir / f"{k}.wav", v, SR)
    print(f"noise bank now: "
          f"{sorted(p.stem for p in noise_dir.glob('*.wav'))}")


def build_probe2():
    """Selection-blind second probe set (round-5, VERDICT r4 item 1).

    Three noise families disjoint from BOTH the 12-type training bank and
    the val_hard probe (brown/clicks/chirp), on the held-out speakers:
      mod_babble    — babble (train-speaker speech) gated by a deep slow AM
                      envelope; babble exists in TRAINING, but never
                      amplitude-gated (train AM families gate white noise)
      impulse_train — PERIODIC 8 Hz decaying rings (train clicks are
                      random-position broadband bursts)
      sweep_band    — narrow BAND NOISE whose center sweeps 300->3000 Hz
                      over 4 s (probe chirp is a swept TONE; train bands
                      are fixed)
    This set never enters any selection criterion (including probe-weight
    arms, which select on val_hard) — it is scored only on final
    checkpoints, giving probe-weight selection an unbiased generalization
    estimate.
    """
    from scipy.io import wavfile
    from generative_audio_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(41)
    n = int(10.0 * SR)
    t = np.arange(n) / SR
    out = {}
    # modulated babble from TRAIN speakers (held-out val speakers stay
    # speech-only)
    train_wavs = sorted(REF_WAVS.glob("*.wav"))[:10]
    bab = np.zeros(n)
    for k in range(6):
        sr, pcm = wavfile.read(train_wavs[int(rng.integers(0, 10))])
        src = (pcm / 32768.0).astype(np.float32)
        start = int(rng.integers(0, max(1, len(src) - n)))
        seg = src[start:start + n]
        bab[:len(seg)] += seg * (0.5 + rng.random())
    env = np.clip(np.sin(2 * np.pi * 1.3 * t + rng.random() * 6.28), 0, None)
    out["mod_babble"] = bab * env ** 2
    # periodic decaying rings
    imp = np.zeros(n)
    period = int(SR / 8.0)
    ring_t = np.arange(int(0.04 * SR)) / SR
    for pos in range(0, n - len(ring_t), period):
        f0 = 600 + 2200 * rng.random()
        imp[pos:pos + len(ring_t)] += (np.sin(2 * np.pi * f0 * ring_t)
                                       * np.exp(-ring_t / 0.008))
    out["impulse_train"] = imp + 0.05 * rng.standard_normal(n)
    # swept narrowband noise: heterodyne a fixed low-pass band up a ramp
    base = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SR)
    base[f > 150] = 0                      # ±150 Hz-wide band
    lp = np.fft.irfft(base, n)
    fc = 300 + 2700 * ((t / 4.0) % 1.0)    # 4 s sweep, repeating
    phase = 2 * np.pi * np.cumsum(fc) / SR
    out["sweep_band"] = lp * np.cos(phase)

    noise = {k: (0.2 * v / (np.abs(v).max() + 1e-9)).astype(np.float32)
             for k, v in out.items()}

    # fixed pairs from the held-out speakers, same regime as val/val_hard
    from generative_audio_tpu.ops.waveform import tailor_dB_FS
    wavs = sorted(REF_WAVS.glob("*.wav"))
    val_wavs = wavs[10:12]
    chunk = 5 * SR
    val_dir = ROOT / "val_probe2"
    (val_dir / "noisy").mkdir(parents=True, exist_ok=True)
    (val_dir / "clean").mkdir(parents=True, exist_ok=True)
    idx = 0
    for p in val_wavs:
        sr, pcm = wavfile.read(p)
        x = (pcm / 32768.0).astype(np.float32)
        for s in range(0, len(x) - chunk + 1, chunk):
            clean = x[s:s + chunk]
            clean, *_ = tailor_dB_FS(clean, -25.0)
            for snr in (0.0, 5.0):
                nkey = list(noise)[idx % len(noise)]
                nz = noise[nkey]
                start = int(rng.integers(0, len(nz) - chunk + 1))
                nz = nz[start:start + chunk].copy()
                nz, *_ = tailor_dB_FS(nz, -25.0)
                clean_rms = np.sqrt(np.mean(clean ** 2))
                noise_rms = np.sqrt(np.mean(nz ** 2))
                gain = clean_rms / (noise_rms * 10 ** (snr / 20) + 1e-9)
                noisy = clean + gain * nz
                peak = np.abs(noisy).max()
                if peak > 0.99:
                    clean, noisy = clean * 0.99 / peak, noisy * 0.99 / peak
                write_wav(val_dir / "noisy" / f"v{idx:03d}.wav", noisy, SR)
                write_wav(val_dir / "clean" / f"v{idx:03d}.wav", clean, SR)
                idx += 1
    print(f"val_probe2 pairs: {idx} ({sorted(noise)})")


# ------------------------------------------------------------------ train --
class PairFileDataset:
    """Fixed (noisy, clean) wav pairs for deterministic validation."""

    def __init__(self, root: Path):
        from generative_audio_tpu.data.audio_io import load_audio
        self._load = load_audio
        self.noisy = sorted((root / "noisy").glob("*.wav"))
        self.clean = sorted((root / "clean").glob("*.wav"))
        assert len(self.noisy) == len(self.clean) > 0

    def __len__(self):
        return len(self.noisy)

    def __getitem__(self, i):
        return (self._load(self.noisy[i], SR), self._load(self.clean[i], SR))


def perturb_speech(factors=((0.9, "sp09"), (1.1, "sp11"))):
    """Expand the TRAIN speech with speed perturbation (the Kaldi recipe;
    data/mixing.speed_perturb) — the same data-scale lever that lifted the
    inpainting line (scripts/inpainting_e2e.py corpus3x). The default
    0.9x/1.1x pair triples the corpus; `--wide` adds 0.8x/1.25x for a 5x
    corpus. Held-out validation speakers are untouched."""
    from generative_audio_tpu.data import speed_perturb
    from generative_audio_tpu.data.audio_io import load_audio, write_wav

    clean_dir = ROOT / "train" / "clean"
    bases = [p for p in sorted(clean_dir.glob("*.wav"))
             if "_sp" not in p.stem]
    n_new = 0
    for p in bases:
        x = load_audio(p, SR)
        for factor, suffix in factors:
            outp = clean_dir / f"{p.stem}_{suffix}.wav"
            if outp.exists():
                continue
            y = speed_perturb(x, factor)
            # AudioDataset random-crops 3.072 s, so any length comfortably
            # above that works (1.1x shrinks a 5 s clip to ~4.5 s)
            if len(y) >= int(3.5 * SR):
                write_wav(outp, y, SR)
                n_new += 1
    print(f"speed-perturbed: +{n_new} clips, corpus now "
          f"{len(list(clean_dir.glob('*.wav')))}")


def reverb_corpus(n_rirs: int = 40):
    """Reverb lever (reference dataset_train.py:129-182): synthesize an
    image-source RIR bank (data/rir.py) + scp lists for DNSTrainDataset,
    and fixed `val_reverb` pairs — noisy = reverb(clean) + noise at SNR
    {0, 5}, reference = reverb(clean), matching snr_mix's semantics (the
    model denoises under reverb; it is not trained to dereverb)."""
    from scipy.signal import fftconvolve
    from generative_audio_tpu.data.audio_io import load_audio, write_wav
    from generative_audio_tpu.data.rir import make_rir_bank
    from generative_audio_tpu.ops.waveform import tailor_dB_FS

    scp = make_rir_bank(ROOT / "train" / "rir", n=n_rirs, seed=3, sr=SR)
    for sub in ("clean", "noise"):
        files = sorted((ROOT / "train" / sub).glob("*.wav"))
        (ROOT / "train" / f"{sub}.scp").write_text(
            "\n".join(str(p) for p in files) + "\n")
    print(f"RIR bank: {len(scp.read_text().splitlines())} rooms")

    rng = np.random.default_rng(23)
    rirs = [load_audio(p, SR) for p in scp.read_text().splitlines()[:8]]
    val_dir = ROOT / "val_reverb"
    (val_dir / "noisy").mkdir(parents=True, exist_ok=True)
    (val_dir / "clean").mkdir(parents=True, exist_ok=True)
    dry = PairFileDataset(ROOT / "val")
    for i in range(len(dry)):
        _, clean = dry[i]
        rvb = fftconvolve(clean, rirs[i % len(rirs)])[: len(clean)]
        rvb, *_ = tailor_dB_FS(rvb, -25.0)
        noise = rng.standard_normal(len(rvb)).astype(np.float32)
        noise, *_ = tailor_dB_FS(noise, -25.0)
        snr = (0.0, 5.0)[i % 2]
        gain = (np.sqrt(np.mean(rvb ** 2))
                / (np.sqrt(np.mean(noise ** 2)) * 10 ** (snr / 20) + 1e-9))
        noisy = rvb + gain * noise
        peak = np.abs(noisy).max()
        if peak > 0.99:
            rvb, noisy = rvb * 0.99 / peak, noisy * 0.99 / peak
        write_wav(val_dir / "noisy" / f"v{i:03d}.wav", noisy, SR)
        write_wav(val_dir / "clean" / f"v{i:03d}.wav", rvb, SR)
    print(f"val_reverb pairs: {len(dry)}")


def stage_mixture_pool(n_batches: int, batch: int = 18, seed: int = 1,
                       reverb: bool = False, snr_max: float = 20.0,
                       corpus3x: bool = False):
    """Pre-mix a pool of (noisy, clean) waveform batches on the host and
    stage them to the device ONCE — on-the-fly mixing feeds the chip at
    ~2.6 s/step over the tunnel (measured), pre-staged pools at ~0.3 s.
    With `reverb`, mixing goes through DNSTrainDataset + the synthetic
    RIR bank at reverb_proportion 0.5 (run the `reverb` stage first).
    `corpus3x` restricts the clean list to the 3x subset (base + 0.9x/1.1x,
    excluding the wide 0.8x/1.25x copies) — the round-3 reverb-only arm's
    corpus, so that arm can be retrained under the recalibrated PESQ."""
    import jax
    from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
    clean_scp = ROOT / "train" / "clean.scp"
    if corpus3x:
        assert reverb, "corpus3x is defined for the scp (reverb) regime"
        files = [l for l in clean_scp.read_text().splitlines()
                 if "_sp08" not in l and "_sp125" not in l]
        clean_scp = ROOT / "train" / "clean_3x.scp"
        clean_scp.write_text("\n".join(files) + "\n")
        print(f"corpus3x: {len(files)} clean clips")
    if reverb:
        from generative_audio_tpu.data import DNSTrainConfig, DNSTrainDataset
        dataset = DNSTrainDataset(DNSTrainConfig(
            clean_dataset=str(clean_scp),
            noise_dataset=str(ROOT / "train" / "noise.scp"),
            rir_dataset=str(ROOT / "train" / "rir" / "rir.scp"),
            reverb_proportion=0.5, snr_range=(-5, int(snr_max)),
            target_dB_FS=-25.0, target_dB_FS_floating_value=10.0,
            sub_sample_length=3.072), seed=seed)
    else:
        dataset = AudioDataset(AudioDataSetConfig(
            clean_path=str(ROOT / "train" / "clean"),
            noisy_path=str(ROOT / "train" / "noise"),
            sub_sample_length_seconds=3.072, snr_range=(-5, int(snr_max)),
            target_dB_FS=-25.0, target_dB_FS_floating_value=10.0),
            seed=seed)
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_batches):
        idx = rng.integers(0, len(dataset), size=batch)
        pairs = [dataset[int(i)] for i in idx]
        noisy = np.stack([p[0] for p in pairs]).astype(np.float32)
        clean = np.stack([p[1] for p in pairs]).astype(np.float32)
        pool.append((jax.device_put(noisy), jax.device_put(clean)))
    return pool


def train(epochs: int, tag: str = "", pool: int = 200,
          pool_seed: int = 1, reverb: bool = False,
          snr_max: float = 20.0, probe_weight: float = 0.0,
          corpus3x: bool = False, seed: int = 0):
    import jax
    from generative_audio_tpu.train import EnhanceTrainConfig, EnhanceTrainer
    from generative_audio_tpu.utils.tracking import ExperimentTracker

    print(f"backend={jax.default_backend()}, reverb={reverb}")
    cfg = EnhanceTrainConfig()       # full-size FullSubNet+ (512/384, G=2)
    t0 = time.time()
    loader = stage_mixture_pool(pool, seed=pool_seed, reverb=reverb,
                                snr_max=snr_max, corpus3x=corpus3x)
    print(f"staged {pool} mixture batches (seed {pool_seed}, "
          f"snr -5..{snr_max:g}) in {time.time() - t0:.0f}s")
    val_ds = PairFileDataset(ROOT / "val")
    val_hard_ds = PairFileDataset(ROOT / "val_hard")

    ckpt_dir = ROOT / f"ckpt{tag}"
    tracker = ExperimentTracker(str(ARTIFACTS / "runs"),
                                f"enhance_quality{tag}")
    trainer = EnhanceTrainer(cfg, checkpoint_dir=str(ckpt_dir),
                             tracker=tracker, seed=seed)
    start_step = 0
    if trainer.restore_latest():
        start_step = int(trainer.state.step)
        print(f"resumed from step {start_step}, "
              f"best composite {trainer.best_score:.4f}")

    t0 = time.time()
    # probe is ALWAYS evaluated and recorded (probe_history / tracker);
    # it drives selection only when probe_weight > 0
    trainer.train(loader, epochs=epochs, val_dataset=val_ds,
                  validation_interval=4, log=print,
                  probe_dataset=val_hard_ds,
                  probe_weight=probe_weight)
    dt = time.time() - t0
    steps = int(trainer.state.step)
    # throughput over THIS segment only: dt covers this invocation, so
    # divide by the steps it ran, not the cumulative count after a resume
    seg_steps = steps - start_step

    # final full validation with the BEST params restored; widen the
    # trainer's validator to the full metric set (the in-loop composite
    # only needs STOI + WB_PESQ; the report also records NB_PESQ)
    from generative_audio_tpu.train.checkpoint import CheckpointManager
    best = CheckpointManager(str(ckpt_dir)).restore(
        "best", {"params": trainer.state.params})
    if best is not None:
        trainer.state = trainer.state.replace(params=best["params"])
    if getattr(trainer, "_validator", None) is None:
        trainer.validate(val_ds, max_items=1)   # build the validator cache
    trainer._validator.metric_names = ["STOI", "SI_SDR",
                                       "WB_PESQ", "NB_PESQ"]
    final = trainer.validate(val_ds, max_items=len(val_ds))
    final_hard = trainer.validate(val_hard_ds, max_items=len(val_hard_ds))
    final_reverb = None
    if (ROOT / "val_reverb" / "noisy").exists():
        rv_ds = PairFileDataset(ROOT / "val_reverb")
        final_reverb = trainer.validate(rv_ds, max_items=len(rv_ds))

    # noisy baselines on the same pairs (host metrics, incl. P.862 PESQ)
    from generative_audio_tpu.eval.metrics import (
        SI_SDR, STOI, WB_PESQ, NB_PESQ)
    from generative_audio_tpu.eval.pesq import PesqError

    def baseline(ds):
        vals = {"SI_SDR": [], "STOI": [], "WB_PESQ": [], "NB_PESQ": []}
        for i in range(len(ds)):
            noisy, clean = ds[i]
            vals["SI_SDR"].append(SI_SDR(clean, noisy))
            vals["STOI"].append(STOI(clean, noisy))
            for name, fn in (("WB_PESQ", WB_PESQ), ("NB_PESQ", NB_PESQ)):
                try:
                    vals[name].append(fn(clean, noisy))
                except PesqError:
                    pass                          # unscoreable clip
        return {k: (float(np.mean(v)) if v else None)
                for k, v in vals.items()}

    summary = {
        "epochs": epochs, "steps": steps, "seconds": dt,
        "segment_steps": seg_steps,
        "ms_per_step": 1000 * dt / max(seg_steps, 1),
        "backend": jax.default_backend(),
        "loss_first_epoch": trainer.loss_history[0],
        "loss_last_epoch": trainer.loss_history[-1],
        "best_composite": trainer.best_score,
        "val_history": trainer.val_history,
        "probe_history": trainer.probe_history,
        "final_best_model": final,
        "noisy_baseline": baseline(val_ds),
        "final_best_model_hard": final_hard,
        "noisy_baseline_hard": baseline(val_hard_ds),
        "n_noise_types": len(list((ROOT / "train" / "noise").glob("*.wav"))),
        "reverb_train": reverb,
        "snr_max": snr_max,
        "probe_weight": probe_weight,
        "corpus3x": corpus3x,
        "init_seed": seed,
    }
    if final_reverb is not None:
        summary["final_best_model_reverb"] = final_reverb
        summary["noisy_baseline_reverb"] = baseline(
            PairFileDataset(ROOT / "val_reverb"))
    ARTIFACTS.mkdir(parents=True, exist_ok=True)
    (ARTIFACTS / f"training_summary{tag}.json").write_text(
        json.dumps(summary, indent=2, default=float))
    print(json.dumps(summary, indent=2, default=float))


# ----------------------------------------------------------------- report --
def report():
    s = json.loads((ARTIFACTS / "training_summary.json").read_text())
    # noise-bank size: live corpus if present, else what the summary
    # recorded at train time (report() may run on a cleaned machine)
    noise_files = sorted((ROOT / "train" / "noise").glob("*.wav"))
    n_noise = len(noise_files) or int(s.get("n_noise_types", 12))

    def table(fin, base):
        rows = [
            "| metric | noisy input | enhanced (best ckpt) | delta |",
            "|---|---|---|---|",
            f"| SI-SDR (dB) | {base['SI_SDR']:.2f} | {fin['SI_SDR']:.2f} | "
            f"{fin['SI_SDR'] - base['SI_SDR']:+.2f} |",
            f"| STOI | {base['STOI']:.4f} | {fin['STOI']:.4f} | "
            f"{fin['STOI'] - base['STOI']:+.4f} |",
        ]
        for key, label in (("WB_PESQ", "WB-PESQ (P.862.2)"),
                           ("NB_PESQ", "NB-PESQ (P.862)")):
            if fin.get(key) is not None and base.get(key) is not None:
                rows.append(
                    f"| {label} | {base[key]:.3f} | {fin[key]:.3f} | "
                    f"{fin[key] - base[key]:+.3f} |")
        return rows

    def pesq_s(d, key="WB_PESQ"):
        # summaries written before the from-scratch P.862 landed hold null
        v = d.get(key)
        return f"{v:.3f}" if v is not None else "n/a (pre-P.862 run)"

    lines = [
        "# FullSubNet+ enhancement — on-chip quality run",
        "",
        f"Date: {time.strftime('%Y-%m-%d')}; backend: {s['backend']}; "
        f"full-size model (512/384 hidden, F=257, drop_band G=2), "
        f"bf16 compute.",
        "",
        "Training: DNS-style dynamic mixing (10 speakers of real speech, "
        "3x speed-perturbed 0.9x/1.1x to 60 clips, x "
        f"{n_noise} synthetic noise types, SNR -5..20 dB, dBFS jitter ±10); "
        "validation on fixed pairs from 2 HELD-OUT speakers at SNR "
        "{0, 5} dB. Best model selected by the reference's composite "
        "criterion (STOI + transform_pesq_range(WB-PESQ))/2 "
        "(base_trainer.py:296-303), WB-PESQ computed by the from-scratch "
        "ITU-T P.862.2 implementation (eval/pesq/). Reference loop: "
        "fullsubnet_plus/trainer/trainer.py:309-446.",
        "",
        f"{s['epochs']} epochs / {s['steps']} steps in "
        f"{s['seconds'] / 60:.1f} min ({s['ms_per_step']:.0f} ms/step, "
        f"batch 18 x 3.072 s).",
        "",
        "## Held-out speakers, training noise distribution",
        "",
        *table(s["final_best_model"], s["noisy_baseline"]),
        "",
        "## Held-out speakers, UNSEEN noise types (generalization probe)",
        "",
        *table(s["final_best_model_hard"], s["noisy_baseline_hard"]),
        "",
        "**Selection policy (stated, round 4).** Best-model selection "
        "optimizes the IN-DISTRIBUTION composite "
        "(STOI + transform_pesq_range(WB-PESQ))/2 on the val pairs, "
        "exactly as the reference does (base_trainer.py:296-303); the "
        "unseen-noise probe is reported for every arm but does not drive "
        "selection. This has a measured robustness cost: arms that win "
        "the composite can regress on the probe (the reverb arm below "
        "trades ~2.5 dB probe SI-SDR against the wide arm). Every "
        "headline table in this report carries the probe columns so "
        "that trade is visible, and the combined/near-clean arms below "
        "are the round-4 attempts to buy both.",
        "",
        "Composite-score trajectory (step, score): "
        + ", ".join(f"({int(st)}, {sc:.4f})" for st, sc in s["val_history"]),
        "",
        f"cIRM-MSE train loss: {s['loss_first_epoch']:.5f} (epoch 1) -> "
        f"{s['loss_last_epoch']:.5f} (epoch {s['epochs']}).",
        "",
    ]
    ft_path = ARTIFACTS / "training_summary_ft.json"
    if ft_path.exists():
        ft = json.loads(ft_path.read_text())
        verdict = ("fine-tuning improved the best composite to "
                   f"{ft['best_composite']:.4f}" if ft["improved_over_base"]
                   else "no fine-tune validation beat the base best — "
                   "best-model selection kept the base checkpoint")
        lines += [
            "",
            "## Fine-tune stage (Trainer_Finetune semantics)",
            "",
            f"Preloaded the base run's best params (`finetune` stage, "
            f"lr {ft['lr']:g}, {ft['epochs']} epochs; reference "
            "`_preload_model` strict=False fine-tune path, "
            f"base_trainer.py:112-127): {verdict}. Final best-model "
            "held-out metrics: SI-SDR "
            f"{ft['final_best_model']['SI_SDR']:.2f} dB / STOI "
            f"{ft['final_best_model']['STOI']:.4f} / WB-PESQ "
            f"{pesq_s(ft['final_best_model'])} "
            "(train-noise types), "
            f"SI-SDR {ft['final_best_model_hard']['SI_SDR']:.2f} dB / "
            f"STOI {ft['final_best_model_hard']['STOI']:.4f} / WB-PESQ "
            f"{pesq_s(ft['final_best_model_hard'])}"
            " (unseen noise).",
        ]
    lines += [
        "",
        "## Run history (findings that shaped this configuration)",
        "",
        "Note: the ablations below (including the speed-perturbation "
        "sections) predate the from-scratch P.862 implementation — their "
        "best-model selection ran on a STOI-only composite (recorded as "
        "such at the time), and their historical numbers are kept for the "
        "data-scale findings they document. The headline tables, "
        "fine-tune stage, and reverb A/B above/below use the reference's "
        "true (STOI + transform_pesq_range(WB-PESQ))/2 criterion.",
        "",
        "1. **6-type noise bank generalization failure** (2026-08-17, "
        "`training_summary_div.json` holds the A/B). The first run trained "
        "on 6 dense wideband noise types: in-distribution SI-SDR +6.20 dB "
        "but UNSEEN-noise SI-SDR only +0.31 dB with STOI regressing "
        "-0.083 — the model over-suppressed mild unseen degradations. "
        "Retraining with 6 additional families (rumble, bursts, steady "
        "tones, 2-4 kHz band, slow-AM, 60 Hz hum — the `augment` stage; "
        "probe types brown/clicks/chirp stay unseen) moved unseen-noise "
        "SI-SDR to +6.58 dB and shrank the STOI regression to -0.028, at "
        "~0.4 dB in-distribution cost: noise-manifold coverage, not model "
        "capacity, was the bottleneck. The 12-type bank is now the "
        "standard corpus (the tables above are a 12-type run).",
        "",
        "2. **Validation plateau at this data scale** "
        "(`runs/runs/enhance_quality_2/scalars.jsonl`). Resuming a "
        "4000-step run to 8200 steps kept lowering train loss "
        "(0.0757 -> 0.0743) but every validation composite from step "
        "4800-8000 stayed below the earlier best, so best-model selection "
        "correctly froze the earlier checkpoint (reference "
        "`_is_best_epoch` semantics, fullsubnet_plus/trainer/"
        "base_trainer.py): the model is validation-plateaued at this "
        "data scale and fixed lr, not under-trained.",
    ]
    sp_path = ARTIFACTS / "training_summary_sp.json"
    if sp_path.exists():
        sp = json.loads(sp_path.read_text())
        lines += [
            "",
            "## Speed-perturbed 3x corpus rerun (the data-scale lever)",
            "",
            "Applying the Kaldi 0.9x/1.1x speed-perturbation recipe to the "
            "train speech (the `perturb` stage; 20 -> 60 clips) and "
            f"retraining from scratch for {sp['epochs']} epochs / "
            f"{sp['steps']} steps broke the plateau recorded above: ",
            "",
            *table(sp["final_best_model"], sp["noisy_baseline"]),
            "",
            "Unseen-noise probe: SI-SDR "
            f"{sp['final_best_model_hard']['SI_SDR']:.2f} dB / STOI "
            f"{sp['final_best_model_hard']['STOI']:.4f} (vs noisy "
            f"{sp['noisy_baseline_hard']['SI_SDR']:.2f} dB / "
            f"{sp['noisy_baseline_hard']['STOI']:.4f}) — the extra "
            "in-distribution capacity costs ~0.9 dB on the unseen-noise "
            "SI-SDR relative to the 1x-corpus fine-tune, the same "
            "specialization trade the noise-bank A/B documented.",
        ]
        spft_path = ARTIFACTS / "training_summary_sp_ft.json"
        if spft_path.exists():
            ft2 = json.loads(spft_path.read_text())
            verdict2 = (
                f"improved the composite to {ft2['best_composite']:.4f}"
                if ft2["improved_over_base"] else
                "did not beat the carried-over base best (best-model "
                "selection kept the base checkpoint, composite "
                f"{ft2['best_composite']:.4f})")
            lines += [
                "",
                f"Fine-tuning the 3x-corpus best at lr {ft2['lr']:g} "
                f"{verdict2} "
                "(SI-SDR "
                f"{ft2['final_best_model']['SI_SDR']:.2f} dB / STOI "
                f"{ft2['final_best_model']['STOI']:.4f}; unseen-noise "
                f"SI-SDR {ft2['final_best_model_hard']['SI_SDR']:.2f} dB "
                f"/ STOI {ft2['final_best_model_hard']['STOI']:.4f}) — "
                "the best recorded numbers for this line.",
            ]
    w5_path = ARTIFACTS / "training_summary_w5.json"
    if w5_path.exists():
        w5 = json.loads(w5_path.read_text())
        lines += [
            "",
            "## Wide (5x) speed-perturbation A/B — a robustness/score trade",
            "",
            "Adding 0.8x/1.25x factors (`perturb --wide`; 20 -> 100 clips) "
            f"and training {w5['steps']} steps (the last 6000 on a fresh "
            "mixture pool, `--pool_seed`):",
            "",
            *table(w5["final_best_model"], w5["noisy_baseline"]),
            "",
            "Unseen-noise probe: SI-SDR "
            f"{w5['final_best_model_hard']['SI_SDR']:.2f} dB / STOI "
            f"{w5['final_best_model_hard']['STOI']:.4f} — the wide corpus "
            "trades ~0.008 in-distribution composite against the 3x recipe "
            "for the best unseen-noise robustness of any run in this line "
            "(STOI 0.784 vs 0.765, SI-SDR 7.44 vs 7.18 dB). A lr-2e-5 "
            "fine-tune on the same corpus plateaued below the base best "
            "(`training_summary_w5_ft.json`), so best-model selection kept "
            "the base checkpoint.",
        ]
        w5c_path = ARTIFACTS / "training_summary_w5c_ft.json"
        if w5c_path.exists():
            w5c = json.loads(w5c_path.read_text())
            verdict3 = (
                f"lifted the composite to {w5c['best_composite']:.4f}"
                if w5c["improved_over_base"] else
                "did not beat the carried-over wide-corpus best "
                f"(composite stayed {w5c['best_composite']:.4f})")
            lines += [
                "",
                "Curriculum probe — fine-tuning the wide-corpus best on the "
                f"3x subset at lr {w5c['lr']:g} {verdict3} "
                f"(SI-SDR {w5c['final_best_model']['SI_SDR']:.2f} dB / "
                f"STOI {w5c['final_best_model']['STOI']:.4f}; unseen-noise "
                f"SI-SDR {w5c['final_best_model_hard']['SI_SDR']:.2f} dB / "
                f"STOI {w5c['final_best_model_hard']['STOI']:.4f}).",
            ]
    rv_path = ARTIFACTS / "training_summary_rv.json"
    if rv_path.exists() and "final_best_model_reverb" in s:
        rv = json.loads(rv_path.read_text())
        dry_r, rv_r = s["final_best_model_reverb"], \
            rv["final_best_model_reverb"]
        lines += [
            "",
            "## Reverb A/B — synthetic image-source RIR bank "
            "(data/rir.py)",
            "",
            "The reference's DNS training convolves clean speech with "
            "measured RIRs at `reverb_proportion` (dataset_train.py:"
            "129-182). No RIR corpus exists in-image, so the bank is "
            "synthesized (Allen-Berkley image-source, 40 random rooms, "
            "RT60 0.15-0.6 s) and training A/B'd at reverb_proportion "
            "0.5 (`train --reverb`). Scored on dry pairs (val) and "
            "reverberant pairs (val_reverb: noisy = reverb(clean)+noise, "
            "reference = reverb(clean) — the denoise-under-reverb task, "
            "matching snr_mix target semantics).",
            "",
            "| model | dry SI-SDR | dry STOI | reverb SI-SDR | reverb "
            "STOI | reverb WB-PESQ | hard SI-SDR | hard STOI |",
            "|---|---|---|---|---|---|---|---|",
            f"| dry-trained | {s['final_best_model']['SI_SDR']:.2f} | "
            f"{s['final_best_model']['STOI']:.4f} | "
            f"{dry_r['SI_SDR']:.2f} | {dry_r['STOI']:.4f} | "
            f"{pesq_s(dry_r)} | "
            f"{s['final_best_model_hard']['SI_SDR']:.2f} | "
            f"{s['final_best_model_hard']['STOI']:.4f} |",
            f"| reverb-trained | {rv['final_best_model']['SI_SDR']:.2f} "
            f"| {rv['final_best_model']['STOI']:.4f} | "
            f"{rv_r['SI_SDR']:.2f} | {rv_r['STOI']:.4f} | "
            f"{pesq_s(rv_r)} | "
            f"{rv['final_best_model_hard']['SI_SDR']:.2f} | "
            f"{rv['final_best_model_hard']['STOI']:.4f} |",
            "",
            "Noisy-input reverb baseline: SI-SDR "
            f"{s['noisy_baseline_reverb']['SI_SDR']:.2f} dB / STOI "
            f"{s['noisy_baseline_reverb']['STOI']:.4f}. 'hard' columns = "
            "the unseen-noise probe (held-out speakers x brown/clicks/"
            "chirp), noisy baseline SI-SDR "
            f"{s['noisy_baseline_hard']['SI_SDR']:.2f} dB / STOI "
            f"{s['noisy_baseline_hard']['STOI']:.4f}: the reverb arm's "
            "dry/reverb win costs unseen-noise robustness (SI-SDR "
            f"{rv['final_best_model_hard']['SI_SDR']:.2f} vs the wide "
            "arm's 7.44 dB) — see the selection-policy note above.",
        ]
        if rv.get("best_composite", 0) > s.get("best_composite", 0):
            lines += [
                "",
                "The reverb-trained arm wins on EVERY axis, including the "
                "dry validation it was not specialized for: dry composite "
                f"{rv['best_composite']:.4f} vs {s['best_composite']:.4f} "
                "— the best recorded in this line — with reverb-pair "
                f"SI-SDR +{rv['final_best_model_reverb']['SI_SDR'] - dry_r['SI_SDR']:.2f} dB "
                "over the dry-trained model. Reverb augmentation acts as "
                "another data-scale lever on this corpus (same mechanism "
                "as the speed-perturbation findings above).",
            ]
        rvft_path = ARTIFACTS / "training_summary_rv_ft.json"
        if rvft_path.exists():
            rvft = json.loads(rvft_path.read_text())
            verdict_rv = (
                f"improved the best composite to {rvft['best_composite']:.4f}"
                if rvft["improved_over_base"] else
                "plateaued below the carried-over base best (composite "
                f"stayed {rvft['best_composite']:.4f})")
            rv_ft_reverb = rvft.get("final_best_model_reverb") or {}
            reverb_clause = (
                f"; reverb-pair SI-SDR "
                f"{rv_ft_reverb['SI_SDR']:.2f} dB / STOI "
                f"{rv_ft_reverb['STOI']:.4f}" if rv_ft_reverb else "")
            lines += [
                "",
                "Fine-tuning the reverb-trained best at lr "
                f"{rvft['lr']:g} (reverb mixing kept on) {verdict_rv} "
                f"(SI-SDR {rvft['final_best_model']['SI_SDR']:.2f} dB / "
                f"STOI {rvft['final_best_model']['STOI']:.4f}"
                f"{reverb_clause}).",
            ]
    cb_path = ARTIFACTS / "training_summary_cb.json"
    if cb_path.exists():
        cb = json.loads(cb_path.read_text())
        cbf, cbh = cb["final_best_model"], cb["final_best_model_hard"]
        cbr = cb.get("final_best_model_reverb")
        lines += [
            "",
            "## Combined arm — reverb x wide-5x corpus x 12-type bank "
            "(round 4)",
            "",
            "The two independently-winning data levers (reverb "
            "augmentation, wide 0.8-1.25x speed perturbation) composed "
            "into one arm: 100-clip corpus, 12-type bank, RIR mixing at "
            f"proportion 0.5, {cb['steps']} steps.",
            "",
            "| metric | noisy | combined arm | reverb arm (r3 best) |",
            "|---|---|---|---|",
            f"| composite (val) | — | {cb['best_composite']:.4f} | "
            "0.7446 |",
            f"| SI-SDR (val) | {cb['noisy_baseline']['SI_SDR']:.2f} | "
            f"{cbf['SI_SDR']:.2f} | 8.70 |",
            f"| STOI (val) | {cb['noisy_baseline']['STOI']:.4f} | "
            f"{cbf['STOI']:.4f} | 0.6451 |",
            f"| WB-PESQ (val) | {pesq_s(cb['noisy_baseline'])} | "
            f"{pesq_s(cbf)} | 3.720 |",
            f"| hard SI-SDR | {cb['noisy_baseline_hard']['SI_SDR']:.2f} "
            f"| {cbh['SI_SDR']:.2f} | 4.99 |",
            f"| hard STOI | {cb['noisy_baseline_hard']['STOI']:.4f} | "
            f"{cbh['STOI']:.4f} | 0.7607 |",
        ]
        if cbr is not None:
            lines += [
                f"| reverb SI-SDR | "
                f"{cb['noisy_baseline_reverb']['SI_SDR']:.2f} | "
                f"{cbr['SI_SDR']:.2f} | 12.27 |",
                f"| reverb STOI | "
                f"{cb['noisy_baseline_reverb']['STOI']:.4f} | "
                f"{cbr['STOI']:.4f} | 0.5069 |",
            ]
        lines += ["", cb.get("report_verdict", "")]
        nc_path = ARTIFACTS / "training_summary_cbnc.json"
        if nc_path.exists():
            nc = json.loads(nc_path.read_text())
            ncf, nch = nc["final_best_model"], nc["final_best_model_hard"]
            lines += [
                "",
                "### Near-clean mitigation A/B (SNR up to "
                f"{int(nc.get('snr_max', 40))} dB in the mix)",
                "",
                "Extending the training SNR range so the model sees "
                "near-clean pairs and can learn passthrough "
                "(VERDICT r3 item 3 mitigation):",
                "",
                "| arm | composite | val SI-SDR | val STOI | hard SI-SDR "
                "| hard STOI |",
                "|---|---|---|---|---|---|",
                f"| combined (SNR -5..20) | {cb['best_composite']:.4f} | "
                f"{cbf['SI_SDR']:.2f} | {cbf['STOI']:.4f} | "
                f"{cbh['SI_SDR']:.2f} | {cbh['STOI']:.4f} |",
                f"| + near-clean (SNR -5..{int(nc.get('snr_max', 40))}) "
                f"| {nc['best_composite']:.4f} | "
                f"{ncf['SI_SDR']:.2f} | {ncf['STOI']:.4f} | "
                f"{nch['SI_SDR']:.2f} | {nch['STOI']:.4f} |",
            ]
            mid = nc.get("mid_run_best_step4800")
            if mid:
                mf, mh = (mid["final_best_model"],
                          mid["final_best_model_hard"])
                lines += [
                    f"| + near-clean, mid-run best (step 4800) "
                    f"| {mf['composite']:.4f} | "
                    f"{mf['SI_SDR']:.2f} | {mf['STOI']:.4f} | "
                    f"{mh['SI_SDR']:.2f} | {mh['STOI']:.4f} |",
                ]
            lines += [
                "",
                nc.get("report_verdict", ""),
            ]
        pw_path = ARTIFACTS / "training_summary_cbpw.json"
        if pw_path.exists():
            pw = json.loads(pw_path.read_text())
            pwf, pwh = pw["final_best_model"], pw["final_best_model_hard"]
            w = pw.get("probe_weight", 0.3)
            lines += [
                "",
                "### Probe-inclusive selection demo "
                f"(`--probe_weight {w:g}`, round 4)",
                "",
                "The selection-policy lever the near-clean A/B motivated, "
                "run for real: same combined-arm training, best model "
                f"selected on (1-{w:g})*val + {w:g}*probe composite "
                "(`EnhanceTrainer.train(probe_dataset=..., "
                "probe_weight=...)`). CAVEAT: for THIS arm the "
                "unseen-noise probe is part of the selection criterion, "
                "so its 'hard' columns measure the policy's effect, not "
                "blind generalization.",
                "",
                "| arm | selection | val composite | val SI-SDR | "
                "val STOI | hard SI-SDR | hard STOI |",
                "|---|---|---|---|---|---|---|",
                f"| combined (w=0) | in-distribution | "
                f"{cb['best_composite']:.4f} | {cbf['SI_SDR']:.2f} | "
                f"{cbf['STOI']:.4f} | {cbh['SI_SDR']:.2f} | "
                f"{cbh['STOI']:.4f} |",
                f"| combined (w={w:g}) | blended {pw['best_composite']:.4f}"
                f" | {pwf.get('composite', float('nan')):.4f} | "
                f"{pwf['SI_SDR']:.2f} | {pwf['STOI']:.4f} | "
                f"{pwh['SI_SDR']:.2f} | {pwh['STOI']:.4f} |",
            ]
            ncpw_path = ARTIFACTS / "training_summary_cbncpw.json"
            if ncpw_path.exists():
                np_ = json.loads(ncpw_path.read_text())
                npf = np_["final_best_model"]
                nph = np_["final_best_model_hard"]
                lines += [
                    f"| + near-clean (w="
                    f"{np_.get('probe_weight', 0.3):g}, SNR "
                    f"-5..{int(np_.get('snr_max', 40))}) | blended "
                    f"{np_['best_composite']:.4f} | "
                    f"{npf.get('composite', float('nan')):.4f} | "
                    f"{npf['SI_SDR']:.2f} | {npf['STOI']:.4f} | "
                    f"{nph['SI_SDR']:.2f} | {nph['STOI']:.4f} |",
                ]
            lines += [
                "",
                pw.get("report_verdict", ""),
            ]
            if ncpw_path.exists():
                lines += ["", np_.get("report_verdict", "")]
    lb_md = ARTIFACTS / "line_best_r5_section.md"
    if lb_md.exists():
        lines += ["", lb_md.read_text().rstrip()]
    for sweep_md in sorted(ARTIFACTS.glob("selection_sweep_section*.md")):
        lines += ["", sweep_md.read_text().rstrip()]
    audit_md = ARTIFACTS / "pesq_family_audit.md"
    if audit_md.exists():
        lines += ["", audit_md.read_text().rstrip()]
    (ARTIFACTS / "REPORT.md").write_text("\n".join(lines) + "\n")
    print((ARTIFACTS / "REPORT.md").read_text())


def finetune(epochs: int, lr: float = 2e-5, base_tag: str = "",
             tag: str = "_ft", reverb: bool = False):
    """Fine-tune stage: preload the base run's BEST params at a lower lr
    (reference Trainer_Finetune + _preload_model strict=False semantics,
    base_trainer.py:112-127) — the legitimate lever against the fixed-lr
    validation plateau recorded in the run history. Carries the base run's
    best composite over, so 'best' still means best overall."""
    import jax
    from generative_audio_tpu.train import EnhanceTrainConfig, EnhanceTrainer
    from generative_audio_tpu.train.checkpoint import CheckpointManager
    from generative_audio_tpu.utils.tracking import ExperimentTracker

    print(f"backend={jax.default_backend()}, finetune lr={lr}")
    cfg = EnhanceTrainConfig(learning_rate=lr)
    loader = stage_mixture_pool(200, seed=11, reverb=reverb)
    val_ds = PairFileDataset(ROOT / "val")
    val_hard_ds = PairFileDataset(ROOT / "val_hard")

    ckpt_dir = ROOT / f"ckpt{tag}"
    tracker = ExperimentTracker(str(ARTIFACTS / "runs"),
                                f"enhance_quality{tag}")
    trainer = EnhanceTrainer(cfg, checkpoint_dir=str(ckpt_dir),
                             tracker=tracker)
    if trainer.restore_latest():
        print(f"resumed finetune from step {int(trainer.state.step)}")
    else:
        base_mgr = CheckpointManager(str(ROOT / f"ckpt{base_tag}"))
        base = base_mgr.restore("best", {"params": trainer.state.params},
                                partial=True)
        assert base is not None, "run the base train stage first"
        trainer.state = trainer.state.replace(params=base["params"])
        base_best = base_mgr.best_score()
        if base_best is not None:
            trainer.best_score = float(base_best)
        print(f"preloaded base best params "
              f"(composite {trainer.best_score:.4f})")

    t0 = time.time()
    trainer.train(loader, epochs=epochs, val_dataset=val_ds,
                  validation_interval=4, log=print)
    dt = time.time() - t0

    best = CheckpointManager(str(ckpt_dir)).restore(
        "best", {"params": trainer.state.params}, partial=True)
    improved = best is not None
    if not improved:   # nothing beat the carried-over base best: report IT
        best = CheckpointManager(str(ROOT / f"ckpt{base_tag}")).restore(
            "best", {"params": trainer.state.params}, partial=True)
    trainer.state = trainer.state.replace(params=best["params"])
    if getattr(trainer, "_validator", None) is None:
        trainer.validate(val_ds, max_items=1)
    trainer._validator.metric_names = ["STOI", "SI_SDR",
                                       "WB_PESQ", "NB_PESQ"]
    final = trainer.validate(val_ds, max_items=len(val_ds))
    final_hard = trainer.validate(val_hard_ds, max_items=len(val_hard_ds))
    final_reverb = None
    if (ROOT / "val_reverb" / "noisy").exists():
        rv_ds = PairFileDataset(ROOT / "val_reverb")
        final_reverb = trainer.validate(rv_ds, max_items=len(rv_ds))
    summary = {
        "epochs": epochs, "lr": lr, "seconds": dt,
        "reverb_train": reverb,
        "improved_over_base": improved and
        trainer.best_score > (CheckpointManager(
            str(ROOT / f"ckpt{base_tag}")).best_score() or -1e9),
        "best_composite": trainer.best_score,
        "final_best_model": final, "final_best_model_hard": final_hard,
        "val_history": trainer.val_history,
    }
    if final_reverb is not None:
        summary["final_best_model_reverb"] = final_reverb
    (ARTIFACTS / f"training_summary{tag}.json").write_text(
        json.dumps(summary, indent=2, default=float))
    print(json.dumps(summary, indent=2, default=float))


# ------------------------------------------------------------------ sweep --
def _tag_validation_rows(tag: str):
    """(step -> (composite, probe_composite)) from the tagged run's tracker
    scalars (every resume segment merged; later rows win)."""
    rows = {}
    base = ARTIFACTS / "runs" / "runs"
    run_dirs = sorted(base.glob(f"enhance_quality{tag}")) + \
        sorted(base.glob(f"enhance_quality{tag}_*"))
    for rd in run_dirs:
        scal = rd / "scalars.jsonl"
        if not scal.exists():
            continue
        for line in scal.read_text().splitlines():
            d = json.loads(line)
            if "composite" in d and "probe_composite" in d:
                rows[int(d["_step"])] = (float(d["composite"]),
                                         float(d["probe_composite"]))
    return dict(sorted(rows.items()))


def sweep(tag: str, weights=(0.0, 0.1, 0.3, 0.5), dense: bool = False):
    """Post-hoc probe-weight selection sweep over ONE trajectory's step
    checkpoints (round-5, VERDICT r4 item 1).

    In-loop probe-inclusive selection (round 4) compared arms across
    trajectories, confounding the policy with training noise. Here the
    policy is isolated: the tagged run's step checkpoints are fixed, and
    for each probe_weight w the selected checkpoint is
    argmax (1-w)*val_composite + w*probe_composite over validation points
    (or over EVERY step checkpoint with --dense). Each selected checkpoint
    is then scored on val, the selection probe (val_hard), and the
    SELECTION-BLIND probe2 (`probe2` stage) — probe2 gives the unbiased
    generalization estimate the round-4 report could not.
    """
    import jax
    from generative_audio_tpu.train import EnhanceTrainConfig, EnhanceTrainer
    from generative_audio_tpu.train.checkpoint import CheckpointManager

    ckpt_dir = ROOT / f"ckpt{tag}"
    mgr = CheckpointManager(str(ckpt_dir))
    steps_avail = sorted(int(p.name.split("_")[1])
                         for p in ckpt_dir.glob("step_*"))
    assert steps_avail, f"no step checkpoints under {ckpt_dir}"
    print(f"backend={jax.default_backend()}; {len(steps_avail)} step "
          f"checkpoints under ckpt{tag}")

    cache_path = ARTIFACTS / f"sweep_cache{tag}.json"
    cache = (json.loads(cache_path.read_text())
             if cache_path.exists() else {})

    datasets = {"val": PairFileDataset(ROOT / "val"),
                "hard": PairFileDataset(ROOT / "val_hard")}
    if (ROOT / "val_probe2" / "noisy").exists():
        datasets["probe2"] = PairFileDataset(ROOT / "val_probe2")
    if (ROOT / "val_reverb" / "noisy").exists():
        datasets["reverb"] = PairFileDataset(ROOT / "val_reverb")

    trainer = EnhanceTrainer(EnhanceTrainConfig())
    template = {"params": trainer.state.params}

    def score(step: int, ds_names, metrics):
        """Validate checkpoint `step` on the named datasets (cached)."""
        key = str(step)
        entry = cache.setdefault(key, {})
        todo = [n for n in ds_names
                if n not in entry
                or any(m not in entry[n] for m in metrics)]
        if not todo:
            return entry
        restored = mgr.restore(f"step_{step:08d}", template, partial=True)
        assert restored is not None, step
        trainer.state = trainer.state.replace(params=restored["params"])
        if getattr(trainer, "_validator", None) is None:
            trainer.validate(datasets["val"], max_items=1)
        trainer._validator.metric_names = list(metrics)
        for name in todo:
            ds = datasets[name]
            means = trainer.validate(ds, max_items=len(ds))
            entry[name] = {**entry.get(name, {}), **means}
            print(f"  step {step} {name}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in means.items()
                if isinstance(v, float)))
        cache_path.write_text(json.dumps(cache, indent=1, default=float))
        return entry

    # 1. the selection curve: recorded validation points, or every step
    #    checkpoint when dense
    curve = {}
    if dense:
        for step in steps_avail:
            e = score(step, ("val", "hard"), ("STOI", "WB_PESQ", "SI_SDR"))
            curve[step] = (e["val"]["composite"], e["hard"]["composite"])
    else:
        curve = _tag_validation_rows(tag)
        curve = {s: cp for s, cp in curve.items() if s in set(steps_avail)}
    assert curve, "no validation points with probe_composite recorded"
    print(f"selection curve over {len(curve)} points")

    # 2. select per weight, final-score selected checkpoints fully
    full = ("STOI", "SI_SDR", "WB_PESQ", "NB_PESQ")
    selections = {}
    for w in weights:
        sel = max(curve, key=lambda s: (1 - w) * curve[s][0]
                  + w * curve[s][1])
        entry = score(sel, tuple(datasets), full)
        selections[f"{w:g}"] = {
            "selected_step": sel,
            "selection_value": (1 - w) * curve[sel][0] + w * curve[sel][1],
            "val_composite_at_selection": curve[sel][0],
            "probe_composite_at_selection": curve[sel][1],
            "final": {n: entry[n] for n in datasets},
        }
        print(f"w={w:g}: step {sel} "
              f"(val {curve[sel][0]:.4f}, probe {curve[sel][1]:.4f})")

    # noisy baselines for the probe sets (host metrics)
    from generative_audio_tpu.eval.metrics import SI_SDR, STOI, WB_PESQ
    from generative_audio_tpu.eval.pesq import PesqError

    def baseline(ds):
        vals = {"SI_SDR": [], "STOI": [], "WB_PESQ": []}
        for i in range(len(ds)):
            noisy, clean = ds[i]
            vals["SI_SDR"].append(SI_SDR(clean, noisy))
            vals["STOI"].append(STOI(clean, noisy))
            try:
                vals["WB_PESQ"].append(WB_PESQ(clean, noisy))
            except PesqError:
                pass
        return {k: (float(np.mean(v)) if v else None)
                for k, v in vals.items()}

    baselines = {n: baseline(ds) for n, ds in datasets.items()}

    out = {
        "tag": tag, "dense": dense,
        "weights": list(weights),
        "curve": {str(s): list(cp) for s, cp in sorted(curve.items())},
        "selections": selections,
        "noisy_baselines": baselines,
        "n_checkpoints": len(steps_avail),
    }
    (ARTIFACTS / f"selection_sweep{tag}.json").write_text(
        json.dumps(out, indent=2, default=float))
    _render_sweep_section(out)
    print(json.dumps({w: {"step": v["selected_step"],
                          "probe2_SI_SDR":
                          v["final"].get("probe2", {}).get("SI_SDR")}
                      for w, v in selections.items()}, default=float))


def _render_sweep_section(out):
    """Standing REPORT section for the post-hoc selection sweep (the
    pesq_family_audit.md pattern: a standalone artifact report() appends,
    so a re-render never drops it)."""
    tag = out["tag"]
    sel = out["selections"]
    has_p2 = any("probe2" in v["final"] for v in sel.values())
    lines = [
        f"## Post-hoc probe-weight selection sweep (round 5, arm `{tag}`)",
        "",
        f"One trajectory ({out['n_checkpoints']} step checkpoints, "
        "selection curve "
        + ("re-scored densely over every checkpoint" if out["dense"]
           else "from the recorded validation points")
        + "); for each probe weight w the checkpoint maximizing "
        "(1-w)*val + w*probe composite is selected POST HOC, isolating "
        "the selection policy from training noise (the round-4 in-loop "
        "arms compared across trajectories). `probe` = val_hard "
        "(brown/clicks/chirp — IN the criterion for w>0); `probe2` = the "
        "selection-BLIND set (mod_babble/impulse_train/sweep_band, "
        "`probe2` stage) scored only on final checkpoints — the unbiased "
        "generalization estimate round 4 lacked.",
        "",
        "| w | step | val composite | val SI-SDR | val STOI | "
        "hard SI-SDR | hard STOI | probe2 SI-SDR | probe2 STOI | "
        "probe2 WB-PESQ |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for w, v in sel.items():
        f_ = v["final"]
        p2 = f_.get("probe2", {})
        lines.append(
            f"| {w} | {v['selected_step']} | "
            f"{f_['val']['composite']:.4f} | {f_['val']['SI_SDR']:.2f} | "
            f"{f_['val']['STOI']:.4f} | {f_['hard']['SI_SDR']:.2f} | "
            f"{f_['hard']['STOI']:.4f} | "
            + (f"{p2['SI_SDR']:.2f} | {p2['STOI']:.4f} | "
               f"{p2['WB_PESQ']:.3f} |" if p2 else "n/a | n/a | n/a |"))
    if has_p2 and "probe2" in out["noisy_baselines"]:
        b = out["noisy_baselines"]["probe2"]
        lines += [
            "",
            f"Noisy-input probe2 baseline: SI-SDR {b['SI_SDR']:.2f} dB / "
            f"STOI {b['STOI']:.4f} / WB-PESQ "
            + (f"{b['WB_PESQ']:.3f}." if b.get("WB_PESQ") else "n/a."),
        ]
    # data-driven verdict
    base = sel.get("0") or next(iter(sel.values()))
    same_w = [w for w, v in sel.items()
              if v["selected_step"] == base["selected_step"]]
    diff = [(w, v) for w, v in sel.items()
            if v["selected_step"] != base["selected_step"]]
    verdict = [
        "",
        f"**Verdict.** Weights {{{', '.join(same_w)}}} all select step "
        f"{base['selected_step']} — on a fixed trajectory the blended "
        "criterion only changes the pick once the probe term can outvote "
        "the val composite.",
    ]
    for w, v in diff:
        f0, f1 = base["final"], v["final"]
        verdict.append(
            f"w={w} moves the pick to step {v['selected_step']}: "
            f"IN-CRITERION probe composite "
            f"{f0['hard']['composite']:.4f} -> "
            f"{f1['hard']['composite']:.4f} "
            f"(hard SI-SDR {f0['hard']['SI_SDR']:.2f} -> "
            f"{f1['hard']['SI_SDR']:.2f} dB) at val composite "
            f"{f0['val']['composite']:.4f} -> "
            f"{f1['val']['composite']:.4f}; on the SELECTION-BLIND "
            "probe2 the same swap changes composite "
            + (f"{f0['probe2']['composite']:.4f} -> "
               f"{f1['probe2']['composite']:.4f} and SI-SDR "
               f"{f0['probe2']['SI_SDR']:.2f} -> "
               f"{f1['probe2']['SI_SDR']:.2f} dB"
               if "probe2" in f0 and "probe2" in f1 else "n/a")
            + " — the blind probe decides whether the in-criterion "
            "'robustness win' is generalization or selection readback.")
    if out["dense"]:
        curve_best = max(out["curve"].items(), key=lambda kv: kv[1][0])
        verdict += [
            "",
            f"Dense scoring also tightens plain w=0 selection: the "
            f"val-composite maximum over ALL step checkpoints is "
            f"{curve_best[1][0]:.4f} at step {curve_best[0]} (200-step "
            "granularity), vs the in-loop 800-step validation stride's "
            "best — checkpoint-selection granularity is itself a lever, "
            "though the max over ~50 noisy 8-pair evaluations carries "
            "winner's-curse bias of roughly the curve's local scatter; "
            "the hard/probe2 columns above are the unbiased read on the "
            "selected checkpoint.",
        ]
    lines += verdict
    curve = {int(s): v for s, v in out["curve"].items()}
    steps = sorted(curve)
    lines += [
        "",
        "Selection curve (step: val/probe composite): "
        + ", ".join(f"{s}: {curve[s][0]:.4f}/{curve[s][1]:.4f}"
                    for s in steps),
    ]
    (ARTIFACTS / f"selection_sweep_section{tag}.md").write_text(
        "\n".join(lines) + "\n")


def line_best_section():
    """Round-5 same-metric line-best A/B (VERDICT r4 weak item 2): the
    combined arm's r4 'line best' (0.7522) vs the reverb arm spanned a PESQ
    recalibration of ~the win's size. Settle it with every number under the
    recalibrated metric: the r4 combined arm (`_cb`, scored post-fix), the
    second combined trajectory (`_cbpw`, post-hoc w=0 selection from the
    round-5 sweep), and the reverb-only 3x arm retrained this round
    (`_rv5`). Writes the standing section report() appends."""
    cb = json.loads((ARTIFACTS / "training_summary_cb.json").read_text())
    rv5 = json.loads((ARTIFACTS / "training_summary_rv5.json").read_text())
    sweep_p = ARTIFACTS / "selection_sweep_cbpw.json"
    rows = [
        "## Same-metric line-best A/B (round 5)",
        "",
        "All composites below are under the recalibrated (round-4) PESQ. "
        "`_cb` and `_cbpw` share one config (reverb x wide-5x corpus, "
        "SNR -5..20) across two independent trajectories; `_rv5` is the "
        "reverb-only arm (3x corpus) retrained this round.",
        "",
        "| arm | config | selection | best val composite | hard SI-SDR | "
        "hard STOI |",
        "|---|---|---|---|---|---|",
        f"| _cb (r4) | combined | in-loop w=0 | "
        f"{cb['best_composite']:.4f} | "
        f"{cb['final_best_model_hard']['SI_SDR']:.2f} | "
        f"{cb['final_best_model_hard']['STOI']:.4f} |",
    ]
    cbpw0 = None
    if sweep_p.exists():
        sw = json.loads(sweep_p.read_text())
        cbpw0 = sw["selections"].get("0")
        if cbpw0:
            f_ = cbpw0["final"]
            rows.append(
                f"| _cbpw (r4, 2nd trajectory) | combined | post-hoc w=0 | "
                f"{f_['val']['composite']:.4f} | "
                f"{f_['hard']['SI_SDR']:.2f} | {f_['hard']['STOI']:.4f} |")
    rows.append(
        f"| _rv5 (r5) | reverb-only 3x | in-loop w=0 | "
        f"{rv5['best_composite']:.4f} | "
        f"{rv5['final_best_model_hard']['SI_SDR']:.2f} | "
        f"{rv5['final_best_model_hard']['STOI']:.4f} |")
    verdict = [
        "",
        f"Verdict: the reverb-only arm retrained under the same metric "
        f"scores {rv5['best_composite']:.4f} vs the combined arm's "
        f"{cb['best_composite']:.4f} — the r4 'line best' win "
        f"({cb['best_composite']:.4f} vs the reverb arm's pre-fix 0.7446) "
        "does not survive same-metric scoring: it was the PESQ "
        "recalibration, as the round-4 report's own caveat suspected.",
    ]
    if cbpw0:
        # like-for-like trajectory spread: restrict the second trajectory
        # to the SAME in-loop selection regime (800-step validation
        # stride) before comparing against _cb's in-loop best
        sw = json.loads(sweep_p.read_text())
        inloop = [v[0] for s, v in sw["curve"].items()
                  if int(s) % 800 == 0]
        cbpw_inloop = max(inloop) if inloop else None
        if cbpw_inloop is not None:
            spread = abs(cb["best_composite"] - cbpw_inloop)
            verdict += [
                f"Two trajectories of the SAME combined config, under the "
                f"same in-loop selection regime, differ by {spread:.4f} "
                f"composite (_cb {cb['best_composite']:.4f} vs _cbpw "
                f"{cbpw_inloop:.4f}) — larger than every between-config "
                "difference in this table. The data-lever composes "
                "saturate around composite ~0.745-0.755 at this corpus "
                "scale, and arm-vs-arm wins below the trajectory spread "
                "should not be claimed. (_cbpw's table row shows its "
                "post-hoc DENSE-selection best, 200-step granularity — "
                "a selection lever, not a config difference.)",
            ]
    (ARTIFACTS / "line_best_r5_section.md").write_text(
        "\n".join(rows + verdict) + "\n")
    print("\n".join(rows + verdict))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "stage", choices=["corpus", "augment", "perturb", "reverb", "probe2",
                          "train", "finetune", "sweep", "linebest",
                          "report"])
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--pool", type=int, default=200,
                        help="staged mixture batches for the train stage")
    parser.add_argument("--pool_seed", type=int, default=1,
                        help="mixture-pool RNG seed (vary on resume so a "
                        "continued run sees fresh mixtures)")
    parser.add_argument("--base_tag", default="",
                        help="finetune: tag of the base run to preload")
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--tag", default="",
                        help="suffix for ckpt dir / tracker run / summary")
    parser.add_argument("--wide", action="store_true",
                        help="perturb: also add 0.8x/1.25x (5x corpus)")
    parser.add_argument("--reverb", action="store_true",
                        help="train: mix through DNSTrainDataset with the "
                        "synthetic RIR bank at reverb_proportion 0.5")
    parser.add_argument("--snr_max", type=float, default=20.0,
                        help="train: top of the mixing SNR range; 40 adds "
                        "near-clean pairs so the model learns passthrough")
    parser.add_argument("--probe_weight", type=float, default=0.0,
                        help="train: weight of the unseen-noise probe in "
                        "best-model selection (0 = reference in-"
                        "distribution composite)")
    parser.add_argument("--corpus3x", action="store_true",
                        help="train --reverb: restrict clean clips to the "
                        "3x subset (round-3 reverb-only arm)")
    parser.add_argument("--seed", type=int, default=0,
                        help="train: model init seed")
    parser.add_argument("--weights", default="0,0.1,0.3,0.5",
                        help="sweep: probe_weight grid")
    parser.add_argument("--dense", action="store_true",
                        help="sweep: score EVERY step checkpoint on "
                        "val+probe (not just recorded validation points)")
    args = parser.parse_args()
    if args.stage == "corpus":
        build_corpus()
    elif args.stage == "augment":
        augment_noise()
    elif args.stage == "perturb":
        factors = ((0.9, "sp09"), (1.1, "sp11"))
        if args.wide:
            factors += ((0.8, "sp08"), (1.25, "sp125"))
        perturb_speech(factors)
    elif args.stage == "reverb":
        reverb_corpus()
    elif args.stage == "probe2":
        build_probe2()
    elif args.stage == "sweep":
        sweep(args.tag, weights=tuple(float(w) for w in
                                      args.weights.split(",")),
              dense=args.dense)
    elif args.stage == "linebest":
        line_best_section()
    elif args.stage == "train":
        train(args.epochs, args.tag, pool=args.pool,
              pool_seed=args.pool_seed, reverb=args.reverb,
              snr_max=args.snr_max, probe_weight=args.probe_weight,
              corpus3x=args.corpus3x, seed=args.seed)
    elif args.stage == "finetune":
        finetune(args.epochs, lr=args.lr,
                 base_tag=args.base_tag,
                 tag=(args.tag + "_ft") if args.tag else "_ft",
                 reverb=args.reverb)
    else:
        report()


if __name__ == "__main__":
    main()
