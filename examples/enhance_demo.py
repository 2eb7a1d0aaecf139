"""End-to-end enhancement demo on synthetic audio — runs anywhere (CPU or
TPU), no external data.

    python examples/enhance_demo.py [--steps 30]

1. synthesizes a tiny (clean, noise) corpus,
2. trains a small FullSubNet+ for a few steps on DNS-style dynamic mixing,
3. enhances a held-out noisy clip through the Inferencer and prints
   SI-SDR / STOI before vs after.
"""
import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_corpus(root: Path, sr=16000, n=6):
    from generative_audio_tpu.data.audio_io import write_wav
    rng = np.random.default_rng(0)
    (root / "clean").mkdir(parents=True)
    (root / "noise").mkdir(parents=True)
    t = np.arange(sr * 3)
    for i in range(n):
        f0 = 110 * (i + 2)
        speechish = sum(np.sin(2 * np.pi * f0 * k * t / sr) / k
                        for k in range(1, 5))
        env = 0.5 * (1 + np.sin(2 * np.pi * 1.7 * t / sr + i))
        write_wav(root / "clean" / f"c{i}.wav",
                  (0.25 * speechish * env / np.abs(speechish).max())
                  .astype(np.float32), sr)
        write_wav(root / "noise" / f"n{i}.wav",
                  (0.2 * rng.standard_normal(len(t))).astype(np.float32), sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    args = parser.parse_args()

    from generative_audio_tpu.data import (AudioDataset, AudioDataSetConfig,
                                           BatchLoader)
    from generative_audio_tpu.models.fullsubnet_plus import (
        FullSubNetPlusConfig)
    from generative_audio_tpu.train import (EnhanceTrainConfig,
                                            EnhanceTrainer)
    from generative_audio_tpu.eval import (Inferencer, InferencerConfig,
                                           SI_SDR, STOI)
    from generative_audio_tpu.utils.auxil import LoopLoader

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_corpus(root)

        cfg = EnhanceTrainConfig(
            model=FullSubNetPlusConfig(
                num_freqs=65, sb_num_neighbors=3, fb_model_hidden_size=64,
                sb_model_hidden_size=32, num_groups_in_drop_band=1),
            n_fft=128, hop_length=64, win_length=128,
            compute_dtype="float32", learning_rate=5e-4)
        dataset = AudioDataset(AudioDataSetConfig(
            clean_path=str(root / "clean"), noisy_path=str(root / "noise"),
            sub_sample_length_seconds=1.0, snr_range=(0, 5)))
        loader = BatchLoader(dataset, global_batch_size=4, num_workers=2)
        trainer = EnhanceTrainer(cfg)
        for i, (noisy, clean) in enumerate(
                LoopLoader(loader, n_steps=args.steps)):
            trainer.state, loss = trainer._step_fn(trainer.state, noisy,
                                                   clean)
            if (i + 1) % 10 == 0:
                print(f"step {i + 1}: loss={float(loss):.5f}")

        # held-out clip
        noisy, clean = dataset[0]
        model_apply = trainer._step_fn  # noqa: F841  (state carries params)
        from generative_audio_tpu.train.enhance import _model
        model = _model(cfg)
        inf = Inferencer(
            lambda v, m, r, i_: model.apply(v, m, r, i_),
            {"params": trainer.state.params},
            InferencerConfig(n_fft=128, hop_length=64, win_length=128,
                             length_bucket=4000))
        enhanced = inf.enhance(noisy)
        print(f"SI-SDR noisy    : {SI_SDR(clean, noisy):6.2f} dB")
        print(f"SI-SDR enhanced : {SI_SDR(clean, enhanced):6.2f} dB")
        print(f"STOI noisy      : {STOI(clean, noisy):6.3f}")
        print(f"STOI enhanced   : {STOI(clean, enhanced):6.3f}")


if __name__ == "__main__":
    main()
