"""Audio-inpainting NPPC demo on synthetic data: restoration UNet -> NPPC
PC-direction training -> principal angles vs the MC-dropout+PCA baseline.

    python examples/nppc_inpainting_demo.py [--steps 20]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def synthetic_batch(rng, b=4, f=32, t=64):
    """Harmonic-stack log-mag spectrograms with a masked gap."""
    freqs = np.arange(f)[None, :, None]
    times = np.arange(t)[None, None, :]
    base = np.sin(2 * np.pi * freqs * 0.11 + 0.3 * times) \
        + 0.3 * rng.standard_normal((b, f, t))
    spec = np.stack([base, 0.5 * base], axis=1).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, 24:40] = 0.0
    masked = spec * mask[:, None, None, :]
    return masked, mask, spec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    from generative_audio_tpu.models.nppc_model import (
        UNetModelConfig, InpaintingNPPCConfig)
    from generative_audio_tpu.models.pc_wrapper import (
        AudioInpaintingPCWrapperConfig)
    from generative_audio_tpu.train import (
        RestorationTrainConfig, RestorationTrainer)
    from generative_audio_tpu.train.nppc import (
        NPPCInpaintingTrainConfig, NPPCInpaintingTrainer)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)

    print("== restoration (masked MSE) ==")
    rcfg = RestorationTrainConfig(
        model=UNetModelConfig(in_channels=1, out_channels=1, dropout=0.2),
        num_freqs=32, num_frames=64, log_interval=10)
    rtrainer = RestorationTrainer(rcfg)
    rtrainer.train([batch], n_steps=args.steps, log=print)

    print("== NPPC (PC directions over the frozen restoration) ==")
    ncfg = NPPCInpaintingTrainConfig(
        model=InpaintingNPPCConfig(
            restoration=UNetModelConfig(1, 1, 0.2),
            pc_wrapper=AudioInpaintingPCWrapperConfig(
                in_channels=2, out_channels=3, n_dirs=3)),
        num_freqs=32, num_frames=64, second_moment_loss_grace=10,
        log_interval=10)
    ntrainer = NPPCInpaintingTrainer(
        ncfg, restoration_variables={
            "params": rtrainer.state.params,
            "batch_stats": rtrainer.state.batch_stats})
    ntrainer.train([batch], n_steps=args.steps, log=print)

    print("== validation: principal angles vs MC-dropout PCA baseline ==")
    import tempfile
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.eval import (
        NPPCValidator, NPPCValidatorConfig)
    from generative_audio_tpu.ops.preprocess import (
        preprocess_data, expand_frame_mask)

    from generative_audio_tpu.models.nppc_model import (
        InpaintingRestorationModel)

    nppc_vars = {"params": ntrainer.state.params,
                 "batch_stats": ntrainer.state.batch_stats}
    rest_model = InpaintingRestorationModel(ncfg.model.restoration)
    rest_vars = {
        "params": ntrainer.state.params["pretrained_restoration_model"],
        "batch_stats":
            ntrainer.state.batch_stats["pretrained_restoration_model"]}

    def nppc_apply(v, masked_norm, mask4):
        return ntrainer.model.apply(v, masked_norm, mask4, train=False)

    def rest_apply(v, masked_norm, mask4, rngs=None):
        # rngs enables MC-dropout (dropout on, BatchNorm frozen)
        return rest_model.apply(v, masked_norm, mask4, train=False,
                                mc_dropout=rngs is not None, rngs=rngs)

    masked, mask, clean = batch
    clean_norm, mask4, masked_norm = preprocess_data(
        jnp.asarray(clean), jnp.asarray(masked), jnp.asarray(mask))
    with tempfile.TemporaryDirectory() as out:
        cfg = NPPCValidatorConfig(save_dir=out, n_mc_samples=8,
                                  n_components=3)
        validator = NPPCValidator(nppc_apply, nppc_vars, rest_apply,
                                  rest_vars, cfg)
        report = validator.validate_sample(
            masked_norm[:1], mask4[:1], clean_norm[:1], stats=(0.0, 1.0),
            make_plots=False)
    for key, value in report.items():
        if isinstance(value, (int, float)):
            print(f"  {key}: {value:.4f}")
        elif isinstance(value, (list, np.ndarray)):
            print(f"  {key}: {np.round(np.asarray(value, float), 3)}")


if __name__ == "__main__":
    main()
