"""Enhancement inference CLI: noisy wav dir -> enhanced wav dir with RTF.

Usage:
    python -m generative_audio_tpu.cli.inference -C configs/inference.yaml \
        -M /path/to/checkpoint_dir_or_best_model.tar -I noisy_dir -O out_dir

Reference: tools/inference.py + audio_zen/inferencer/base_inferencer.py.
Accepts either an orbax checkpoint directory (this framework's trainers) or a
reference PyTorch .tar/.pth checkpoint (converted on the fly).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from generative_audio_tpu.utils.config import load_config_file
from generative_audio_tpu.utils.logging import get_logger


def load_model_params(checkpoint_path: str, model, config):
    """Orbax dir, or torch .tar/.pth via the converter."""
    from generative_audio_tpu.utils import torch_convert as tc
    path = Path(checkpoint_path)
    if path.suffix in (".tar", ".pth", ".pt"):
        sd = tc.load_torch_state_dict(str(path))
        return tc.convert_fullsubnet_plus(
            sd, sequence_model=config.sequence_model,
            attention=config.channel_attention_model)
    from generative_audio_tpu.train import CheckpointManager
    mgr = CheckpointManager(path)
    # jitted init on the default device: eager init over the TPU tunnel is
    # minutes-slow, and CPU-device init mis-lowers the Pallas LSTM kernels
    dummy = jnp.zeros((1, 1, config.num_freqs, 16))
    target = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy,
                                 dummy)["params"]
    for name in ("best", "latest"):
        restored = mgr.restore(name, {"params": target})
        if restored is not None:
            return restored["params"]
    raise FileNotFoundError(f"No checkpoint found under {path}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="generative_audio_tpu inference")
    parser.add_argument("-C", "--configuration", default=None)
    parser.add_argument("-M", "--model_checkpoint_path", required=True)
    parser.add_argument("-I", "--dataset_dir_name", required=True)
    parser.add_argument("-O", "--output_dir", required=True)
    parser.add_argument("--mode", default="mag_complex_full_band_crm_mask")
    args = parser.parse_args(argv)

    raw = load_config_file(args.configuration) if args.configuration else {}
    from generative_audio_tpu.models import (
        FullSubNetPlus, FullSubNetPlusConfig)
    from generative_audio_tpu.utils.config import build_dataclass
    from generative_audio_tpu.eval import Inferencer, InferencerConfig
    from generative_audio_tpu.data import InferenceDataset

    model_cfg = build_dataclass(FullSubNetPlusConfig, raw.get("model"))
    model = FullSubNetPlus(model_cfg, compute_dtype=jnp.bfloat16)
    params = load_model_params(args.model_checkpoint_path, model, model_cfg)

    inf_cfg = build_dataclass(InferencerConfig, raw.get("inferencer"))
    inf_cfg.inference_type = args.mode
    inferencer = Inferencer(
        lambda v, *inputs: model.apply(v, *inputs),
        {"params": params}, inf_cfg)
    dataset = InferenceDataset(args.dataset_dir_name, sr=inf_cfg.sr)
    get_logger().info(f"Enhancing {len(dataset)} clips -> {args.output_dir}")
    inferencer.enhance_dir(dataset, args.output_dir,
                           log=get_logger().info)


if __name__ == "__main__":
    main()
