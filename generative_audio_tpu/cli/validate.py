"""Pretrained-model validation CLI — reproduces the reference's recorded
baseline pipeline (use_pre_trained_model/model_validator/
validate_pre_trained_model.py): AudioDataset on-the-fly mixing -> enhance ->
metrics -> validation_results.json.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from generative_audio_tpu.utils.config import (
    load_config_file, build_dataclass)
from generative_audio_tpu.utils.logging import get_logger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-M", "--model_checkpoint_path", required=True)
    parser.add_argument("-O", "--output", default="validation_results.json")
    parser.add_argument("--max_items", type=int, default=None)
    args = parser.parse_args(argv)

    raw = load_config_file(args.configuration)
    from generative_audio_tpu.models import (
        FullSubNetPlus, FullSubNetPlusConfig)
    from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
    from generative_audio_tpu.eval.validator import ModelValidator
    from generative_audio_tpu.cli.inference import load_model_params

    model_cfg = build_dataclass(FullSubNetPlusConfig, raw.get("model"))
    model = FullSubNetPlus(model_cfg, compute_dtype=jnp.bfloat16)
    params = load_model_params(args.model_checkpoint_path, model, model_cfg)

    dataset = AudioDataset(
        build_dataclass(AudioDataSetConfig, raw["data"]), seed=0)
    stft_cfg = raw.get("stft", {})
    validator = ModelValidator(
        lambda v, m, r, i: model.apply(v, m, r, i), {"params": params},
        n_fft=stft_cfg.get("nfft", 512),
        hop_length=stft_cfg.get("hop_length", 256),
        win_length=stft_cfg.get("win_length", 512))
    means = validator.validate_dataset(dataset, output_path=args.output,
                                       max_items=args.max_items,
                                       log=get_logger().info)
    get_logger().info(f"Validation means: {means}")


if __name__ == "__main__":
    main()
