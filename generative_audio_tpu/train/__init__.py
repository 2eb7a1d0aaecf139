"""Trainers: pjit'd train steps, checkpointing, loop utilities."""
from generative_audio_tpu.train.state import TrainState, create_train_state  # noqa: F401
from generative_audio_tpu.train.enhance import (  # noqa: F401
    EnhanceTrainConfig, make_enhance_train_step, enhance_loss_fn,
)
