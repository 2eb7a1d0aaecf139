"""Trainers: pjit'd train steps, checkpointing, loop utilities."""
from generative_audio_tpu.train.state import (  # noqa: F401
    TrainState, create_train_state, make_optimizer,
)
from generative_audio_tpu.train.enhance import (  # noqa: F401
    EnhanceTrainConfig, make_enhance_train_step, enhance_loss_fn,
    init_enhance_state, EnhanceTrainer,
)
from generative_audio_tpu.train.restoration import (  # noqa: F401
    RestorationTrainConfig, RestorationTrainer,
)
from generative_audio_tpu.train.nppc import (  # noqa: F401
    NPPCInpaintingTrainConfig, NPPCInpaintingTrainer,
    NPPCDenoisingTrainConfig, NPPCDenoisingTrainer,
)
from generative_audio_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from generative_audio_tpu.train.image import (  # noqa: F401
    ImageRestorationTrainer, ImageNPPCTrainer,
)
