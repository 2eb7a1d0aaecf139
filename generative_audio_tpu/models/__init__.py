"""L2 models: enhancement nets, PC wrappers, NPPC models, restoration."""
from generative_audio_tpu.models.fullsubnet_plus import (  # noqa: F401
    FullSubNetPlusConfig, FullSubNetPlus,
    MultiDirectionConfig, MultiDirectionFullSubNetPlus,
)
from generative_audio_tpu.models.fullsubnet import (  # noqa: F401
    FullSubNetConfig, FullSubNet,
)
