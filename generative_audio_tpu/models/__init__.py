"""L2 models: enhancement nets, PC wrappers, NPPC models, restoration."""
from generative_audio_tpu.models.fullsubnet_plus import (  # noqa: F401
    FullSubNetPlusConfig, FullSubNetPlus,
    MultiDirectionConfig, MultiDirectionFullSubNetPlus,
)
from generative_audio_tpu.models.fullsubnet import (  # noqa: F401
    FullSubNetConfig, FullSubNet,
)
from generative_audio_tpu.models.image_restoration import (  # noqa: F401
    Denoising, Inpainting, Colorization, SuperResolution, gen_mask,
    make_distortion, ImageRestorationWrapper, ImageRestorationModel,
    ImageRestorationConfig,
)
from generative_audio_tpu.models.image_nppc import (  # noqa: F401
    ImagePCWrapper, ImageNPPCConfig, ImageNPPCModel,
)
