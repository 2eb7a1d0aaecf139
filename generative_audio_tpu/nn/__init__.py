"""L1 NN building blocks: sequence models, TCN, attention, UNets."""
from generative_audio_tpu.nn.recurrent import (  # noqa: F401
    LSTMLayer, GRULayer, SequenceModel,
)
from generative_audio_tpu.nn.tcn import (  # noqa: F401
    TCNBlock, TCNStack, CausalConvBlock, CausalTransConvBlock,
)
from generative_audio_tpu.nn.attention import (  # noqa: F401
    ChannelSELayer, ChannelTimeSenseSELayer, ChannelCBAMLayer,
    ChannelECALayer, SelfAttentionLayer, make_channel_attention,
)
from generative_audio_tpu.nn.unet import (  # noqa: F401
    UNet, UNet2, RestorationWrapper, UNetConfig, resize_align_corners,
)
from generative_audio_tpu.nn.image_nets import (  # noqa: F401
    ResBlock, AttentionBlock, ImageUNet, ResUNet, ResCNN, pixel_shuffle,
)
