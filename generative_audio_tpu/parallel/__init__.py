"""Device mesh + sharding helpers, multi-process runtime."""
from generative_audio_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_batch, subband_sharding,
)
from generative_audio_tpu.parallel import distributed  # noqa: F401
