"""Device mesh + sharding helpers, multi-process runtime."""
from generative_audio_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_batch, subband_sharding,
    place_batch, replicate_state,
)
from generative_audio_tpu.parallel import distributed  # noqa: F401
