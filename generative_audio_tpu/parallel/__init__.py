"""Device mesh + sharding helpers."""
from generative_audio_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_batch, subband_sharding,
)
