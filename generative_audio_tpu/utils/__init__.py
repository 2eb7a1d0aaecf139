"""Config system, logging, checkpoint conversion utilities."""
from generative_audio_tpu.utils.auxil import (  # noqa: F401
    set_random_seed, EncapsulatedRandomState, Timer, StatusMessages,
    LoopLoader, run_and_profile,
)
from generative_audio_tpu.utils.tracking import (  # noqa: F401
    ExperimentTracker, ArtifactRegistry,
)
from generative_audio_tpu.utils.report import (  # noqa: F401
    HTMLReport, imgs_to_grid, img_to_png_base64,
)
from generative_audio_tpu.utils import plot  # noqa: F401
