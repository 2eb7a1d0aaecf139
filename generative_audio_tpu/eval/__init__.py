"""Evaluation: metrics registry, inferencers, validators."""
from generative_audio_tpu.eval.metrics import (  # noqa: F401
    SI_SDR, STOI, ESTOI, WB_PESQ, NB_PESQ, MOSNET, REGISTERED_METRICS,
    MetricUnavailable, transform_pesq_range, composite_validation_score,
)
from generative_audio_tpu.eval.inferencer import (  # noqa: F401
    Inferencer, InferencerConfig,
)
from generative_audio_tpu.eval.streaming import StreamingEnhancer  # noqa: F401
from generative_audio_tpu.eval.validator import ModelValidator  # noqa: F401
from generative_audio_tpu.eval.mc_dropout import (  # noqa: F401
    mc_dropout_inference, compute_pca_batch, calculate_unet_baseline,
)
from generative_audio_tpu.eval.nppc_validator import (  # noqa: F401
    NPPCValidator, NPPCValidatorConfig, compute_metrics, organize_jsons,
)
from generative_audio_tpu.eval.nppc_denoising_validator import (  # noqa: F401
    DenoisingNPPCValidator, DenoisingNPPCValidatorConfig,
)
from generative_audio_tpu.eval.restoration_validator import (  # noqa: F401
    RestorationValidator, RestorationValidatorConfig)
from generative_audio_tpu.eval.pitch import yin_pitch_track  # noqa: F401
from generative_audio_tpu.eval.transcription import (  # noqa: F401
    make_whisper_transcribe_fn, make_phoneme_fn,
)
