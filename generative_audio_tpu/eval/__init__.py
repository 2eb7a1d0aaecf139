"""Evaluation: metrics registry, inferencers, validators."""
from generative_audio_tpu.eval.metrics import (  # noqa: F401
    SI_SDR, STOI, ESTOI, WB_PESQ, NB_PESQ, MOSNET, REGISTERED_METRICS,
    MetricUnavailable, transform_pesq_range, composite_validation_score,
)
from generative_audio_tpu.eval.inferencer import (  # noqa: F401
    Inferencer, InferencerConfig,
)
from generative_audio_tpu.eval.validator import ModelValidator  # noqa: F401
