"""L0 signal ops: STFT/iSTFT, cIRM math, sub-band ops, norms, Gram-Schmidt."""
from generative_audio_tpu.ops.stft import (  # noqa: F401
    hann_window, stft, stft_ri, istft, istft_ri, mc_stft, mag_phase,
    stft_real_imag, audio_to_stft, prepare_input_from_waveform, frame_signal,
)
from generative_audio_tpu.ops.mask import (  # noqa: F401
    build_ideal_ratio_mask, build_complex_ideal_ratio_mask,
    build_complex_ideal_ratio_mask_ri,
    compress_cIRM, decompress_cIRM, complex_mul, apply_crm,
    crm_to_stft_components, crm_to_spectrogram, EPSILON,
)
from generative_audio_tpu.ops.subband import band_unfold, drop_band  # noqa: F401
from generative_audio_tpu.ops.norms import (  # noqa: F401
    offline_laplace_norm, cumulative_laplace_norm, offline_gaussian_norm,
    cumulative_layer_norm, forgetting_norm, sband_forgetting_norm,
    hybrid_norm, get_norm,
)
from generative_audio_tpu.ops.gram_schmidt import (  # noqa: F401
    gram_schmidt, gram_schmidt_to_spec_mag, gram_schmidt_to_crm,
)
from generative_audio_tpu.ops.preprocess import (  # noqa: F401
    normalize_spectrograms, denormalize_spectrograms,
    preprocess_log_magnitude, preprocess_data, expand_frame_mask,
)
from generative_audio_tpu.ops import waveform  # noqa: F401
from generative_audio_tpu.ops.conv_stft import (  # noqa: F401
    conv_stft_kernel, conv_stft, conv_istft,
)
from generative_audio_tpu.ops.multichannel import (  # noqa: F401
    ChannelWiseLayerNorm, DirectionalFeatureComputer,
    ChannelDirectionalFeatureComputer, compute_ipd,
)
from generative_audio_tpu.ops import beamforming  # noqa: F401
