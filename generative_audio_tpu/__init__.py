"""generative_audio_tpu — a TPU-native (JAX/XLA/Pallas) speech-enhancement + NPPC
uncertainty framework with the capabilities of kfirc1503/generative-audio.

Layer map (mirrors SURVEY.md section 7):
    ops/       L0 signal ops: STFT/iSTFT, cIRM math, sub-band unfold, drop_band,
               normalizations, waveform utilities, Gram-Schmidt.
    nn/        L1 building blocks: scan-LSTM/GRU sequence models, TCN, MulCA (TSSE)
               attention family, UNet blocks.
    models/    L2: FullSubNetPlus, FullSubNet, MultiDirectionFullSubNetPlus,
               inpainting UNet + RestorationWrapper, PC wrappers, NPPC models.
    data/      host-side datasets: SNR mixing, DNS-style dynamic mixing,
               LibriSpeech-style inpainting sampler, WAV I/O.
    train/     pjit'd data-parallel trainers, orbax checkpointing.
    eval/      metrics (SI-SDR/STOI/...), inferencers with RTF, validators.
    parallel/  mesh construction + sharding helpers.
    utils/     config system, logging, torch-checkpoint conversion.
"""

__version__ = "0.1.0"
