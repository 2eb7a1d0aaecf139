"""Host-side data: audio I/O, SNR mixing, datasets, batch loading."""
from generative_audio_tpu.data.audio_io import (  # noqa: F401
    read_wav, write_wav, to_mono, resample, load_audio,
)
from generative_audio_tpu.data.mixing import (  # noqa: F401
    mix_with_snr, snr_mix, build_noise_track, speed_perturb,
)
from generative_audio_tpu.data.audio_dataset import (  # noqa: F401
    AudioDataSetConfig, AudioDataset,
)
from generative_audio_tpu.data.inpainting_dataset import (  # noqa: F401
    AudioInpaintingConfig, AudioInpaintingDataset, AudioInpaintingSample,
    StftSettings, time_to_spec_mask, collate_inpainting,
)
from generative_audio_tpu.data.dns_dataset import (  # noqa: F401
    DNSTrainConfig, DNSTrainDataset, DNSValidationDataset, InferenceDataset,
    parse_snr_range,
)
from generative_audio_tpu.data.loader import BatchLoader, LoopIterator  # noqa: F401
from generative_audio_tpu.data.rir import (  # noqa: F401
    image_source_rir, make_rir_bank)
from generative_audio_tpu.data.sample_generator import (  # noqa: F401
    TestSampleGenerator, write_synthetic_corpus,
)
from generative_audio_tpu.data.image_data import (  # noqa: F401
    ImageFilesDataset, DatasetWrapper, PairsDataset, split_dataset,
    split_batch, crop_scaled_pair, synthetic_digits, MNISTDataModule,
    CelebAHQ256DataModule, CelebASRFlowDataModule, make_data_module,
)
from generative_audio_tpu.data import native  # noqa: F401
from generative_audio_tpu.data.download import download_librispeech  # noqa: F401
