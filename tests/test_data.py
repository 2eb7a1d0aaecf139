"""Data pipeline tests: I/O roundtrip, mixing SNR accuracy, dataset shapes,
frame-mask semantics vs the reference's python loop, loader sharding."""
import numpy as np
import pytest

from generative_audio_tpu import data as D


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    clean_dir, noise_dir = D.write_synthetic_corpus(root, n_clean=4, n_noise=3)
    return root, clean_dir, noise_dir


def test_wav_roundtrip(tmp_path, rng):
    y = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    D.write_wav(tmp_path / "a.wav", y, 16000)
    sr, back = D.read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_resample_halves_length(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    out = D.resample(y, 16000, 8000)
    assert len(out) == 8000


def test_mix_with_snr_achieves_snr(rng):
    clean = np.sin(2 * np.pi * 440 * np.arange(48000) / 16000).astype(np.float32)
    noise = rng.standard_normal(48000).astype(np.float32)
    noisy, clean_out = D.mix_with_snr(clean, noise, snr=10.0)
    resid = noisy - clean_out
    snr_est = 10 * np.log10(np.mean(clean_out ** 2) / np.mean(resid ** 2))
    assert abs(snr_est - 10.0) < 0.5


def test_speed_perturb_length_and_pitch():
    """factor f: length scales ~1/f and a pure tone lands at f0*f (Kaldi
    speed-perturbation semantics); factor 1.0 is the identity."""
    sr, f0 = 16000, 440.0
    t = np.arange(4 * sr) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)

    np.testing.assert_array_equal(D.speed_perturb(tone, 1.0), tone)

    assert len(D.speed_perturb(tone, np.float32(0.9))) > len(tone)

    for f in (0.9, 1.1):
        out = D.speed_perturb(tone, f)
        assert abs(len(out) - len(tone) / f) <= 2
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * sr / len(out)
        assert abs(peak_hz - f0 * f) < 2.0, (f, peak_hz)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        D.speed_perturb(tone, 0.0)


def test_dns_snr_mix_runs(rng):
    clean = rng.standard_normal(16000).astype(np.float32)
    noise = rng.standard_normal(16000).astype(np.float32)
    rir = np.zeros(1000, np.float32)
    rir[0] = 1.0
    noisy, clean_out = D.snr_mix(clean, noise, snr=5, target_dB_FS=-25,
                                 target_dB_FS_floating_value=10, rir=rir,
                                 rng=rng)
    assert noisy.shape == clean_out.shape == (16000,)
    assert np.max(np.abs(noisy)) <= 0.99 + 1e-6


def test_dns_train_dataset_scp(corpus, tmp_path, rng):
    """DNSTrainDataset end-to-end: scp lists with offset/limit, dynamic
    SNR mixing, RIR reverb path (ref dataset_train.py:12-207)."""
    root, clean_dir, noise_dir = corpus
    rir_dir = tmp_path / "rir"
    rir_dir.mkdir()
    rir = np.zeros(800, np.float32)
    rir[0], rir[200] = 1.0, 0.3
    D.write_wav(rir_dir / "rir0.wav", rir, 16000)

    clean_scp = tmp_path / "clean.scp"
    noise_scp = tmp_path / "noise.scp"
    rir_scp = tmp_path / "rir.scp"
    clean_scp.write_text("\n".join(
        str(p) for p in sorted(clean_dir.glob("*.wav"))) + "\n")
    noise_scp.write_text("\n".join(
        str(p) for p in sorted(noise_dir.glob("*.wav"))) + "\n")
    rir_scp.write_text(str(rir_dir / "rir0.wav") + "\n")

    from generative_audio_tpu.data.dns_dataset import (
        DNSTrainConfig, DNSTrainDataset)
    ds = DNSTrainDataset(DNSTrainConfig(
        clean_dataset=str(clean_scp), noise_dataset=str(noise_scp),
        rir_dataset=str(rir_scp), clean_dataset_offset=1,
        clean_dataset_limit=2, reverb_proportion=1.0,
        sub_sample_length=1.0), seed=0)
    assert len(ds) == 2                       # offset/limit honored
    noisy, clean = ds[0]
    assert noisy.shape == clean.shape == (16000,)
    assert noisy.dtype == np.float32
    assert np.max(np.abs(noisy)) <= 0.99 + 1e-6
    assert not np.allclose(noisy, clean)      # mixing happened


def test_dns_validation_and_inference_datasets(corpus, tmp_path):
    """DNSValidationDataset pairs noisy/clean by the DNS fileid suffix
    (ref dataset_validation.py:42-92); InferenceDataset walks a flat dir."""
    root, clean_dir, _ = corpus
    testset = tmp_path / "no_reverb"
    (testset / "noisy").mkdir(parents=True)
    (testset / "clean").mkdir()
    src = sorted(clean_dir.glob("*.wav"))[0]
    sr, wav = D.read_wav(src)
    # DNS naming: noisy/<junk>_snr..._fileid_7.wav <-> clean/clean_fileid_7.wav
    D.write_wav(testset / "noisy" / "book_x_snr10_fileid_7.wav", wav, sr)
    D.write_wav(testset / "clean" / "clean_fileid_7.wav", wav * 0.5, sr)

    from generative_audio_tpu.data.dns_dataset import (
        DNSValidationDataset, InferenceDataset)
    ds = DNSValidationDataset([str(testset), str(tmp_path / "absent")])
    assert len(ds) == 1
    noisy, clean, name = ds[0]
    assert name == "book_x_snr10_fileid_7"
    np.testing.assert_allclose(noisy, clean * 2, atol=1e-3)

    inf = InferenceDataset(str(testset / "noisy"))
    assert len(inf) == 1
    wav_out, stem = inf[0]
    assert stem == "book_x_snr10_fileid_7" and len(wav_out) == len(wav)


def test_audio_dataset(corpus):
    root, clean_dir, noise_dir = corpus
    ds = D.AudioDataset(D.AudioDataSetConfig(
        clean_path=str(clean_dir), noisy_path=str(noise_dir),
        sub_sample_length_seconds=2.0), seed=0)
    noisy, clean = ds[0]
    assert noisy.shape == clean.shape == (32000,)
    assert noisy.dtype == np.float32
    # mixing actually added noise
    assert not np.allclose(noisy, clean)


def test_inpainting_dataset(corpus):
    root, clean_dir, _ = corpus
    cfg = D.AudioInpaintingConfig(
        clean_path=str(clean_dir), sub_sample_length_seconds=2.044,
        missing_length_seconds=0.128, seed=42, file_glob="*.wav")
    ds = D.AudioInpaintingDataset(cfg)
    s = ds[0]
    assert s.stft_clean.shape[0] == 2 and s.stft_clean.shape[1] == 128
    assert s.stft_masked.shape == s.stft_clean.shape
    assert s.mask_frames.shape == (s.stft_clean.shape[2],)
    # gap zeroed in time and in masked frames
    assert np.all(s.masked_audio[0, s.mask_start_idx:s.mask_end_idx] == 0)
    masked_frames = np.where(s.mask_frames == 0)[0]
    assert len(masked_frames) > 0
    assert np.all(s.stft_masked[:, :, masked_frames] == 0)
    # per-index seeding reproducible
    s2 = ds[0]
    assert s2.mask_start_idx == s.mask_start_idx
    np.testing.assert_array_equal(s2.stft_masked, s.stft_masked)


def test_inpainting_dataset_vad(corpus):
    root, clean_dir, _ = corpus
    for vad_type in ("entropy", "energy"):
        cfg = D.AudioInpaintingConfig(
            clean_path=str(clean_dir), sub_sample_length_seconds=2.0,
            missing_length_seconds=0.1, seed=1, use_vad=True,
            vad_type=vad_type, file_glob="*.wav")
        ds = D.AudioInpaintingDataset(cfg)
        s = ds[0]
        assert s.mask_end_idx - s.mask_start_idx == cfg.missing_length


def test_inpainting_dataset_custom_vad_fn_wins(corpus):
    """An injected vad_fn overrides vad_type: the mask must land inside
    the segment it returns."""
    root, clean_dir, _ = corpus
    calls = []

    def fake_vad(audio, sr):
        calls.append(len(audio))
        return [(8000, 16000)]

    cfg = D.AudioInpaintingConfig(
        clean_path=str(clean_dir), sub_sample_length_seconds=2.0,
        missing_length_seconds=0.1, seed=3, use_vad=True,
        vad_type="entropy", file_glob="*.wav")
    ds = D.AudioInpaintingDataset(cfg, vad_fn=fake_vad)
    s = ds[0]
    assert calls, "custom vad_fn was not used"
    assert 8000 <= s.mask_start_idx and s.mask_end_idx <= 16000


def test_time_to_spec_mask_matches_reference_loop(rng):
    """Vectorized frame mask == the reference python loop
    (audio_dataset_inpainting.py:223-251)."""
    L, win, hop = 4000, 255, 128
    t_frames = 1 + L // hop
    mask = np.ones(L, np.float32)
    mask[1000:1500] = 0

    ours = D.time_to_spec_mask(mask, t_frames, L, win, hop)

    ref = []
    half = win // 2
    for t in range(t_frames):
        start = t * hop - half
        end = start + win
        start = max(start, 0)
        end = min(end, L)
        if end <= start:
            ref.append(0.0)
        else:
            ref.append(float(mask[start:end].min() == 1))
    np.testing.assert_array_equal(ours, np.asarray(ref, np.float32))


def test_batch_loader_sharding(corpus):
    root, clean_dir, noise_dir = corpus

    class Idx:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.asarray([i], np.float32)

    all_seen = []
    for host in range(2):
        loader = D.BatchLoader(Idx(), global_batch_size=8, shuffle=False,
                               host_id=host, num_hosts=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0].shape == (4, 1)
        all_seen.extend(b.reshape(-1).tolist() for b in batches)
    flat = sorted(x for chunk in all_seen for x in chunk)
    assert flat == list(map(float, range(16)))  # full cover, no overlap


def test_loop_iterator(corpus):
    class Ten:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.float32(i)

    loader = D.BatchLoader(Ten(), global_batch_size=2, shuffle=False,
                           num_workers=1)
    loop = D.LoopIterator(loader, n_steps=12)
    assert len(list(loop)) == 12
    # an empty underlying loader (e.g. dataset < one batch with drop_last)
    # must raise, not spin forever re-entering empty epochs
    with pytest.raises(RuntimeError, match="no batches"):
        list(D.LoopIterator([], n_steps=3))


def test_sample_generator(tmp_path, corpus):
    root, clean_dir, noise_dir = corpus
    gen = D.TestSampleGenerator(
        D.AudioDataSetConfig(clean_path=str(clean_dir),
                             noisy_path=str(noise_dir),
                             sub_sample_length_seconds=1.0),
        str(tmp_path / "out"), snr=10.0)
    gen.generate(2)
    assert len(list((tmp_path / "out" / "noisy").glob("*.wav"))) == 2
    assert len(list((tmp_path / "out" / "clean").glob("*.wav"))) == 2


def test_inpainting_dataset_over_flac_corpus(tmp_path):
    """LibriSpeech-style FLAC corpus through the native decoder (the real
    consumer of data/flac.py)."""
    from generative_audio_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    from tests.flac_writer import flac_stream, _subframe_header
    from generative_audio_tpu.data.inpainting_dataset import (
        AudioInpaintingDataset, AudioInpaintingConfig)

    sr, seconds = 16000, 1.0
    spk = tmp_path / "19" / "198"
    spk.mkdir(parents=True)
    for i in range(2):
        t = np.arange(int(sr * seconds))
        wav = np.round(8000 * np.sin(2 * np.pi * (200 + 50 * i) * t / sr)) \
            .astype(np.int64)
        frames = []
        for start in range(0, len(wav), 4096):
            chunk = wav[start:start + 4096]

            def make(chunk=chunk):
                def write(bw, bs):
                    _subframe_header(bw, 1)
                    for s in chunk:
                        bw.write_signed(int(s), 16)
                return write
            frames.append((len(chunk), 0, make()))
        (spk / f"19-198-{i:04d}.flac").write_bytes(
            flac_stream(frames, sr=sr, total=len(wav)))
    (spk / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 SECOND UTTERANCE\n")

    cfg = AudioInpaintingConfig(
        clean_path=str(tmp_path), sub_sample_length_seconds=0.5,
        missing_length_seconds=0.064, seed=0)
    ds = AudioInpaintingDataset(cfg)
    assert len(ds) == 2
    sample = ds[0]
    assert sample.transcription in ("HELLO WORLD", "SECOND UTTERANCE")
    assert np.isfinite(np.asarray(sample.stft_masked)).all()


def test_inpainting_dataset_broken_corpus_raises(tmp_path):
    """A corpus with no decodable/long-enough files must raise instead of
    recursing (the skip-forward retry is bounded to one pass)."""
    from generative_audio_tpu.data.inpainting_dataset import (
        AudioInpaintingDataset, AudioInpaintingConfig)
    (tmp_path / "a.flac").write_bytes(b"garbage")
    (tmp_path / "b.flac").write_bytes(b"also garbage")
    ds = AudioInpaintingDataset(AudioInpaintingConfig(
        clean_path=str(tmp_path), sub_sample_length_seconds=0.5))
    with pytest.raises(RuntimeError, match="No usable audio"):
        ds[0]


def test_audio_dataset_broken_corpus_raises(tmp_path):
    from generative_audio_tpu.data.audio_dataset import (
        AudioDataset, AudioDataSetConfig)
    from generative_audio_tpu.data.audio_io import write_wav
    clean, noise = tmp_path / "clean", tmp_path / "noise"
    clean.mkdir(), noise.mkdir()
    (clean / "bad.wav").write_bytes(b"garbage wav")
    write_wav(noise / "n.wav", np.zeros(16000, np.float32) + 0.01, 16000)
    ds = AudioDataset(AudioDataSetConfig(
        clean_path=str(clean), noisy_path=str(noise),
        sub_sample_length_seconds=0.5))
    with pytest.raises(RuntimeError, match="No readable clean audio"):
        ds[0]


def test_batchloader_multihost_forces_drop_last():
    """A ragged final batch cannot be sharded across hosts: multi-host
    loaders force drop_last (announced by a warning) instead of silently
    dropping rows or yielding empty local slices."""
    import warnings

    class Nine:
        def __len__(self):
            return 9

        def __getitem__(self, i):
            return np.asarray([i], np.float32)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaders = [D.BatchLoader(Nine(), global_batch_size=4, shuffle=False,
                                 drop_last=False, host_id=h, num_hosts=2,
                                 num_workers=1) for h in range(2)]
        assert any("drop_last" in str(x.message) for x in w)
    seen = []
    for loader in loaders:
        assert loader.drop_last
        assert len(loader) == 2
        batches = list(loader)
        assert [b.shape for b in batches] == [(2, 1), (2, 1)]
        seen.extend(b.reshape(-1).tolist() for b in batches)
    flat = sorted(x for chunk in seen for x in chunk)
    assert flat == list(map(float, range(8)))  # row 8 dropped, announced
