"""Image-source RIR synthesizer tests — physical invariants, not goldens:
direct-path arrival at distance/c, Schroeder-integral RT60 in the right
range, energy decay, and the DNSTrainDataset reverb path end-to-end
(reference dataset_train.py:129-182 semantics)."""
import numpy as np
import pytest

from generative_audio_tpu.data.rir import (
    SPEED_OF_SOUND, image_source_rir, make_rir_bank)

SR = 16000


def test_direct_path_arrival():
    # deliberately asymmetric positions: equal src/mic heights make floor
    # and ceiling images coincide and coherently beat the direct path
    room = [6.1, 4.7, 2.9]
    src, mic = [1.1, 1.3, 1.2], [4.3, 3.1, 1.9]
    rir = image_source_rir(room, src, mic, rt60=0.25, sr=SR)
    dist = np.linalg.norm(np.subtract(src, mic))
    expect = dist / SPEED_OF_SOUND * SR
    # first significant energy (>=20% of peak) lands on the direct path
    first = int(np.argmax(np.abs(rir) > 0.2 * np.abs(rir).max()))
    assert abs(first - expect) < 3, (first, expect)
    # and the direct path is the strongest single arrival
    assert abs(int(np.argmax(np.abs(rir))) - expect) < 3


def _schroeder_rt60(rir, sr):
    """RT60 from the Schroeder backward integral's -5..-25 dB slope,
    extrapolated x3 (T20 protocol)."""
    energy = rir.astype(np.float64) ** 2
    sch = np.cumsum(energy[::-1])[::-1]
    sch_db = 10 * np.log10(sch / sch[0] + 1e-12)
    t5 = int(np.argmax(sch_db <= -5))
    t25 = int(np.argmax(sch_db <= -25))
    assert t25 > t5 > 0
    return 3.0 * (t25 - t5) / sr


@pytest.mark.parametrize("rt60", [0.2, 0.45])
def test_rt60_in_range(rt60):
    rir = image_source_rir([5.0, 4.0, 2.8], [1.2, 1.1, 1.4],
                           [3.6, 2.9, 1.6], rt60=rt60, sr=SR,
                           length=int(1.5 * rt60 * SR))
    got = _schroeder_rt60(rir, SR)
    # Sabine + truncated specular model: same order of magnitude is the
    # realistic contract (measured corpora vary more than this)
    assert 0.4 * rt60 < got < 1.8 * rt60, (got, rt60)


def test_energy_decays_and_is_finite():
    rir = image_source_rir([4.0, 4.0, 2.5], [1.0, 2.0, 1.2],
                           [3.0, 1.5, 1.8], rt60=0.3, sr=SR)
    assert np.all(np.isfinite(rir)) and np.abs(rir).max() <= 1.0
    n = len(rir)
    head = float(np.sum(rir[: n // 4] ** 2))
    tail = float(np.sum(rir[-n // 4:] ** 2))
    assert head > 20 * tail


def test_longer_rt60_means_slower_decay():
    kw = dict(room=[5.0, 4.0, 2.8], src=[1.2, 1.1, 1.4],
              mic=[3.6, 2.9, 1.6], sr=SR, length=SR // 2)
    short = image_source_rir(rt60=0.15, **kw)
    long = image_source_rir(rt60=0.55, **kw)

    def tail_frac(r):
        e = r.astype(np.float64) ** 2
        return float(e[len(e) // 4:].sum() / e.sum())
    assert tail_frac(long) > 2 * tail_frac(short)


def test_make_rir_bank_and_dns_reverb_path(tmp_path):
    from generative_audio_tpu.data.audio_io import load_audio, write_wav
    from generative_audio_tpu.data.dns_dataset import (
        DNSTrainConfig, DNSTrainDataset)

    scp = make_rir_bank(tmp_path / "rir", n=3, seed=0, sr=SR)
    paths = scp.read_text().strip().splitlines()
    assert len(paths) == 3
    first = load_audio(paths[0], SR)
    assert first.ndim == 1 and len(first) > 100

    # deterministic regeneration
    scp2 = make_rir_bank(tmp_path / "rir2", n=3, seed=0, sr=SR)
    second = load_audio(scp2.read_text().strip().splitlines()[0], SR)
    np.testing.assert_array_equal(first, second)

    # end-to-end: DNSTrainDataset with reverb_proportion=1 produces a
    # reverberant clean target (convolved, so != the dry source crop)
    rng = np.random.default_rng(1)
    t = np.arange(4 * SR) / SR
    speech = (np.sin(2 * np.pi * 220 * t)
              * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    (tmp_path / "wav").mkdir()
    write_wav(tmp_path / "wav" / "clean.wav", speech * 0.3, SR)
    write_wav(tmp_path / "wav" / "noise.wav",
              rng.standard_normal(4 * SR).astype(np.float32) * 0.05, SR)
    (tmp_path / "clean.scp").write_text(f"{tmp_path}/wav/clean.wav\n")
    (tmp_path / "noise.scp").write_text(f"{tmp_path}/wav/noise.wav\n")

    def build(reverb):
        return DNSTrainDataset(DNSTrainConfig(
            clean_dataset=str(tmp_path / "clean.scp"),
            noise_dataset=str(tmp_path / "noise.scp"),
            rir_dataset=str(scp) if reverb else None,
            reverb_proportion=1.0 if reverb else 0.0,
            sub_sample_length=1.0), seed=7)

    noisy_r, clean_r = build(True)[0]
    noisy_d, clean_d = build(False)[0]
    assert noisy_r.shape == clean_r.shape == (SR,)
    assert np.all(np.isfinite(noisy_r)) and np.all(np.isfinite(clean_r))
    # same seed, same crop: only the RIR convolution differs
    corr = np.corrcoef(clean_r, clean_d)[0, 1]
    assert corr < 0.999, "reverb did not change the clean target"
