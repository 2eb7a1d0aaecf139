"""Native C++ audio data path: decode/resample/mix/batch vs the numpy
reference implementations (data.audio_io / data.mixing).

Skips cleanly when no C++ toolchain is available.
"""
import io
import wave

import numpy as np
import pytest

from generative_audio_tpu.data import native
from generative_audio_tpu.data.audio_io import write_wav, read_wav
from generative_audio_tpu.data import mixing as np_mixing

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _sine(sr=16000, seconds=1.0, freq=440.0, amp=0.3):
    t = np.arange(int(sr * seconds))
    return (amp * np.sin(2 * np.pi * freq * t / sr)).astype(np.float32)


def _wav_bytes(x: np.ndarray, sr: int, sampwidth=2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
        else:
            raise ValueError
    return buf.getvalue()


class TestDecode:
    def test_decode_pcm16(self):
        x = _sine()
        samples, sr = native.decode_wav(_wav_bytes(x, 16000))
        assert sr == 16000
        assert len(samples) == len(x)
        np.testing.assert_allclose(samples, x, atol=1e-3)

    def test_decode_stereo_mixes_to_mono(self):
        x = _sine()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            stereo = np.stack([x, -x], 1).reshape(-1)
            w.writeframes((stereo * 32767).astype("<i2").tobytes())
        samples, sr = native.decode_wav(buf.getvalue())
        np.testing.assert_allclose(samples, 0.0, atol=1e-3)  # L+R cancel

    def test_decode_garbage_raises(self):
        with pytest.raises(ValueError):
            native.decode_wav(b"not a wav file at all........")


class TestResample:
    def test_downsample_preserves_tone(self):
        sr_in, sr_out = 48000, 16000
        x = _sine(sr=sr_in, seconds=1.0, freq=440)
        y = native.resample(x, sr_in, sr_out)
        assert abs(len(y) - 16000) <= 2
        # dominant bin must stay at 440 Hz
        spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
        peak_hz = np.argmax(spec) * sr_out / (len(y) - 400)
        assert abs(peak_hz - 440) < 5
        # amplitude preserved within 5%
        assert abs(np.max(np.abs(y[200:-200])) - 0.3) < 0.015

    def test_upsample(self):
        x = _sine(sr=8000, seconds=0.5, freq=300)
        y = native.resample(x, 8000, 16000)
        assert abs(len(y) - 8000) <= 2
        spec = np.abs(np.fft.rfft(y[100:-100] * np.hanning(len(y) - 200)))
        peak_hz = np.argmax(spec) * 16000 / (len(y) - 200)
        assert abs(peak_hz - 300) < 8

    def test_identity(self):
        x = _sine()
        y = native.resample(x, 16000, 16000)
        np.testing.assert_array_equal(x, y)


class TestSnrMix:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        clean = _sine() + 0.01 * rng.standard_normal(16000).astype(np.float32)
        noise = rng.standard_normal(16000).astype(np.float32) * 0.2
        got_noisy, got_clean = native.snr_mix(clean, noise, snr=5.0,
                                              target_dB_FS=-25.0)
        class _FixedRng:  # forces noisy_target_dB_FS == -25 exactly
            def integers(self, lo, hi):
                return -25

        want_noisy, want_clean = np_mixing.snr_mix(
            clean.copy(), noise.copy(), 5.0, target_dB_FS=-25,
            target_dB_FS_floating_value=1, rng=_FixedRng())
        np.testing.assert_allclose(got_noisy, want_noisy, atol=2e-4)
        np.testing.assert_allclose(got_clean, want_clean, atol=2e-4)

    def test_snr_is_respected(self):
        rng = np.random.default_rng(1)
        clean = rng.standard_normal(32000).astype(np.float32)
        noise = rng.standard_normal(32000).astype(np.float32)
        noisy, clean_out = native.snr_mix(clean, noise, snr=10.0)
        resid = noisy - clean_out
        snr_est = 10 * np.log10(np.mean(clean_out ** 2)
                                / np.mean(resid ** 2))
        assert abs(snr_est - 10.0) < 0.5


class TestDecodeBatch:
    def test_batch_decode_resample_crop(self, tmp_path):
        paths = []
        for i, sr in enumerate([16000, 8000, 48000]):
            x = _sine(sr=sr, seconds=1.0, freq=200 * (i + 1))
            p = tmp_path / f"f{i}.wav"
            write_wav(p, x, sr)
            paths.append(p)
        out, failures = native.decode_batch(paths, target_sr=16000,
                                            target_len=12000, n_threads=3)
        assert failures == 0
        assert out.shape == (3, 12000)
        for i in range(3):
            assert np.max(np.abs(out[i])) > 0.2
        # offsets: skip the first 4000 samples of file 0
        out2, _ = native.decode_batch(paths[:1], 16000, 8000,
                                      offsets=[4000])
        np.testing.assert_allclose(out2[0], out[0, 4000:12000], atol=1e-5)

    def test_missing_file_counts_failure(self, tmp_path):
        out, failures = native.decode_batch([tmp_path / "nope.wav"],
                                            16000, 100)
        assert failures == 1
        np.testing.assert_array_equal(out, 0.0)


class TestLoadAudioNativePath:
    def test_load_audio_uses_native_when_built(self, tmp_path, monkeypatch):
        from generative_audio_tpu.data.audio_io import load_audio
        x = _sine(sr=8000, seconds=0.5)
        p = tmp_path / "t.wav"
        write_wav(p, x, 8000)
        monkeypatch.setenv("GAT_NATIVE_AUDIO", "1")
        y = load_audio(p, sr=16000)
        assert abs(len(y) - 8000) <= 2
        assert np.max(np.abs(y)) > 0.2
