"""Native FLAC decoder vs a minimal from-scratch FLAC encoder.

The encoder writes spec-compliant streams exercising each subframe type
(constant, verbatim, fixed-order, LPC) plus Rice residuals and mid/side
stereo — the encoding features libFLAC uses for LibriSpeech.
"""
import numpy as np
import pytest

from generative_audio_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


from tests.flac_writer import (  # noqa: F401
    BitWriter, rice_write, flac_stream, _subframe_header)


def test_verbatim_and_constant():
    rng = np.random.default_rng(0)
    samples = rng.integers(-2000, 2000, 32).astype(np.int64)

    def frame0(bw, bs):
        _subframe_header(bw, 1)             # verbatim
        for s in samples:
            bw.write_signed(int(s), 16)

    def frame1(bw, bs):
        _subframe_header(bw, 0)             # constant
        bw.write_signed(777, 16)

    data = flac_stream([(32, 0, frame0), (32, 0, frame1)], total=64)
    pcm, sr = native.decode_flac(data)
    assert sr == 16000 and len(pcm) == 64
    np.testing.assert_allclose(pcm[:32], samples / 32768.0, atol=1e-6)
    np.testing.assert_allclose(pcm[32:], 777 / 32768.0, atol=1e-6)


def test_fixed_order2_rice():
    # smooth signal so 2nd differences are small
    n = 64
    t = np.arange(n)
    samples = np.round(1000 * np.sin(2 * np.pi * t / 32)).astype(np.int64)
    # fixed order-2 residual: e_i = x_i - 2x_{i-1} + x_{i-2}
    resid = [int(samples[i] - 2 * samples[i - 1] + samples[i - 2])
             for i in range(2, n)]

    def frame(bw, bs):
        _subframe_header(bw, 8 + 2)          # fixed, order 2
        bw.write_signed(int(samples[0]), 16)
        bw.write_signed(int(samples[1]), 16)
        rice_write(bw, resid, param=6)

    pcm, sr = native.decode_flac(flac_stream([(n, 0, frame)], total=n))
    np.testing.assert_allclose(pcm, samples / 32768.0, atol=1e-6)


def test_lpc_order2_rice():
    n = 64
    rng = np.random.default_rng(1)
    samples = np.cumsum(rng.integers(-50, 50, n)).astype(np.int64)
    # LPC: coef = [3, -1], shift = 1 -> pred_i = (3x_{i-1} - x_{i-2}) >> 1
    coef, shift, precision = [3, -1], 1, 6
    resid = []
    for i in range(2, n):
        pred = (coef[0] * samples[i - 1] + coef[1] * samples[i - 2]) >> shift
        resid.append(int(samples[i] - pred))

    def frame(bw, bs):
        _subframe_header(bw, 32 + (2 - 1))    # LPC, order 2
        bw.write_signed(int(samples[0]), 16)
        bw.write_signed(int(samples[1]), 16)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(c, precision)
        rice_write(bw, resid, param=7)

    pcm, sr = native.decode_flac(flac_stream([(n, 0, frame)], total=n))
    np.testing.assert_allclose(pcm, samples / 32768.0, atol=1e-6)


def test_mid_side_stereo():
    n = 32
    rng = np.random.default_rng(2)
    left = rng.integers(-5000, 5000, n).astype(np.int64)
    right = rng.integers(-5000, 5000, n).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right

    def frame(bw, bs):
        _subframe_header(bw, 1)               # mid, verbatim, 16 bits
        for s in mid:
            bw.write_signed(int(s), 16)
        _subframe_header(bw, 1)               # side, verbatim, 17 bits
        for s in side:
            bw.write_signed(int(s), 17)

    data = flac_stream([(n, 10, frame)], channels=2, total=n)
    pcm, sr = native.decode_flac(data)
    want = (left + right) / 2.0 / 32768.0
    np.testing.assert_allclose(pcm, want, atol=1e-6)


def test_left_side_and_right_side():
    n = 16
    rng = np.random.default_rng(3)
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    side = left - right

    def ls_frame(bw, bs):
        _subframe_header(bw, 1)
        for s in left:
            bw.write_signed(int(s), 16)
        _subframe_header(bw, 1)
        for s in side:
            bw.write_signed(int(s), 17)

    def rs_frame(bw, bs):
        _subframe_header(bw, 1)
        for s in side:
            bw.write_signed(int(s), 17)
        _subframe_header(bw, 1)
        for s in right:
            bw.write_signed(int(s), 16)

    want = (left + right) / 2.0 / 32768.0
    pcm, _ = native.decode_flac(
        flac_stream([(n, 8, ls_frame)], channels=2, total=n))
    np.testing.assert_allclose(pcm, want, atol=1e-6)
    pcm, _ = native.decode_flac(
        flac_stream([(n, 9, rs_frame)], channels=2, total=n))
    np.testing.assert_allclose(pcm, want, atol=1e-6)


def test_load_audio_flac_path(tmp_path):
    samples = np.round(3000 * np.sin(2 * np.pi * np.arange(48) / 24)) \
        .astype(np.int64)

    def frame(bw, bs):
        _subframe_header(bw, 1)
        for s in samples:
            bw.write_signed(int(s), 16)

    p = tmp_path / "x.flac"
    p.write_bytes(flac_stream([(48, 0, frame)], total=48))
    from generative_audio_tpu.data.audio_io import load_audio
    out = load_audio(p, sr=16000)
    np.testing.assert_allclose(out, samples / 32768.0, atol=1e-6)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        native.decode_flac(b"not a flac stream")


def test_multi_partition_rice2_and_escape():
    """Partition order 2 + 5-bit Rice2 params + one escaped (raw) partition —
    the residual layouts libFLAC emits at block size 4096."""
    n = 64
    rng = np.random.default_rng(4)
    samples = np.cumsum(rng.integers(-20, 20, n)).astype(np.int64)
    resid = [int(samples[i] - samples[i - 1]) for i in range(1, n)]  # order 1

    def frame(bw, bs):
        _subframe_header(bw, 8 + 1)            # fixed, order 1
        bw.write_signed(int(samples[0]), 16)
        bw.write(1, 2)                         # method 1: rice2 (5-bit)
        bw.write(2, 4)                         # partition order 2 -> 4 parts
        part = n >> 2                          # 16 samples per partition
        idx = 0
        for p in range(4):
            count = part - (1 if p == 0 else 0)
            chunk = resid[idx:idx + count]
            idx += count
            if p == 1:                         # escaped partition: raw 12-bit
                bw.write(31, 5)
                bw.write(12, 5)
                for x in chunk:
                    bw.write_signed(x, 12)
            else:
                bw.write(5, 5)
                for x in chunk:
                    u = 2 * x if x >= 0 else -2 * x - 1
                    bw.write_unary(u >> 5)
                    bw.write(u & 31, 5)

    pcm, _ = native.decode_flac(flac_stream([(n, 0, frame)], total=n))
    np.testing.assert_allclose(pcm, samples / 32768.0, atol=1e-6)


def test_wasted_bits():
    """Samples with w low zero bits are coded shifted with a wasted-bits
    marker (unary w-1 after a 1 flag)."""
    n = 16
    samples = (np.arange(n, dtype=np.int64) - 8) * 8  # 3 low zero bits
    w = 3

    def frame(bw, bs):
        bw.write(0, 1)
        bw.write(1, 6)                         # verbatim
        bw.write(1, 1)                         # wasted-bits flag
        bw.write_unary(w - 1)                  # unary(w-1): w = 3
        for s in samples:
            bw.write_signed(int(s) >> w, 16 - w)

    pcm, _ = native.decode_flac(flac_stream([(n, 0, frame)], total=n))
    np.testing.assert_allclose(pcm, samples / 32768.0, atol=1e-6)


def test_multibyte_frame_number_and_16bit_blocksize():
    """Frame indices >= 128 use 2-byte UTF-8 coding; block size code 7 puts a
    16-bit (size-1) at the header end. 130 one-sample... use several small
    frames to push the index past 127? Instead: encode the frame number
    directly with the 2-byte form for a single frame."""
    n = 300  # needs the 16-bit block size path

    samples = np.round(2000 * np.sin(2 * np.pi * np.arange(n) / 50)) \
        .astype(np.int64)

    out = bytearray(b"fLaC")
    bw = BitWriter()
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(16, 16)
    bw.write(65535, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(16000, 20)
    bw.write(0, 3)
    bw.write(15, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)
    out += bw.bytes

    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)                             # 16-bit block size at end
    bw.write(0, 4)
    bw.write(0, 4)
    bw.write(0, 3)
    bw.write(0, 1)
    frame_no = 200                             # 2-byte UTF-8: 0xC3 0x88
    bw.write(0xC0 | (frame_no >> 6), 8)
    bw.write(0x80 | (frame_no & 0x3F), 8)
    bw.write(n - 1, 16)
    bw.write(0, 8)                             # CRC-8
    _subframe_header(bw, 1)
    for s in samples:
        bw.write_signed(int(s), 16)
    bw.align()
    bw.write(0, 16)
    out += bw.bytes

    pcm, sr = native.decode_flac(bytes(out))
    assert len(pcm) == n
    np.testing.assert_allclose(pcm, samples / 32768.0, atol=1e-6)
