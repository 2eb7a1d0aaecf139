"""Regenerate the committed golden FLAC streams + expected PCM.

Run from the repo root:
    python tests/golden/gen_flac_golden.py

The goldens pin BOTH the test encoder (byte hash) and the native decoder
(expected PCM): any drift in either fails test_golden_flac_streams. The
expected PCM here is derived with plain numpy from the integer sample
values — NOT by running the decoder — so the goldens encode intent, not
current behavior.
"""
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from tests.flac_writer import (  # noqa: E402
    flac_stream, rice_write, _subframe_header)

OUT = Path(__file__).parent


def verbatim(samples, bits):
    def w(bw, bs):
        _subframe_header(bw, 1)
        for s in samples:
            bw.write_signed(int(s), bits)
    return w


def golden_16():
    """Stereo 16-bit: every stereo assignment + verbatim/constant/fixed
    subframes + wasted bits, 5 frames x 32 samples."""
    rng = np.random.default_rng(2024)
    n = 32
    frames, mono = [], []

    # frame 1: independent stereo, verbatim
    l1 = rng.integers(-6000, 6000, n).astype(np.int64)
    r1 = rng.integers(-6000, 6000, n).astype(np.int64)

    def f1(bw, bs):
        verbatim(l1, 16)(bw, bs)
        verbatim(r1, 16)(bw, bs)
    frames.append((n, 1, f1))
    mono.append((l1 + r1) / 2.0)

    # frame 2: independent stereo, constant subframes
    def f2(bw, bs):
        _subframe_header(bw, 0)
        bw.write_signed(-1234, 16)
        _subframe_header(bw, 0)
        bw.write_signed(4321, 16)
    frames.append((n, 1, f2))
    mono.append(np.full(n, (-1234 + 4321) / 2.0))

    # frame 3: mid/side, verbatim (side is 17-bit)
    l3 = rng.integers(-8000, 8000, n).astype(np.int64)
    r3 = rng.integers(-8000, 8000, n).astype(np.int64)
    mid, side = (l3 + r3) >> 1, l3 - r3

    def f3(bw, bs):
        verbatim(mid, 16)(bw, bs)
        verbatim(side, 17)(bw, bs)
    frames.append((n, 10, f3))
    mono.append((l3 + r3) / 2.0)

    # frame 4: left/side; left is fixed order-2 + rice, side verbatim
    t = np.arange(n)
    l4 = np.round(3000 * np.sin(2 * np.pi * t / 16)).astype(np.int64)
    r4 = rng.integers(-3000, 3000, n).astype(np.int64)
    side4 = l4 - r4
    resid = [int(l4[i] - 2 * l4[i - 1] + l4[i - 2]) for i in range(2, n)]

    def f4(bw, bs):
        _subframe_header(bw, 8 + 2)
        bw.write_signed(int(l4[0]), 16)
        bw.write_signed(int(l4[1]), 16)
        rice_write(bw, resid, param=7)
        verbatim(side4, 17)(bw, bs)
    frames.append((n, 8, f4))
    mono.append((l4 + r4) / 2.0)

    # frame 5: right/side, verbatim; right channel has 2 wasted bits
    r5 = (rng.integers(-2000, 2000, n) * 4).astype(np.int64)  # 2 low zeros
    l5 = rng.integers(-5000, 5000, n).astype(np.int64)
    side5 = l5 - r5

    def f5(bw, bs):
        verbatim(side5, 17)(bw, bs)
        bw.write(0, 1)
        bw.write(1, 6)            # verbatim
        bw.write(1, 1)            # wasted-bits flag
        bw.write_unary(2 - 1)     # w = 2
        for s in r5:
            bw.write_signed(int(s) >> 2, 16 - 2)
    frames.append((n, 9, f5))
    mono.append((l5 + r5) / 2.0)

    data = flac_stream(frames, channels=2, total=len(frames) * n)
    expected = np.concatenate(mono) / 32768.0
    return data, expected


def golden_24():
    """Mono 24-bit: LPC order 4 with Rice2 partitions incl. one escaped."""
    rng = np.random.default_rng(4048)
    n = 64
    x = np.cumsum(rng.integers(-40000, 40000, n)).astype(np.int64)
    coef, shift, precision = [3, -3, 1, 0], 1, 6
    resid = []
    for i in range(4, n):
        pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coef)) >> shift
        resid.append(int(x[i]) - pred)

    def frame(bw, bs):
        _subframe_header(bw, 32 + (4 - 1))
        for s in x[:4]:
            bw.write_signed(int(s), 24)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(c, precision)
        # Rice2 (method 1), partition order 1 -> 2 partitions of 32
        bw.write(1, 2)
        bw.write(1, 4)
        idx = 0
        for p in range(2):
            count = 32 - (4 if p == 0 else 0)
            chunk = resid[idx:idx + count]
            idx += count
            if p == 1:            # escaped raw partition
                bits = max(int(np.ceil(np.log2(
                    max(1, max(abs(v) for v in chunk)) + 1))) + 1, 4)
                bw.write(31, 5)
                bw.write(bits, 5)
                for v in chunk:
                    bw.write_signed(v, bits)
            else:
                bw.write(16, 5)
                for v in chunk:
                    u = 2 * v if v >= 0 else -2 * v - 1
                    bw.write_unary(u >> 16)
                    bw.write(u & 0xFFFF, 16)

    data = flac_stream([(n, 0, frame)], bps=24, total=n)
    expected = x / float(1 << 23)
    return data, expected


def main():
    meta = {}
    for name, (data, expected) in {
            "flac_golden_16.flac": golden_16(),
            "flac_golden_24.flac": golden_24()}.items():
        (OUT / name).write_bytes(data)
        meta[name] = {
            "sha256": hashlib.sha256(data).hexdigest(),
            "sample_rate": 16000,
            "expected_pcm": [float(v) for v in expected],
        }
    (OUT / "flac_golden.json").write_text(json.dumps(meta, indent=1))
    print("wrote", ", ".join(meta), f"({sum(len(m['expected_pcm']) for m in meta.values())} samples)")


if __name__ == "__main__":
    main()
