"""Minimal from-scratch FLAC encoder for tests (verbatim/constant/fixed/
LPC subframes, Rice residuals, stereo modes). Spec-compliant streams for
exercising the native decoder without libFLAC."""
import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)


def rice_write(bw: BitWriter, residuals, param: int):
    bw.write(0, 2)       # method 0 (4-bit rice)
    bw.write(0, 4)       # partition order 0
    bw.write(param, 4)
    for x in residuals:
        u = 2 * x if x >= 0 else -2 * x - 1
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def flac_stream(frames, sr=16000, channels=1, bps=16, total=0):
    """frames: list of callables(bw, block_size) writing the subframes."""
    out = bytearray(b"fLaC")
    bw = BitWriter()
    bw.write(1, 1)          # last metadata block
    bw.write(0, 7)          # STREAMINFO
    bw.write(34, 24)
    bw.write(16, 16)        # min block size
    bw.write(65535, 16)     # max block size
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sr, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    for _ in range(16):
        bw.write(0, 8)
    out += bw.bytes

    for idx, (block_size, ch_code, write_subframes) in enumerate(frames):
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)       # reserved
        bw.write(0, 1)       # fixed blocking
        bs_code = 6 if block_size <= 256 else 7   # 8- or 16-bit size at end
        bw.write(bs_code, 4)
        bw.write(0, 4)       # sample rate: from streaminfo
        bw.write(ch_code, 4)
        bw.write(0, 3)       # sample size: from streaminfo
        bw.write(0, 1)       # reserved
        assert idx < 128
        bw.write(idx, 8)     # UTF-8 frame number (single byte)
        bw.write(block_size - 1, 8 if bs_code == 6 else 16)
        bw.write(0, 8)       # CRC-8 (decoder skips)
        write_subframes(bw, block_size)
        bw.align()
        bw.write(0, 16)      # CRC-16 (decoder skips)
        out += bw.bytes
    return bytes(out)


def _subframe_header(bw, type_bits):
    bw.write(0, 1)
    bw.write(type_bits, 6)
    bw.write(0, 1)  # no wasted bits
