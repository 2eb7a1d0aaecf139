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


# frame-header block-size codes with an implied size (no trailing field):
# code 1 -> 192; codes 2-5 -> 576 << (c-2); codes 8-15 -> 256 << (c-8)
BS_CODE_TABLE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                 256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                 8192: 13, 16384: 14, 32768: 15}
# frame-header sample-size codes overriding STREAMINFO bps
SS_CODE_TABLE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def flac_stream(frames, sr=16000, channels=1, bps=16, total=0,
                ss_code=0, use_bs_table=False):
    """frames: list of (block_size, ch_code, callable(bw, block_size))
    writing the subframes.

    ss_code: frame-header sample-size code (0 = take bps from STREAMINFO;
    see SS_CODE_TABLE). use_bs_table: encode the block size with an
    implied-size code from BS_CODE_TABLE instead of the 8/16-bit
    size-at-end forms."""
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
        if use_bs_table:
            bs_code = BS_CODE_TABLE[block_size]
        else:
            bs_code = 6 if block_size <= 256 else 7  # 8/16-bit size at end
        bw.write(bs_code, 4)
        bw.write(0, 4)       # sample rate: from streaminfo
        bw.write(ch_code, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)       # reserved
        assert idx < 128
        bw.write(idx, 8)     # UTF-8 frame number (single byte)
        if bs_code == 6:
            bw.write(block_size - 1, 8)
        elif bs_code == 7:
            bw.write(block_size - 1, 16)
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
