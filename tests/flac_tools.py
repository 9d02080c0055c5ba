"""Tiny FLAC *encoder* used only to produce test fixtures for the in-tree
native decoder (native/flac_decoder.cpp).  Supports 16-bit PCM, VERBATIM /
CONSTANT / FIXED-order-2+Rice subframes, and independent / left-side /
right-side / mid-side stereo.  CRC fields are written as zeros (the decoder
does not verify them)."""

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _streaminfo(sr: int, ch: int, bps: int, total: int) -> bytes:
    w = BitWriter()
    w.write(1, 1)          # last metadata block
    w.write(0, 7)          # type STREAMINFO
    w.write(34, 24)        # length
    w.write(4096, 16)      # min blocksize
    w.write(4096, 16)      # max blocksize
    w.write(0, 24)         # min framesize (unknown)
    w.write(0, 24)         # max framesize
    w.write(sr, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    for _ in range(16):
        w.write(0, 8)      # MD5 (unverified)
    return w.getvalue()


def _utf8_number(w: BitWriter, n: int):
    assert n < 128, "fixture encoder supports < 128 frames"
    w.write(n, 8)


def _write_verbatim(w: BitWriter, x: np.ndarray, bps: int):
    w.write(0, 1)
    w.write(1, 6)          # VERBATIM
    w.write(0, 1)          # no wasted bits
    for v in x:
        w.write_signed(int(v), bps)


def _write_constant(w: BitWriter, x: np.ndarray, bps: int):
    assert np.all(x == x[0])
    w.write(0, 1)
    w.write(0, 6)          # CONSTANT
    w.write(0, 1)
    w.write_signed(int(x[0]), bps)


def _write_fixed2_rice(w: BitWriter, x: np.ndarray, bps: int, param: int = 6):
    """FIXED order-2 predictor with a single 4-bit Rice partition."""
    assert len(x) > 2
    w.write(0, 1)
    w.write(10, 6)         # FIXED, order 2
    w.write(0, 1)
    x64 = x.astype(np.int64)
    w.write_signed(int(x64[0]), bps)
    w.write_signed(int(x64[1]), bps)
    resid = x64[2:] - (2 * x64[1:-1] - x64[:-2])
    w.write(0, 2)          # residual method: 4-bit Rice
    w.write(0, 4)          # partition order 0
    w.write(param, 4)
    for v in resid:
        u = int((v << 1) ^ (v >> 63))
        w.write_unary(u >> param)
        w.write(u & ((1 << param) - 1), param)


def encode_flac(samples: np.ndarray, sr: int, *, subframe: str = "verbatim",
                stereo_mode: str = "independent", blocksize: int = 4096,
                total_in_streaminfo: bool = True) -> bytes:
    """samples: (n,) or (n, ch) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    bps = 16
    out = bytearray(b"fLaC")
    out += _streaminfo(sr, ch, bps, n if total_in_streaminfo else 0)

    writers = {"verbatim": _write_verbatim, "constant": _write_constant,
               "fixed2": _write_fixed2_rice}
    write_sub = writers[subframe]

    frame_idx = 0
    for start in range(0, n, blocksize):
        block = samples[start: start + blocksize].astype(np.int64)
        bn = len(block)
        w = BitWriter()
        w.write(0x3FFE, 14)    # sync
        w.write(0, 1)          # reserved
        w.write(0, 1)          # fixed blocksize strategy
        w.write(7, 4)          # blocksize: 16 bit at end
        w.write(0, 4)          # sample rate: from STREAMINFO
        if ch == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
            w.write(code, 4)
        else:
            w.write(ch - 1, 4)
        w.write(4, 3)          # sample size 16-bit
        w.write(0, 1)          # reserved
        _utf8_number(w, frame_idx)
        w.write(bn - 1, 16)    # blocksize-1
        w.write(0, 8)          # CRC-8 (zeros)

        if ch == 2 and stereo_mode != "independent":
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans, widths = [left, side], [bps, bps + 1]
            elif stereo_mode == "right_side":
                chans, widths = [side, right], [bps + 1, bps]
            else:  # mid_side
                mid = (left + right) >> 1
                chans, widths = [mid, side], [bps, bps + 1]
            for cx, cw in zip(chans, widths):
                write_sub(w, cx, cw)
        else:
            for c in range(ch):
                write_sub(w, block[:, c], bps)
        w.align()
        w.write(0, 16)         # CRC-16 (zeros)
        out += w.getvalue()
        frame_idx += 1
    return bytes(out)
