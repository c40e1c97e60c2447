"""Minimal pure-Python FLAC *encoder* used only by tests.

Exists so the repo's suite can exercise every path of the native decoder
(diarizen_tpu/core/_flac/flacdec.cpp) without shipping binary fixtures or
depending on ffmpeg/libFLAC (absent from the image): tests synthesize known
samples, encode them here, and assert the decoder returns them bit-exactly.

Covers the encode-side of everything the decoder claims to support:
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, rice + rice2 residual
partitions (any partition order) incl. escape (raw) partitions, wasted bits,
stereo assignments independent / left-side / right-side / mid-side, all
block-size header codes, UTF-8 coded frame numbers, CRC-8/CRC-16.

Format reference: https://xiph.org/flac/format.html (public spec).
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, k: int) -> None:
        value &= (1 << k) - 1
        self.acc = (self.acc << k) | value
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, k: int) -> None:
        self.write(value & ((1 << k) - 1), k)

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = 2
    while n >= (1 << (5 * b + 1)):
        b += 1
    out = bytearray()
    prefix = (0xFF << (8 - b)) & 0xFF
    out.append(prefix | ((n >> (6 * (b - 1))) & ((1 << (7 - b)) - 1)))
    for i in range(1, b):
        out.append(0x80 | ((n >> (6 * (b - 1 - i))) & 0x3F))
    return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else (v << 1) ^ -1


def _write_residual(
    bw: BitWriter,
    resid: list,
    blocksize: int,
    pred_order: int,
    method: int = 0,
    porder: int = 0,
    escape: bool = False,
) -> None:
    assert method in (0, 1)
    plen = 4 if method == 0 else 5
    esc_code = 0xF if method == 0 else 0x1F
    bw.write(method, 2)
    bw.write(porder, 4)
    parts = 1 << porder
    assert blocksize % parts == 0, "blocksize must divide by partitions"
    assert (blocksize >> porder) >= pred_order
    idx = 0
    for p in range(parts):
        count = (blocksize >> porder) - (pred_order if p == 0 else 0)
        vals = [int(v) for v in resid[idx : idx + count]]
        idx += count
        if escape:
            raw = max((v.bit_length() + 1 for v in vals), default=0)
            if all(v == 0 for v in vals):
                raw = 0
            bw.write(esc_code, plen)
            bw.write(raw, 5)
            for v in vals:
                if raw:
                    bw.write_signed(v, raw)
        else:
            u = [_zigzag(v) for v in vals]
            param = max(0, max((x.bit_length() for x in u), default=0) - 4)
            param = min(param, esc_code - 1)
            bw.write(param, plen)
            for x in u:
                bw.write_unary(x >> param)
                if param:
                    bw.write(x & ((1 << param) - 1), param)
    assert idx == blocksize - pred_order


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, spec: dict) -> None:
    kind = spec.get("kind", "verbatim")
    wasted = spec.get("wasted", 0)
    blocksize = len(x)
    bw.write(0, 1)  # pad
    if kind == "constant":
        type_code = 0
    elif kind == "verbatim":
        type_code = 1
    elif kind == "fixed":
        type_code = 8 + spec.get("order", 2)
    elif kind == "lpc":
        type_code = 32 + (spec.get("order", 2) - 1)
    else:
        raise ValueError(kind)
    bw.write(type_code, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
        assert all(int(v) % (1 << wasted) == 0 for v in x), "samples must have wasted LSBs"
        x = np.asarray([int(v) >> wasted for v in x], dtype=np.int64)
        bps -= wasted
    else:
        bw.write(0, 1)

    xs = [int(v) for v in x]
    if kind == "constant":
        assert all(v == xs[0] for v in xs)
        bw.write_signed(xs[0], bps)
    elif kind == "verbatim":
        for v in xs:
            bw.write_signed(v, bps)
    elif kind == "fixed":
        order = spec.get("order", 2)
        coefs = _FIXED_COEFS[order]
        for v in xs[:order]:
            bw.write_signed(v, bps)
        resid = [
            xs[i] - sum(c * xs[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residual(
            bw, resid, blocksize, order,
            method=spec.get("method", 0), porder=spec.get("porder", 0),
            escape=spec.get("escape", False),
        )
    else:  # lpc
        order = spec.get("order", 2)
        shift = spec.get("shift", 5)
        coefs = spec.get("coefs")
        if coefs is None:  # arbitrary deterministic coefficients are valid
            coefs = [((i * 37 + 11) % 61) - 30 for i in range(order)]
        precision = max(max(int(c).bit_length() + 1 for c in coefs), 2)
        assert precision <= 14
        for v in xs[:order]:
            bw.write_signed(v, bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(int(c), precision)
        resid = []
        for i in range(order, blocksize):
            acc = sum(int(c) * xs[i - 1 - j] for j, c in enumerate(coefs))
            resid.append(xs[i] - (acc >> shift))
        _write_residual(
            bw, resid, blocksize, order,
            method=spec.get("method", 0), porder=spec.get("porder", 0),
            escape=spec.get("escape", False),
        )


_BS_FIXED_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                   8192: 13, 16384: 14, 32768: 15}


def _encode_frame(
    frame: np.ndarray,  # (channels, blocksize) int64, original L/R domain
    frame_idx: int,
    bps: int,
    stereo: str,
    specs: list,
    bs_mode: str = "auto",
) -> bytes:
    nch, blocksize = frame.shape
    if stereo == "independent" or nch != 2:
        ch_code = nch - 1
        chans = [frame[c] for c in range(nch)]
        chan_bps = [bps] * nch
    else:
        left = frame[0].astype(np.int64)
        right = frame[1].astype(np.int64)
        side = left - right
        if stereo == "left_side":
            ch_code, chans, chan_bps = 8, [left, side], [bps, bps + 1]
        elif stereo == "right_side":
            ch_code, chans, chan_bps = 9, [side, right], [bps + 1, bps]
        elif stereo == "mid_side":
            mid = (left + right) >> 1
            ch_code, chans, chan_bps = 10, [mid, side], [bps, bps + 1]
        else:
            raise ValueError(stereo)

    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking
    if bs_mode == "auto" and blocksize in _BS_FIXED_CODES:
        bs_code, bs_extra = _BS_FIXED_CODES[blocksize], None
    elif blocksize <= 256:
        bs_code, bs_extra = 6, (blocksize - 1, 8)
    else:
        bs_code, bs_extra = 7, (blocksize - 1, 16)
    bw.write(bs_code, 4)
    bw.write(0, 4)  # sample rate: from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(0, 3)  # sample size: from STREAMINFO
    bw.write(0, 1)  # reserved
    for byte in utf8_number(frame_idx):
        bw.write(byte, 8)
    if bs_extra is not None:
        bw.write(*bs_extra)
    bw.write(crc8(bytes(bw.buf)), 8)

    for c in range(len(chans)):
        _write_subframe(bw, chans[c], chan_bps[c], specs[c % len(specs)])
    bw.align()
    bw.write(crc16(bytes(bw.buf)), 16)
    return bw.getvalue()


def encode_flac(
    x: np.ndarray,  # (channels, samples) integer samples at `bps`
    sample_rate: int,
    bps: int = 16,
    blocksize: int = 4096,
    stereo: str = "independent",
    specs=None,  # per-channel subframe spec dicts (cycled)
    bs_mode: str = "auto",
    extra_metadata: bool = False,
    trailing: bytes = b"",
) -> bytes:
    x = np.asarray(x, dtype=np.int64)
    if x.ndim == 1:
        x = x[None]
    nch, total = x.shape
    if specs is None:
        specs = [{"kind": "verbatim"}]

    si = BitWriter()
    si.write(min(blocksize, total), 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.write(0, 128)  # md5: unused by the decoder
    body = si.getvalue()
    assert len(body) == 34

    out = bytearray(b"fLaC")
    last = not extra_metadata
    out += bytes([(0x80 if last else 0x00) | 0x00]) + len(body).to_bytes(3, "big")
    out += body
    if extra_metadata:  # a skipped PADDING block, last-flag set
        out += bytes([0x80 | 0x01]) + (16).to_bytes(3, "big") + bytes(16)

    idx = 0
    start = 0
    while start < total:
        stop = min(start + blocksize, total)
        out += _encode_frame(x[:, start:stop], idx, bps, stereo, specs, bs_mode)
        idx += 1
        start = stop
    out += trailing
    return bytes(out)
