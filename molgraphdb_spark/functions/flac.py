"""Pure-Python FLAC codec (subset) — the compressed-AUDIO leg of the
multimodal decode boundary.

FLAC is the canonical losslessly-compressed audio format; unlike the
DEFLATE family (PNG) and the DCT/Huffman family (JPEG) it entropy-codes
with RICE codes over fixed-linear-predictor residuals — a third,
genuinely different compression family, implemented here from the
public spec (xiph.org / RFC 9639) with no libraries at all: bit-level
reader/writer, frame-header sync parsing, UTF-8-style frame numbers,
CRC-8 (poly 0x07) over headers, CRC-16 (poly 0x8005) over frames, the
STREAMINFO MD5 integrity check over the decoded samples, constant /
verbatim / fixed-predictor (orders 0–4) subframes, and partitioned
Rice residuals with the 4-bit-parameter escape.

Because FLAC is LOSSLESS, decode∘encode is bit-exact for EVERY input —
no exactness-class argument needed (the PNG situation, not the JPEG
one) — so ``mm_decoded_flac``'s DuckDB oracle recomputes features
closed-form from the document bytes while the samples travel through
real Rice bitstreams and real CRC/MD5 integrity checks.

Envelope (everything else is a loud ValueError): mono, 16-bit,
fixed-blocksize strategy, Rice method 0, subframe types constant /
verbatim / fixed — LPC subframes, stereo decorrelation, wasted bits
and other sample widths are rejected, mirroring the tight-envelope +
loud-rejection discipline of the PPM/WAV/PNG/JPEG codecs. The
remaining documented boundary is lossy perceptual coding (MP3/H.264).

Reference counterpart: the reference's only media-decode analogue is
its render pipeline (reference mcs.py:349-687) — bytes in, typed
samples out.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

#: Fixed predictor coefficients per order: prediction = Σ c_j·x[i-1-j].
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

#: Encoder block size (samples per frame).
BLOCK_SIZE = 4096


def crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC
    frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the
    FLAC whole-frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    """MSB-first bit accumulator (no byte stuffing — FLAC has none)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero-bits terminated by a one-bit.
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    """MSB-first bit reader with a unary fast path."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos          # next byte index
        self.acc = 0
        self.nbits = 0

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("FLAC bitstream exhausted in unary code")
                # fast path: whole zero bytes count 8 at a time
                while self.data[self.pos] == 0:
                    q += 8
                    self.pos += 1
                    if self.pos >= len(self.data):
                        raise ValueError("FLAC bitstream exhausted in unary code")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            while self.nbits:
                self.nbits -= 1
                if (self.acc >> self.nbits) & 1:
                    self.acc &= (1 << self.nbits) - 1
                    return q
                q += 1
            self.acc = 0

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length frame-number coding (extends
    real UTF-8 up to 36 bits / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    out.append(lead_mask | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


def _utf8_decode(r: "_BitReader") -> int:
    b0 = r.read_bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"invalid FLAC UTF-8 frame-number lead byte {b0:#x}")
    val = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read_bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError(f"invalid FLAC UTF-8 continuation byte {b:#x}")
        val = (val << 6) | (b & 0x3F)
    return val


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    res = x.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


def encode_flac(sample_rate: int, samples: "np.ndarray", rice_cap: int = 14) -> bytes:
    """Serialize 16-bit mono PCM as a FLAC file (subset): STREAMINFO
    with the spec's MD5 of the raw samples, then fixed-blocksize frames
    whose subframes pick the cheapest of constant / fixed order 0-2
    with partition-order-0 Rice residuals, escaping to verbatim
    residuals when Rice costs more bits. Real compression: smooth
    signals shrink ~8x, constants ~150x, white noise stays ~1:1.
    ``rice_cap`` bounds the Rice parameter (spec max 14 for the 4-bit
    method); lowering it makes Rice deliberately lossy-of-bits so the
    escape path is exercised by real files in tests."""
    s = np.asarray(samples, dtype=np.int64)
    if s.size and (s.max() > 32767 or s.min() < -32768):
        raise ValueError("samples out of int16 range")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"invalid sample rate {sample_rate}")
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    n_total = int(s.size)

    # ---- STREAMINFO (the only metadata block; is_last set) ----
    si = _BitWriter()
    si.write(BLOCK_SIZE, 16)             # min blocksize
    si.write(BLOCK_SIZE, 16)             # max blocksize
    si.write(0, 24)                      # min framesize unknown
    si.write(0, 24)                      # max framesize unknown
    si.write(sample_rate, 20)
    si.write(0, 3)                       # channels - 1 (mono)
    si.write(15, 5)                      # bits per sample - 1 (16)
    si.write(n_total, 36)
    streaminfo = bytes(si.out) + md5
    out = bytearray(_MAGIC)
    out += bytes([0x80, 0, 0, len(streaminfo)])  # is_last | STREAMINFO
    out += streaminfo

    for fi, start in enumerate(range(0, n_total, BLOCK_SIZE)):
        blk = s[start : start + BLOCK_SIZE]
        bs = int(blk.size)
        w = _BitWriter()
        w.write(0b11111111111110, 14)    # sync
        w.write(0, 1)                    # reserved
        w.write(0, 1)                    # blocking strategy: fixed
        w.write(0b0111, 4)               # blocksize: 16-bit value follows
        w.write(0b0000, 4)               # sample rate: from STREAMINFO
        w.write(0b0000, 4)               # channels: mono
        w.write(0b100, 3)                # sample size: 16-bit
        w.write(0, 1)                    # reserved
        for b in _utf8_code(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        header = bytes(w.out)
        w.write(crc8(header), 8)

        # ---- one mono subframe ----
        if np.all(blk == blk[0]):
            w.write(0, 1)
            w.write(0b000000, 6)         # constant
            w.write(0, 1)                # no wasted bits
            w.write(int(blk[0]) & 0xFFFF, 16)
        else:
            best = None
            for order in (0, 1, 2):
                if bs <= order:
                    continue
                res = _fixed_residual(blk, order)
                cost = int(np.abs(res).sum())
                if best is None or cost < best[1]:
                    best = (order, cost, res)
            order, _, res = best
            w.write(0, 1)
            w.write(0b001000 | order, 6)  # fixed, order
            w.write(0, 1)                 # no wasted bits
            for v in blk[:order]:         # warmup samples, raw
                w.write(int(v) & 0xFFFF, 16)
            w.write(0b00, 2)              # residual method: RICE (4-bit)
            w.write(0, 4)                 # partition order 0
            u = (res << 1) ^ (res >> 63)  # zigzag (negatives -> odd)
            mean = int(u.mean()) if u.size else 0
            p = 0
            while (1 << (p + 1)) < mean + 1 and p < rice_cap:
                p += 1
            # escape to verbatim residuals when Rice loses (p is capped
            # at 14, so Rice-hostile blocks — e.g. full-range
            # alternation — genuinely cost more than raw bits)
            maxbits = int(u.max()).bit_length() + 1 if u.size else 1
            rice_cost = int((u >> p).sum()) + u.size * (p + 1)
            if u.size * maxbits + 5 < rice_cost:
                w.write(0b1111, 4)        # escape
                w.write(maxbits, 5)
                for v in res:
                    w.write(int(v) & ((1 << maxbits) - 1), maxbits)
            else:
                w.write(p, 4)
                for uv in u:
                    w.write_unary(int(uv) >> p)
                    if p:
                        w.write(int(uv) & ((1 << p) - 1), p)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def decode_flac(data: bytes) -> tuple[int, "np.ndarray"]:
    """Parse a FLAC file: returns (sample_rate, int16 samples).

    A genuine decode: magic check; metadata-block walk (STREAMINFO
    parsed bit-exactly, others length-skipped); then frame by frame —
    sync-code validation, header-field envelope checks, UTF-8 frame
    number, CRC-8 verification of the header, subframe dispatch
    (constant / verbatim / fixed 0-4), partitioned Rice residual
    decode including the escape code, fixed-prediction reconstruction,
    CRC-16 verification of the frame — and finally the STREAMINFO MD5
    check over ALL decoded samples (bit-level integrity end to end).
    Raises ValueError on anything malformed or outside the envelope
    (stereo, non-16-bit, LPC subframes, variable blocking, wasted
    bits, bad CRC/MD5)."""
    if data[:4] != _MAGIC:
        raise ValueError(f"not a FLAC file (magic {data[:4]!r})")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("FLAC metadata block truncated")
        if hdr & 0x7F == 0:
            if blen != 34:
                raise ValueError(f"STREAMINFO length {blen} != 34")
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read_bits(16)  # min blocksize
    r.read_bits(16)  # max blocksize
    r.read_bits(24)
    r.read_bits(24)
    sample_rate = r.read_bits(20)
    channels = r.read_bits(3) + 1
    bps = r.read_bits(5) + 1
    n_total = r.read_bits(36)
    md5_expect = streaminfo[18:34]
    if sample_rate == 0:
        raise ValueError("STREAMINFO declares sample rate 0")
    if channels != 1 or bps != 16:
        raise ValueError(f"decoder supports mono 16-bit, got {channels}ch/{bps}-bit")

    # Plausibility cap BEFORE allocating: the 36-bit STREAMINFO total
    # is untrusted (a ~50-byte crafted file can declare 2^36 samples ≈
    # 512 GB of int64) and the "bitstream exhausted" ValueError only
    # fires after the reservation on some memory configurations
    # (ADVICE r11). A FLAC frame spans ≤ 65535 samples and costs ≥ 10
    # bytes (header + CRC-8 + smallest subframe + CRC-16), so the file
    # size bounds the carryable sample count at (⌊size/10⌋+1)·65535
    # (ADVICE r12: the old len·65536 bound was 10× looser than this,
    # its own derivation — a ≥1 MiB crafted file could still declare
    # the full 2^36).
    if n_total > (len(data) // 10 + 1) * 65535:
        raise ValueError(
            f"STREAMINFO declares {n_total} samples — implausible for a "
            f"{len(data)}-byte file"
        )
    out = np.empty(n_total, dtype=np.int64)
    got = 0
    fr = _BitReader(data, pos)
    while got < n_total:
        frame_start = fr.pos
        if fr.read_bits(14) != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        fr.read_bits(1)  # reserved
        if fr.read_bits(1) != 0:
            raise ValueError("variable-blocksize strategy unsupported")
        bs_code = fr.read_bits(4)
        sr_code = fr.read_bits(4)
        ch_code = fr.read_bits(4)
        ss_code = fr.read_bits(3)
        fr.read_bits(1)  # reserved
        if ch_code != 0:
            raise ValueError(f"decoder supports mono only (channel code {ch_code})")
        if ss_code != 0b100:
            raise ValueError(f"decoder supports 16-bit only (size code {ss_code})")
        _utf8_decode(fr)
        if bs_code == 0b0110:
            bs = fr.read_bits(8) + 1
        elif bs_code == 0b0111:
            bs = fr.read_bits(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif 0b1000 <= bs_code <= 0b1111:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 0b0000:
            pass  # from STREAMINFO
        elif sr_code in (0b1100, 0b1101, 0b1110):
            fr.read_bits(8 if sr_code == 0b1100 else 16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code 0b1111")
        # (other codes are fixed table rates; nothing to read)
        fr.align()
        header_crc = crc8(data[frame_start : fr.pos])
        if fr.read_bits(8) != header_crc:
            raise ValueError("frame header CRC-8 mismatch")

        # ---- subframe ----
        if fr.read_bits(1) != 0:
            raise ValueError("subframe padding bit set")
        stype = fr.read_bits(6)
        if fr.read_bits(1) != 0:
            raise ValueError("wasted-bits subframes unsupported")
        if stype == 0b000000:  # constant
            v = fr.read_bits(16)
            v -= 1 << 16 if v & 0x8000 else 0
            blk = np.full(bs, v, dtype=np.int64)
        elif stype == 0b000001:  # verbatim
            blk = np.empty(bs, dtype=np.int64)
            for i in range(bs):
                v = fr.read_bits(16)
                blk[i] = v - (1 << 16) if v & 0x8000 else v
        elif 0b001000 <= stype <= 0b001100:  # fixed, order 0-4
            order = stype & 0x07
            if bs <= order:
                raise ValueError(f"block size {bs} <= fixed order {order}")
            blk = np.empty(bs, dtype=np.int64)
            for i in range(order):
                v = fr.read_bits(16)
                blk[i] = v - (1 << 16) if v & 0x8000 else v
            method = fr.read_bits(2)
            if method not in (0, 1):
                raise ValueError(f"reserved residual method {method}")
            pbits = 4 if method == 0 else 5
            escape = (1 << pbits) - 1
            porder = fr.read_bits(4)
            n_part = 1 << porder
            if bs % n_part:
                raise ValueError(f"block size {bs} not divisible by {n_part} partitions")
            if (bs >> porder) <= order:
                raise ValueError("first Rice partition smaller than predictor order")
            res = np.empty(bs - order, dtype=np.int64)
            k = 0
            for part in range(n_part):
                cnt = (bs >> porder) - (order if part == 0 else 0)
                p = fr.read_bits(pbits)
                if p == escape:
                    vb = fr.read_bits(5)
                    for _ in range(cnt):
                        v = fr.read_bits(vb) if vb else 0
                        res[k] = v - (1 << vb) if vb and v & (1 << (vb - 1)) else v
                        k += 1
                else:
                    for _ in range(cnt):
                        u = (fr.read_unary() << p) | (fr.read_bits(p) if p else 0)
                        res[k] = (u >> 1) ^ -(u & 1)
                        k += 1
            coef = _FIXED_COEF[order]
            for i in range(order, bs):
                blk[i] = res[i - order] + sum(
                    c * blk[i - 1 - j] for j, c in enumerate(coef)
                )
        elif 0b100000 <= stype:
            raise ValueError("LPC subframes are outside the decoder envelope")
        else:
            raise ValueError(f"reserved subframe type {stype:#08b}")
        fr.align()
        frame_crc = crc16(data[frame_start : fr.pos])
        if fr.read_bits(16) != frame_crc:
            raise ValueError("frame CRC-16 mismatch")
        if got + bs > n_total:
            raise ValueError("frames carry more samples than STREAMINFO declares")
        out[got : got + bs] = blk
        got += bs
    if n_total and (out.max() > 32767 or out.min() < -32768):
        raise ValueError("decoded samples out of int16 range")
    samples = out.astype("<i2")
    if hashlib.md5(samples.tobytes()).digest() != md5_expect:
        raise ValueError("decoded audio fails the STREAMINFO MD5 integrity check")
    return sample_rate, samples


def flac_signal_features(data: bytes) -> tuple[int, int, int, int, int]:
    """Decode a FLAC file and compute integer-exact features from the
    DECODED samples: (sample_rate, n_samples, duration_ms, energy Σs²,
    peak max|s|) — the same closed form as the WAV leg, over samples
    that traveled through real Rice bitstreams and CRC/MD5 checks."""
    rate, s = decode_flac(data)
    s64 = s.astype(np.int64)
    n = int(s64.size)
    energy = int((s64 * s64).sum()) if n else 0
    peak = int(np.abs(s64).max()) if n else 0
    return rate, n, n * 1000 // rate, energy, peak
