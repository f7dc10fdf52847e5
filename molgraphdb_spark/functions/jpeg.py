"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT) —
the HARD compressed-image leg of the multimodal decode boundary.

The container ships no image libraries, but baseline JPEG needs only
``numpy`` for the 8x8 DCT/IDCT: everything else — marker walk, DQT /
DHT / SOF0 / SOS parsing, canonical Huffman code construction, the
entropy-coded bitstream with 0xFF00 byte unstuffing, DC prediction,
run-length AC coding, dequantization, zigzag — is plain integer work
implemented here from the public spec. The decoder reads EVERY table
from the file (quantization tables from DQT, Huffman tables from DHT,
dimensions and sampling from SOF0); nothing is smuggled around the
decode. Envelope: baseline sequential (SOF0), 8-bit precision, 1 or 3
components, 1x1 sampling (no chroma subsampling), no restart
intervals — anything else (progressive SOF2, arithmetic coding, DRI,
subsampled chroma, 12-bit) is a loud ValueError, exactly like the
PNG/PPM/WAV codecs in functions/codecs.py. The remaining documented
boundary is MP3/H.264.

Exactness class (what the closed-form DuckDB oracle leans on): for an
image whose every 8x8 block is a CONSTANT EVEN value v, baseline JPEG
with the Annex K luminance table is bit-exact end-to-end. The DCT of
a constant block is DC-only with DC = 8*(v-128); the Annex K DC
quantizer is 16, so the quantized coefficient is the integer (v-128)/2
with zero rounding error; dequantization recovers 8*(v-128) exactly
and the DC-only IDCT reproduces the constant v in every pixel (the
float64 round-trip error is ~1e-13, five orders of magnitude below the
0.5 rounding boundary). mm_decoded_jpeg synthesizes exactly this class,
so its oracle recomputes features closed-form from the document bytes
while the bytes still travel through a REAL Huffman bitstream, a real
marker walk, and a real IDCT. Arbitrary images round-trip with normal
JPEG quantization error — pinned by tolerance tests, not oracles.

Quantization/Huffman tables are the public Annex K defaults; their
canonical-code construction is spot-checked in tests/test_jpeg.py
against well-known code values (DC-luma cat 2 = 011, AC-luma EOB =
1010, ZRL = 11111111001).

Reference counterpart: the reference's only media-decode analogue is
its RDKit/matplotlib render pipeline (reference mcs.py:349-687) —
bytes in, typed pixels out.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------
# Public Annex K tables (ITU-T T.81).
# --------------------------------------------------------------------

#: Zigzag scan: zigzag position -> row-major index in the 8x8 block.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance quantization table (row-major). Q[0] = 16 is
#: what makes the even-constant-block class exact (see module doc).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

#: Annex K.2 chrominance quantization table (row-major).
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 Huffman specs: (BITS[1..16] code-length counts, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: The 8-point orthonormal DCT-II matrix scaled per T.81: F = M @ B @ M.T.
_DCT_M = np.array([
    [0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
     * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
])


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman construction per T.81 Annex C: symbols are
    assigned consecutive codes within each length, lengths ascending.
    Returns symbol -> (code_length, code_value)."""
    if len(bits) != 16:
        raise ValueError(f"BITS must have 16 entries, got {len(bits)}")
    if sum(bits) != len(vals):
        raise ValueError(f"BITS totals {sum(bits)} codes but {len(vals)} symbols given")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # spec pads with 1-bits
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over a pre-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted mid-block")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _category(v: int) -> int:
    """JPEG magnitude category: 0 for 0, else bit length of |v|."""
    return 0 if v == 0 else int(abs(v)).bit_length()


def _extend(bits: int, cat: int) -> int:
    """T.81 EXTEND: map ``cat`` raw magnitude bits back to a signed value."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _amplitude(v: int, cat: int) -> int:
    """Inverse of :func:`_extend`: the ``cat`` raw bits encoding v."""
    return v if v >= 0 else v + (1 << cat) - 1


# --------------------------------------------------------------------
# Encoder.
# --------------------------------------------------------------------

def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Split an (H, W) plane (H, W multiples of 8) into (n, 8, 8) blocks
    in row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    """Pad an (h, w) plane to 8-multiples by edge replication (the
    conventional JPEG boundary treatment — keeps constant blocks constant)."""
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """Full-range BT.601 RGB -> YCbCr (the JFIF convention), rounded to
    integer planes. px is (n, 3) float64; returns (n, 3)."""
    r, g, b = px[:, 0], px[:, 1], px[:, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.rint(np.stack([y, cb, cr], axis=1)), 0, 255)


def encode_jpeg(width: int, height: int, pixels: bytes, components: int = 1) -> bytes:
    """Serialize pixels as a baseline sequential JPEG (SOF0).

    ``components=1``: pixels is a ``width*height`` grayscale raster.
    ``components=3``: pixels is interleaved RGB (converted to YCbCr
    4:4:4 here). Annex K quantization and Huffman tables, 1x1 sampling,
    interleaved single scan — a file any standard JPEG decoder reads."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if components not in (1, 3):
        raise ValueError(f"components must be 1 or 3, got {components}")
    if len(pixels) != width * height * components:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; {width}x{height}x"
            f"{components} needs {width * height * components}"
        )
    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if components == 1:
        planes = [px.reshape(height, width)]
    else:
        ycc = _rgb_to_ycbcr(px.reshape(-1, 3))
        planes = [ycc[:, c].reshape(height, width) for c in range(3)]

    # Per-plane: pad, block, forward DCT, quantize (int64 coefficients).
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (components - 1)
    coeffs = []
    for plane, q in zip(planes, quants):
        blocks = _plane_blocks(_pad_edge(plane)) - 128.0
        f = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
        coeffs.append(np.rint(f / q).astype(np.int64))

    dc_tabs = [build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if components == 3:
        dc_tabs += [build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_tabs += [build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2

    zz = np.array(ZIGZAG)
    w = _BitWriter()
    pred = [0] * components
    n_blocks = coeffs[0].shape[0]
    for b in range(n_blocks):  # MCU-interleaved: all components per position
        for c in range(components):
            blk = coeffs[c][b].reshape(64)[zz]
            diff = int(blk[0]) - pred[c]
            pred[c] = int(blk[0])
            cat = _category(diff)
            ln, code = dc_tabs[c][cat]
            w.write(code, ln)
            if cat:
                w.write(_amplitude(diff, cat), cat)
            run = 0
            last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
            for i in range(1, 64):
                if i > last_nz:
                    ln, code = ac_tabs[c][0x00]  # EOB
                    w.write(code, ln)
                    break
                v = int(blk[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_tabs[c][0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                cat = _category(v)
                ln, code = ac_tabs[c][(run << 4) | cat]
                w.write(code, ln)
                w.write(_amplitude(v, cat), cat)
                run = 0
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(int(QUANT_LUMA.reshape(64)[i]) for i in ZIGZAG)
    if components == 3:
        dqt += bytes([1]) + bytes(int(QUANT_CHROMA.reshape(64)[i]) for i in ZIGZAG)
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, height, width, components)
    for c in range(components):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xFFC0, sof)
    dht = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    dht += bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    if components == 3:
        dht += bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        dht += bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
    out += seg(0xFFC4, dht)
    sos = bytes([components])
    for c in range(components):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al — full baseline scan
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------
# Decoder.
# --------------------------------------------------------------------

def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a baseline JPEG: returns (width, height, n_components,
    pixel bytes — grayscale raster or interleaved RGB).

    A genuine decode: SOI check; marker segment walk (APPn/COM skipped
    by their declared lengths); DQT (8-bit precision, de-zigzagged
    here), SOF0 envelope validation (8-bit, 1 or 3 components, 1x1
    sampling), DHT canonical Huffman reconstruction per Annex C, SOS;
    then the entropy-coded segment is byte-unstuffed (0xFF00) and
    Huffman-decoded MCU by MCU with DC prediction, T.81 EXTEND, ZRL and
    EOB handling; dequantize, de-zigzag, batch IDCT, level shift,
    clamp; YCbCr->RGB for color. Raises ValueError on anything
    malformed or outside the baseline envelope (progressive SOF2,
    arithmetic SOF9+, DRI restarts, subsampling, 12-bit, bad Huffman
    codes, truncated entropy data, missing EOI)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError(f"not a JPEG (no SOI marker, got {data[:2]!r})")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    sof = None
    scan_comps = None
    entropy_start = None
    _REJECT_SOF = {
        0xC1: "extended sequential (SOF1)", 0xC2: "progressive (SOF2)",
        0xC3: "lossless (SOF3)", 0xC5: "differential (SOF5)",
        0xC6: "differential (SOF6)", 0xC7: "differential (SOF7)",
        0xC9: "arithmetic (SOF9)", 0xCA: "arithmetic (SOF10)",
        0xCB: "arithmetic (SOF11)", 0xCD: "arithmetic (SOF13)",
        0xCE: "arithmetic (SOF14)", 0xCF: "arithmetic (SOF15)",
    }
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}, got {data[pos]:#x}")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1  # fill bytes are legal
        if pos >= len(data):
            raise ValueError("truncated JPEG: dangling 0xFF")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG has no scan data (EOI before SOS)")
        if marker in _REJECT_SOF:
            raise ValueError(
                f"decoder supports baseline sequential (SOF0) only, got {_REJECT_SOF[marker]}"
            )
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: marker segment length missing")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError(f"marker {marker:#x} segment truncated")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM: skipped, length-validated
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("decoder supports 8-bit quantization tables only")
                if i + 65 > len(body):
                    raise ValueError("DQT table truncated")
                tab = np.zeros(64, dtype=np.int64)
                for z in range(64):
                    tab[ZIGZAG[z]] = body[i + 1 + z]
                if np.any(tab == 0):
                    raise ValueError("DQT contains a zero quantizer")
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                if tc not in (0, 1):
                    raise ValueError(f"DHT class {tc} invalid")
                if i + 17 > len(body):
                    raise ValueError("DHT bits table truncated")
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("DHT symbol list truncated")
                htabs[(tc, th)] = build_huffman_codes(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 — the ONLY frame type in the envelope
            if sof is not None:
                raise ValueError("JPEG has multiple SOF0 frames")
            if len(body) < 6:
                # struct.error would leak through the documented
                # loud-ValueError contract (ADVICE r11)
                raise ValueError("SOF0 header truncated")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"decoder supports 8-bit precision, got {prec}")
            if nc not in (1, 3):
                raise ValueError(f"decoder supports 1 or 3 components, got {nc}")
            if w == 0 or h == 0:
                raise ValueError(f"SOF0: invalid dimensions {w}x{h}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("SOF0 component specs truncated")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        f"decoder supports 1x1 sampling only, component {cid} has "
                        f"{hv >> 4}x{hv & 0xF}"
                    )
                comps.append((cid, tq))
            sof = (w, h, comps)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("DRI segment truncated")
            (interval,) = struct.unpack(">H", body[:2])
            if interval != 0:
                raise ValueError("decoder does not support restart intervals (DRI)")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            if not body:
                raise ValueError("SOS header truncated")
            ns = body[0]
            if ns != len(sof[2]):
                raise ValueError(f"SOS selects {ns} components, frame has {len(sof[2])}")
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("SOS component specs truncated")
            scan_comps = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                if cs != sof[2][c][0]:
                    raise ValueError(
                        f"SOS component order {cs} disagrees with frame "
                        f"component {sof[2][c][0]} (non-interleaved scans "
                        "are outside the baseline envelope here)"
                    )
                scan_comps.append((cs, tda >> 4, tda & 0x0F))
            ss, se, ahl = body[1 + 2 * ns : 4 + 2 * ns]
            if (ss, se, ahl) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection / successive approximation")
            entropy_start = pos
            break
        else:
            raise ValueError(f"unsupported marker {marker:#x}")
    if sof is None or scan_comps is None or entropy_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # Unstuff the entropy-coded segment up to the next marker.
    raw = bytearray()
    i = entropy_start
    end_marker = None
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            if i + 1 < len(data) and data[i + 1] == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            end_marker = data[i + 1] if i + 1 < len(data) else None
            break
        raw.append(b)
        i += 1
    if 0xD0 <= (end_marker or 0) <= 0xD7:
        raise ValueError("decoder does not support restart markers (RSTn)")
    if end_marker != 0xD9:
        raise ValueError("JPEG missing EOI after scan data")

    w, h, comps = sof
    bx, by = (w + 7) // 8, (h + 7) // 8
    n_blocks = bx * by
    # Plausibility cap BEFORE allocating coefficient arrays: declared
    # 65535x65535 SOF dims would reserve ~34 GB/component while the
    # entropy segment is a few bytes. Every baseline block costs >= 2
    # bits per component (a >=1-bit DC code + a >=1-bit EOB/AC code),
    # so dims exceeding the segment's bit budget are malformed — raise
    # the documented ValueError instead of attempting the allocation
    # and dying later in MemoryError (ADVICE r11).
    if 2 * n_blocks * len(comps) > 8 * len(raw):
        raise ValueError(
            f"SOF0 dimensions {w}x{h} implausible for a "
            f"{len(raw)}-byte entropy segment"
        )
    reader = _BitReader(bytes(raw))
    zz = ZIGZAG
    coeff = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in comps]

    # Invert the code tables once: (length, code) -> symbol.
    dec_tabs = {}
    for key, codes in htabs.items():
        dec_tabs[key] = {(ln, code): sym for sym, (ln, code) in codes.items()}

    def read_symbol(tab: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = tab.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    pred = [0] * len(comps)
    for b in range(n_blocks):
        for ci, (cs, td, ta) in enumerate(scan_comps):
            if (0, td) not in dec_tabs or (1, ta) not in dec_tabs:
                raise ValueError(f"scan references undefined Huffman table (component {cs})")
            cat = read_symbol(dec_tabs[(0, td)])
            if cat > 11:
                raise ValueError(f"DC category {cat} out of range")
            diff = _extend(reader.read_bits(cat), cat)
            pred[ci] += diff
            blk = coeff[ci][b]
            blk[zz[0]] = pred[ci]
            k = 1
            while k < 64:
                rs = read_symbol(dec_tabs[(1, ta)])
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                blk[zz[k]] = _extend(reader.read_bits(size), size)
                k += 1

    # Dequantize + batch IDCT per component, then assemble planes.
    planes = []
    for ci, (cid, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"component {cid} references undefined DQT table {tq}")
        f = (coeff[ci].reshape(n_blocks, 8, 8) * qtabs[tq]).astype(np.float64)
        blocks = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, f, _DCT_M.T) + 128.0
        plane = (
            blocks.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)[:h, :w]
        )
        planes.append(plane)
    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def jpeg_luminance_features(data: bytes) -> tuple[int, int, int, int]:
    """Decode a JPEG and compute integer-exact features from the
    DECODED pixels: (width, height, mean luminance in milli, peak).
    Grayscale: luminance IS the sample; color: the same integer Rec.709
    floor formula the PPM/PNG legs use."""
    w, h, nc, pixels = decode_jpeg(data)
    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
    if nc == 1:
        lum = px
    else:
        px = px.reshape(-1, 3)
        lum = (2126 * px[:, 0] + 7152 * px[:, 1] + 722 * px[:, 2]) // 10000
    luma_milli = int(lum.sum()) * 1000 // (w * h)
    return w, h, luma_milli, int(px.max())
