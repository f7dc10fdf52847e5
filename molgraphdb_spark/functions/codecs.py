"""Pure-Python media codecs: PPM (P6) and PNG (RGB-8) images plus WAV
PCM audio — the REAL decode leg at the multimodal codec boundary.

The container ships no image/audio libraries, but these formats need
none: a PPM P6 file is an ASCII header (magic, dims, maxval, comments)
followed by a raw RGB raster; a WAV PCM file is a RIFF container whose
chunks a 30-line walker parses with ``struct``; and a PNG is a chunk
stream (IHDR/IDAT/IEND with CRC-32) whose pixel data is a stdlib
``zlib`` DEFLATE stream of per-scanline-filtered bytes — a genuinely
COMPRESSED format decoded here end-to-end (signature, chunk walk with
CRC verification, inflate, and the spec's five scanline unfilters:
None/Sub/Up/Average/Paeth). All decoders genuinely parse headers —
dimensions, sample rate, and bit depth come from the FILE, not from
side-channel metadata — and reject malformed input loudly (wrong
magic, truncated raster, bad CRC, unknown filter type, non-PCM
format), so the pipeline behaves exactly as it would with a real
decoder in the slot. Baseline JPEG decodes via the sibling module
functions/jpeg.py; the remaining compressed formats (MP3/H.264) stay
behind the documented ``decode_image_stub`` boundary in
queries/multimodal_queries.py.

Reference counterpart: the reference's own "decode media" analogue is
its RDKit/matplotlib rendering pipeline (reference mcs.py:349–687) —
bytes in, typed pixels out. Encoders exist so tests and the payload
synthesizer can produce valid files; decoders never assume they were
the producer.
"""

from __future__ import annotations

import struct

import numpy as np

#: Synthesized-audio parameters (one place, shared with oracles).
WAV_SAMPLE_RATE = 8000
WAV_BITS = 16


# --------------------------------------------------------------------
# PPM (portable pixmap, binary P6) — netpbm's uncompressed RGB format.
# --------------------------------------------------------------------

def encode_ppm(width: int, height: int, raster: bytes) -> bytes:
    """Serialize a P6 PPM: ``P6\\n<w> <h>\\n255\\n`` + raw RGB raster
    (3 bytes per pixel, row-major)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(raster) != width * height * 3:
        raise ValueError(
            f"raster is {len(raster)} bytes; {width}x{height} needs "
            f"{width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + raster


def _ppm_tokens(data: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Scan ``count`` whitespace-separated ASCII integers from the PPM
    header beginning at ``start``, skipping ``#`` comments (netpbm
    allows them anywhere in the header). Returns (values, next_pos)."""
    vals: list[int] = []
    i = start
    n = len(data)
    while len(vals) < count:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i] == ord("#"):
            while i < n and data[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and data[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"PPM header: expected integer at byte {i}")
        vals.append(int(data[i:j]))
        i = j
    return vals, i


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM: returns (width, height, maxval, raster).

    Genuine header parse: magic check, comment-aware integer scan for
    width/height/maxval, exactly ONE whitespace byte before the raster
    (the netpbm spec), and a raster-length check. Raises ValueError on
    anything malformed."""
    if data[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {data[:2]!r})")
    (w, h, maxval), pos = _ppm_tokens(data, 2, 3)
    if w <= 0 or h <= 0:
        raise ValueError(f"PPM header: invalid dimensions {w}x{h}")
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM header: invalid maxval {maxval}")
    if pos >= len(data) or not data[pos : pos + 1].isspace():
        raise ValueError("PPM header: missing whitespace before raster")
    pos += 1  # exactly one whitespace byte separates header and raster
    bpp = 3 if maxval < 256 else 6
    raster = data[pos : pos + w * h * bpp]
    if len(raster) != w * h * bpp:
        raise ValueError(
            f"PPM raster truncated: have {len(raster)}, need {w * h * bpp}"
        )
    return w, h, maxval, raster


def ppm_luminance_features(data: bytes) -> tuple[int, int, int, int]:
    """Decode a P6 PPM and compute integer-exact features from the
    DECODED raster: (width, height, mean Rec.709 luminance in milli,
    peak channel byte). Luminance per pixel floors
    ``(2126·R + 7152·G + 722·B) // 10000`` — integer both engines."""
    w, h, maxval, raster = decode_ppm(data)
    if maxval != 255:
        raise ValueError(f"luminance features need 8-bit PPM, got maxval {maxval}")
    px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    lum = (2126 * px[:, 0] + 7152 * px[:, 1] + 722 * px[:, 2]) // 10000
    luma_milli = int(lum.sum()) * 1000 // (w * h)
    return w, h, luma_milli, int(px.max())


# --------------------------------------------------------------------
# PNG (RGB, 8-bit, non-interlaced) — a real COMPRESSED image format,
# decoded with nothing but stdlib zlib. Envelope: color type 2 (RGB),
# bit depth 8, compression 0, filter method 0, interlace 0 — anything
# else is a loud ValueError (JPEG lives in functions/jpeg.py; the
# MP3/H.264 boundary stays documented).
# --------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    """Serialize one PNG chunk: length + type + body + CRC-32 over
    (type || body), exactly per the spec."""
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG filter 4): pick whichever of left (a),
    up (b), upper-left (c) is closest to a + b − c, ties in that order."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, raster: bytes) -> bytes:
    """Serialize an RGB-8 raster as a PNG. Scanline r uses filter type
    ``r % 5`` — deliberately cycling through ALL five spec filters so
    every decoder unfilter path is exercised by real files, not just
    the lazy all-None stream most toy encoders emit."""
    import zlib

    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    stride = 3 * width
    if len(raster) != stride * height:
        raise ValueError(
            f"raster is {len(raster)} bytes; {width}x{height} needs {stride * height}"
        )
    zero = bytes(stride)
    filtered = bytearray()
    for r in range(height):
        row = raster[r * stride : (r + 1) * stride]
        prior = raster[(r - 1) * stride : r * stride] if r else zero
        ftype = r % 5
        filtered.append(ftype)
        if ftype == 0:  # None
            filtered += row
        elif ftype == 1:  # Sub
            filtered += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            filtered += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            filtered += bytes(
                (row[i] - ((row[i - 3] if i >= 3 else 0) + prior[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            filtered += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - 3] if i >= 3 else 0,
                        prior[i],
                        prior[i - 3] if i >= 3 else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse a PNG: returns (width, height, RGB raster bytes).

    A genuine decode, stdlib-only: signature check; chunk walk
    verifying each length and CRC-32; IHDR envelope validation (RGB-8,
    non-interlaced); IDAT concatenation across chunks; ``zlib``
    inflate; then per-scanline unfiltering of all five spec filter
    types (None/Sub/Up/Average/Paeth). Raises ValueError on anything
    malformed — bad magic, CRC mismatch, truncated chunk, unknown
    filter type, or a pixel stream whose size disagrees with IHDR."""
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError(f"not a PNG (signature {data[:8]!r})")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG chunk header truncated")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"PNG chunk {ctype!r} truncated: {len(body)} < {length}")
        crc_end = pos + 8 + length + 4
        if crc_end > len(data):
            raise ValueError(f"PNG chunk {ctype!r} missing CRC")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : crc_end])
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("PNG has multiple IHDR chunks")
            if length != 13:
                raise ValueError(f"IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            if ihdr is None:
                raise ValueError("IDAT before IHDR")
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are CRC-checked and skipped
        pos = crc_end
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not seen_end:
        raise ValueError("PNG missing IEND")
    w, h, depth, ctype_n, comp, filt, inter = ihdr
    if w <= 0 or h <= 0:
        raise ValueError(f"IHDR: invalid dimensions {w}x{h}")
    if (depth, ctype_n, comp, filt, inter) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"decoder supports RGB-8 non-interlaced PNG only, got depth={depth} "
            f"color={ctype_n} compression={comp} filter={filt} interlace={inter}"
        )
    if not idat:
        raise ValueError("PNG has no IDAT data")
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"IDAT inflate failed: {e}") from e
    stride = 3 * w
    if len(stream) != h * (1 + stride):
        raise ValueError(
            f"pixel stream is {len(stream)} bytes; {w}x{h} needs {h * (1 + stride)}"
        )
    out = bytearray(h * stride)
    zero = bytes(stride)
    for r in range(h):
        ftype = stream[r * (1 + stride)]
        row = bytearray(stream[r * (1 + stride) + 1 : (r + 1) * (1 + stride)])
        prior = out[(r - 1) * stride : r * stride] if r else zero
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: left-neighbor prefix sum per channel
            for i in range(3, stride):
                row[i] = (row[i] + row[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8)
                 + np.frombuffer(bytes(prior), dtype=np.uint8)).astype(np.uint8).tobytes()
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - 3] if i >= 3 else 0
                row[i] = (row[i] + (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                row[i] = (
                    row[i]
                    + _paeth(
                        row[i - 3] if i >= 3 else 0,
                        prior[i],
                        prior[i - 3] if i >= 3 else 0,
                    )
                ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on scanline {r}")
        out[r * stride : (r + 1) * stride] = row
    return w, h, bytes(out)


def png_luminance_features(data: bytes) -> tuple[int, int, int, int]:
    """Decode a PNG and compute integer-exact features from the
    DECODED raster: (width, height, mean Rec.709 luminance in milli,
    peak channel byte) — the same closed form as
    :func:`ppm_luminance_features`, over a raster that went through a
    real DEFLATE round and five-filter unfiltering to get here."""
    w, h, raster = decode_png(data)
    px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    lum = (2126 * px[:, 0] + 7152 * px[:, 1] + 722 * px[:, 2]) // 10000
    luma_milli = int(lum.sum()) * 1000 // (w * h)
    return w, h, luma_milli, int(px.max())


# --------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM) — the canonical uncompressed audio container.
# --------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Serialize 16-bit mono PCM samples as a RIFF/WAVE file."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,                     # audio format: PCM
        1,                     # channels: mono
        sample_rate,
        sample_rate * 2,       # byte rate = rate * block_align
        2,                     # block align = channels * bits/8
        WAV_BITS,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, "np.ndarray"]:
    """Parse a RIFF/WAVE file: returns (sample_rate, int16 samples).

    A genuine RIFF chunk walk — magic checks, then iterate (id, size)
    chunks skipping unknown ones (LIST/INFO metadata etc.) until both
    ``fmt `` and ``data`` are seen; validates PCM/mono/16-bit and odd
    -size chunk padding per the RIFF spec. Raises ValueError on
    malformed input."""
    if data[:4] != b"RIFF":
        raise ValueError(f"not a RIFF file (magic {data[:4]!r})")
    if len(data) < 12 or data[8:12] != b"WAVE":
        raise ValueError("RIFF file is not WAVE")
    pos = 12
    fmt_fields = None
    pcm = None
    while pos + 8 <= len(data) and (fmt_fields is None or pcm is None):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"chunk {cid!r} truncated: {len(body)} < {size}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # RIFF pads odd-size chunks
    if fmt_fields is None or pcm is None:
        raise ValueError("WAVE file missing fmt/data chunk")
    audio_format, channels, rate, byte_rate, block, bits = fmt_fields
    if audio_format != 1:
        raise ValueError(f"not PCM (format tag {audio_format})")
    if channels != 1 or bits != WAV_BITS:
        raise ValueError(f"decoder supports mono {WAV_BITS}-bit, got {channels}ch/{bits}-bit")
    if rate == 0:
        raise ValueError("fmt chunk declares sample rate 0")
    if block != channels * bits // 8:
        raise ValueError(f"block align {block} != channels*bits/8 = {channels * bits // 8}")
    if byte_rate != rate * block:
        raise ValueError(f"byte rate {byte_rate} != rate*block_align = {rate * block}")
    if len(pcm) % 2:
        raise ValueError("PCM data has odd byte length")
    return rate, np.frombuffer(pcm, dtype="<i2")


def wav_signal_features(data: bytes) -> tuple[int, int, int, int, int]:
    """Decode a WAV and compute integer-exact features from the DECODED
    samples: (sample_rate, n_samples, duration_ms, energy = Σ s²,
    peak = max |s|)."""
    rate, s = decode_wav(data)
    s64 = s.astype(np.int64)
    n = int(s64.size)
    energy = int((s64 * s64).sum()) if n else 0
    peak = int(np.abs(s64).max()) if n else 0
    return rate, n, n * 1000 // rate, energy, peak
