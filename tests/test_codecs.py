"""Unit goldens for the pure-Python PPM/WAV codecs — files are built
BY HAND (literal bytes / struct.pack), never through our own encoders,
so the decoders are exercised as real parsers of foreign input; plus
roundtrips, header-variant acceptance (comments, extra RIFF chunks),
and malformed-input rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from molgraphdb_spark.functions.codecs import (
    WAV_BITS,
    WAV_SAMPLE_RATE,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_luminance_features,
    wav_signal_features,
)


# ------------------------------- PPM --------------------------------

def test_ppm_hand_built_golden():
    # 2x1 image: red pixel, mid-gray pixel — bytes written literally.
    data = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 128, 128, 128])
    w, h, maxval, raster = decode_ppm(data)
    assert (w, h, maxval) == (2, 1, 255)
    assert raster == bytes([255, 0, 0, 128, 128, 128])


def test_ppm_comments_and_whitespace_variants():
    # netpbm allows comments anywhere in the header and any whitespace
    # between tokens; only ONE whitespace byte precedes the raster.
    data = b"P6 # a comment\n# full line\n 3\t1 # dims done\n255\n" + bytes(range(9))
    w, h, maxval, raster = decode_ppm(data)
    assert (w, h, maxval) == (3, 1, 255)
    assert raster == bytes(range(9))


def test_ppm_roundtrip():
    raster = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
    data = encode_ppm(4, 3, raster)
    assert decode_ppm(data) == (4, 3, 255, raster)


def test_ppm_raster_not_confused_by_whitespace_bytes():
    # raster bytes that LOOK like whitespace (0x0A) must pass through
    raster = bytes([10, 32, 13] * 2)
    assert decode_ppm(encode_ppm(2, 1, raster))[3] == raster


@pytest.mark.parametrize(
    "bad",
    [
        b"P5\n2 1\n255\n" + b"\0" * 6,          # wrong magic (grayscale)
        b"JFIF\x00\x01",                          # not netpbm at all
        b"P6\n2 1\n255\n" + b"\0" * 5,           # truncated raster
        b"P6\n0 1\n255\n",                        # zero width
        b"P6\n2 1\n0\n" + b"\0" * 6,             # invalid maxval
        b"P6\n2 x\n255\n" + b"\0" * 6,           # non-integer dim
    ],
)
def test_ppm_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_ppm(bad)


def test_ppm_luminance_golden():
    # Pure red + pure white: lum(red) = 2126*255//10000 = 54,
    # lum(white) = (2126+7152+722)*255//10000 = 255.
    data = encode_ppm(2, 1, bytes([255, 0, 0, 255, 255, 255]))
    w, h, luma_milli, peak = ppm_luminance_features(data)
    assert (w, h) == (2, 1)
    assert luma_milli == (54 + 255) * 1000 // 2
    assert peak == 255


# ------------------------------- WAV --------------------------------

def _hand_wav(rate, samples, extra_chunk=b""):
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + extra_chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_hand_built_golden():
    rate, s = decode_wav(_hand_wav(8000, [0, 1000, -1000, 32767, -32768]))
    assert rate == 8000
    assert s.tolist() == [0, 1000, -1000, 32767, -32768]


def test_wav_skips_unknown_chunks_and_odd_padding():
    # a 3-byte LIST chunk before fmt: the walker must skip it AND its
    # RIFF odd-size pad byte to stay aligned.
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, s = decode_wav(_hand_wav(44100, [7, -7], extra_chunk=extra))
    assert rate == 44100
    assert s.tolist() == [7, -7]


def test_wav_roundtrip():
    samples = np.array([(i * 773) % 65536 - 32768 for i in range(100)], dtype="<i2")
    rate, s = decode_wav(encode_wav(WAV_SAMPLE_RATE, samples))
    assert rate == WAV_SAMPLE_RATE
    assert np.array_equal(s, samples)


@pytest.mark.parametrize(
    "bad",
    [
        b"RIFX" + b"\x00" * 20,                                   # wrong magic
        b"RIFF" + struct.pack("<I", 4) + b"AVI ",                  # not WAVE
        _hand_wav(8000, [1, 2])[:-1],                              # truncated data
        # stereo (2 channels) — unsupported by this decoder
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0),
        # non-PCM format tag (IEEE float = 3)
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16) + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 0),
        # sample rate 0 — would divide-by-zero in wav_signal_features
        _hand_wav(0, [1, 2]),
        # block align inconsistent with channels*bits/8 (3 != 2)
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 16)
        + b"data" + struct.pack("<I", 0),
        # byte rate inconsistent with rate*block_align (999 != 16000)
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 999, 2, 16)
        + b"data" + struct.pack("<I", 0),
    ],
)
def test_wav_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_wav_signal_features_golden():
    data = _hand_wav(8000, [3, -4, 0])
    rate, n, dur_ms, energy, peak = wav_signal_features(data)
    assert (rate, n) == (8000, 3)
    assert dur_ms == 3 * 1000 // 8000
    assert energy == 9 + 16 + 0
    assert peak == 4
    assert WAV_BITS == 16


# ------------------------- property tests ---------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        data=st.data(),
    )
    def test_ppm_roundtrip_property(w, h, data):
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        assert decode_ppm(encode_ppm(w, h, raster)) == (w, h, 255, raster)

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 44100]),
        samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=500),
    )
    def test_wav_roundtrip_property(rate, samples):
        arr = np.array(samples, dtype="<i2")
        got_rate, got = decode_wav(encode_wav(rate, arr))
        assert got_rate == rate
        assert np.array_equal(got, arr)

    @settings(max_examples=40, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=64))
    def test_decoders_never_crash_on_junk(junk):
        # malformed input must raise ValueError, never IndexError /
        # struct.error / silent garbage
        for dec in (decode_ppm, decode_wav):
            try:
                dec(junk)
            except ValueError:
                pass

except ImportError:  # hypothesis is baked in; belt-and-braces gate
    pass


# ------------------------------- PNG --------------------------------

from molgraphdb_spark.functions.codecs import (  # noqa: E402
    decode_png,
    encode_png,
    png_luminance_features,
)


def _hand_png(w, h, filtered_stream, *, ihdr=None, extra_chunks=(),
              split_idat=False, with_iend=True):
    """Build a PNG BY HAND (struct + zlib, never via encode_png) so
    decode_png is tested as a parser of foreign files."""
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = ihdr or struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    comp = zlib.compress(filtered_stream)
    if split_idat:
        mid = len(comp) // 2
        idat = chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    else:
        idat = chunk(b"IDAT", comp)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    for ct, body in extra_chunks:
        out += chunk(ct, body)
    out += idat
    if with_iend:
        out += chunk(b"IEND", b"")
    return out


def test_png_hand_built_golden_all_filters():
    # 2x5 RGB image, one scanline per filter type, filtered bytes
    # computed BY HAND from the spec's recurrences.
    rows = [
        bytes([10, 20, 30, 40, 50, 60]),     # r0: None
        bytes([5, 5, 5, 6, 7, 8]),           # r1: Sub
        bytes([5, 5, 5, 250, 250, 250]),     # r2: Up
        bytes([100, 100, 100, 200, 0, 56]),  # r3: Average
        bytes([100, 101, 102, 200, 201, 0]), # r4: Paeth
    ]
    raw = b"".join(rows)
    # hand-filter: r0 None = raw
    f0 = b"\x00" + rows[0]
    # r1 Sub: first pixel unchanged, then delta vs left
    f1 = b"\x01" + bytes([5, 5, 5, (6 - 5) & 255, (7 - 5) & 255, (8 - 5) & 255])
    # r2 Up: delta vs r1 raw
    f2 = b"\x02" + bytes([(5 - 5) & 255, 0, 0, (250 - 6) & 255, (250 - 7) & 255, (250 - 8) & 255])
    # r3 Average: pred = (left + up)//2
    p = rows[2]
    f3 = b"\x03" + bytes([
        (100 - (0 + p[0]) // 2) & 255, (100 - (0 + p[1]) // 2) & 255,
        (100 - (0 + p[2]) // 2) & 255, (200 - (100 + p[3]) // 2) & 255,
        (0 - (100 + p[4]) // 2) & 255, (56 - (100 + p[5]) // 2) & 255,
    ])
    # r4 Paeth: pred = paeth(left, up, upleft); first pixel: paeth(0, up, 0) = up
    from molgraphdb_spark.functions.codecs import _paeth
    p3, r4 = rows[3], rows[4]
    f4 = b"\x04" + bytes(
        [(r4[i] - _paeth(0, p3[i], 0)) & 255 for i in range(3)]
        + [(r4[i] - _paeth(r4[i - 3], p3[i], p3[i - 3])) & 255 for i in range(3, 6)]
    )
    data = _hand_png(2, 5, f0 + f1 + f2 + f3 + f4)
    w, h, raster = decode_png(data)
    assert (w, h) == (2, 5)
    assert raster == raw


def test_png_multiple_idat_and_ancillary_chunks():
    raw = bytes(range(6))
    stream = b"\x00" + raw
    data = _hand_png(2, 1, stream, extra_chunks=[(b"tEXt", b"k\x00v")],
                     split_idat=True)
    assert decode_png(data) == (2, 1, raw)


def test_png_roundtrip_exercises_all_five_filters():
    import zlib
    raster = bytes((i * 37 + 11) % 256 for i in range(4 * 7 * 3))
    data = encode_png(4, 7, raster)
    assert decode_png(data) == (4, 7, raster)
    # the encoder's r%5 cycle really put all five filter types on disk
    sig_end = 8
    # IHDR chunk is 8+13+4 bytes after the signature; IDAT follows
    idat_body_off = sig_end + 25 + 8
    (idat_len,) = struct.unpack(">I", data[sig_end + 25 : sig_end + 29])
    stream = zlib.decompress(data[idat_body_off : idat_body_off + idat_len])
    stride = 1 + 4 * 3
    assert [stream[r * stride] for r in range(7)] == [0, 1, 2, 3, 4, 0, 1]


def test_png_luminance_matches_ppm_closed_form():
    raster = bytes([255, 0, 0, 128, 128, 128])
    w, h, luma, peak = png_luminance_features(encode_png(2, 1, raster))
    pw, ph, pluma, ppeak = ppm_luminance_features(encode_ppm(2, 1, raster))
    assert (w, h, luma, peak) == (pw, ph, pluma, ppeak) == (2, 1, 91000, 255)


def _corrupt_crc(data):
    return data[:-1] + bytes([data[-1] ^ 0xFF])


@pytest.mark.parametrize(
    "bad",
    [
        b"\x88PNG\r\n\x1a\n" + b"\x00" * 30,               # wrong signature
        _corrupt_crc(encode_png(1, 1, b"\x01\x02\x03")),    # IEND CRC flipped
        encode_png(1, 1, b"\x01\x02\x03")[:-12],            # IEND missing
        _hand_png(1, 1, b"\x05\x01\x02\x03"),               # unknown filter 5
        _hand_png(1, 1, b"\x00\x01\x02"),                   # stream too short
        _hand_png(1, 1, b"\x00\x01\x02\x03",                # 16-bit depth
                  ihdr=struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)),
        _hand_png(1, 1, b"\x00\x01\x02\x03",                # interlaced
                  ihdr=struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)),
        _hand_png(1, 1, b"\x00\x01\x02\x03",                # grayscale
                  ihdr=struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)),
        # IDAT bytes that are not a zlib stream
        b"\x89PNG\r\n\x1a\n"
        + _hand_png(1, 1, b"")[8:33]                        # reuse IHDR chunk
        + struct.pack(">I", 4) + b"IDAT" + b"junk"
        + struct.pack(">I", __import__("zlib").crc32(b"IDATjunk") & 0xFFFFFFFF)
        + _hand_png(1, 1, b"")[-12:],
    ],
)
def test_png_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_png(bad)


def test_png_crc_corruption_in_idat_rejected():
    data = encode_png(2, 2, bytes(12))
    # flip one byte inside the IDAT body (after IHDR = 8+25 bytes)
    i = 8 + 25 + 8 + 2
    bad = data[:i] + bytes([data[i] ^ 0x55]) + data[i + 1 :]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=16),
        data=st.data(),
    )
    def test_png_roundtrip_property(w, h, data):
        raster = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
            )
        )
        assert decode_png(encode_png(w, h, raster)) == (w, h, raster)

    @settings(max_examples=40, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=64))
    def test_png_decoder_never_crashes_on_junk(junk):
        try:
            decode_png(junk)
        except ValueError:
            pass
        # also junk APPENDED to a valid signature/IHDR prefix
        try:
            decode_png(encode_png(1, 1, b"abc")[:20] + junk)
        except ValueError:
            pass

except ImportError:
    pass
