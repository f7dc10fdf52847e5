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
