"""Goldens for the pure-Python FLAC codec (subset).

Same discipline as tests/test_codecs.py and test_jpeg.py: the decoder
is exercised on a file built BY HAND (literal bytes; CRCs computed by
an INDEPENDENT table-free bit-by-bit implementation in this file — a
third implementation of both CRCs); the CRC polynomials are pinned to
published check values; Rice/fixed-predictor round-trips are exact for
EVERY input because FLAC is lossless (hypothesis property); the
escape-coded residual path runs on real files via the rice_cap knob;
and malformed / out-of-envelope input rejects loudly, including the
end-to-end STREAMINFO MD5 integrity check."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from molgraphdb_spark.functions.flac import (
    BLOCK_SIZE,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_signal_features,
)


# ----------------------- CRC third implementation -------------------

def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Textbook long-division CRC over a bit list — shares no code
    shape with the byte-wise implementation under test."""
    bits = []
    for b in data:
        bits.extend((b >> (7 - i)) & 1 for i in range(8))
    bits.extend([0] * width)
    reg = 0
    for bit in bits:
        reg = ((reg << 1) | bit)
        if reg >> width:
            reg ^= (1 << width) | poly
    return reg


def test_crc_published_check_values():
    # CRC-8/poly 0x07 of b"123456789" is 0xF4; CRC-16/BUYPASS (poly
    # 0x8005, init 0, unreflected) is 0xFEE8 — published check values.
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_crc_matches_bitwise_long_division():
    rng = np.random.default_rng(3)
    for n in (0, 1, 7, 64):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert crc8(data) == _crc_bitwise(data, 0x07, 8)
        assert crc16(data) == _crc_bitwise(data, 0x8005, 16)


# ----------------------- hand-built decoder golden ------------------

def _hand_built(samples: list[int], channels: int = 1) -> bytes:
    """A complete FLAC file written field by field with plain ints and
    struct — one frame, one CONSTANT subframe (all samples equal)."""
    assert len(set(samples)) == 1
    n = len(samples)
    md5 = hashlib.md5(
        np.array(samples, dtype="<i2").tobytes()
    ).digest()
    # STREAMINFO: 16+16+24+24 bits, then 20|3|5|36 bits, then MD5.
    si = struct.pack(">HHxxxxxx", BLOCK_SIZE, BLOCK_SIZE)  # + two 24-bit zeros
    packed = (8000 << 44) | ((channels - 1) << 41) | (15 << 36) | n  # 20|3|5|36 = 64 bits
    si += struct.pack(">Q", packed) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, len(si)])
    out += si
    # Frame header: sync/reserved/strategy, bs code 0b0111 (16-bit
    # follows), sr code 0 (streaminfo), mono, 16-bit, frame number 0.
    hdr = bytes([0xFF, 0xF8, 0x70, 0x08, 0x00]) + struct.pack(">H", n - 1)
    frame = bytearray(hdr)
    frame.append(crc8(bytes(frame)))
    frame.append(0x00)  # subframe: pad 0, type CONSTANT 000000, wasted 0
    frame += struct.pack(">h", samples[0])
    frame += struct.pack(">H", crc16(bytes(frame)))
    return bytes(out + frame)


def test_hand_built_constant_frame():
    data = _hand_built([-513] * 7)
    rate, s = decode_flac(data)
    assert rate == 8000
    assert list(s) == [-513] * 7


def test_hand_built_rejects_stereo_and_lpc():
    with pytest.raises(ValueError, match="mono 16-bit"):
        decode_flac(_hand_built([5] * 3, channels=2))
    good = bytearray(_hand_built([5] * 3))
    # subframe header byte sits right after the frame-header CRC-8:
    # 4 + 4+34 (metadata) + 7 (header) + 1 (crc8) = 50
    assert good[50] == 0x00
    good[50] = 0x40  # type bits 100000 -> LPC order 0
    with pytest.raises(ValueError, match="LPC"):
        decode_flac(bytes(good))


def test_hand_built_crc_and_md5_rejections():
    good = _hand_built([1234] * 5)
    bad_h = bytearray(good)
    bad_h[49] ^= 0xFF  # the frame-header CRC-8 byte itself
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(bad_h))
    bad_f = bytearray(good)
    bad_f[-1] ^= 0x01  # frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad_f))
    bad_md5 = bytearray(good)
    bad_md5[4 + 4 + 18] ^= 0x01  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad_md5))


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"fLaX" + d[4:], "magic"),
        (lambda d: d[:20], ""),
        (lambda d: d[: len(d) - 4], ""),
    ],
)
def test_rejects_malformed(mutate, msg):
    good = encode_flac(8000, np.arange(100) % 7)
    with pytest.raises(ValueError, match=msg):
        decode_flac(mutate(good))


def test_rejects_implausible_streaminfo_total():
    # ADVICE r11: the 36-bit STREAMINFO sample total is untrusted — a
    # ~60-byte file declaring 2^36 samples would reserve ~512 GB of
    # int64 before the frame walk ever noticed. The plausibility cap
    # (a frame spans <= 65535 samples and costs >= 10 bytes) must
    # raise the documented ValueError BEFORE np.empty runs.
    good = bytearray(_hand_built([7] * 3))
    # STREAMINFO packed 64-bit word starts at 4 (magic) + 4 (block
    # header) + 10 (min/max blocksize + two 24-bit frame sizes);
    # overwrite its 36-bit total with the maximum while keeping the
    # 20|3|5 rate/channels/bps fields.
    off = 4 + 4 + 10
    packed = int.from_bytes(good[off : off + 8], "big")
    packed |= (1 << 36) - 1
    good[off : off + 8] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="implausible"):
        decode_flac(bytes(good))
    # ADVICE r12: the original len·65536 cap was 10× looser than its
    # own derivation — a >=1 MiB file could still declare the full
    # 2^36 (512 GB). The derived (size//10+1)·65535 bound must reject
    # the same declaration on a 1.2 MiB payload too.
    big = bytes(good) + b"\x00" * (1_200_000 - len(good))
    with pytest.raises(ValueError, match="implausible"):
        decode_flac(big)


# ----------------------- lossless round-trips -----------------------

def test_roundtrip_families_exact_and_compress():
    rng = np.random.default_rng(11)
    t = np.arange(12000)
    cases = {
        "smooth": (1000 * np.sin(t / 50)).astype(np.int64),
        "ramp": (t % 5000 - 2500).astype(np.int64),
        "noise": rng.integers(-32768, 32768, 12000),
        "constant": np.full(12000, -123, dtype=np.int64),
        "extremes": np.tile([32767, -32768, 0], 4000).astype(np.int64),
    }
    ratios = {}
    for name, x in cases.items():
        data = encode_flac(8000, x)
        rate, s = decode_flac(data)
        assert rate == 8000
        assert np.array_equal(s.astype(np.int64), x), name
        ratios[name] = len(data) / (2 * x.size)
    assert ratios["smooth"] < 0.2          # real compression
    assert ratios["constant"] < 0.01
    assert ratios["noise"] < 1.1           # bounded expansion on noise


def test_multi_frame_and_partial_last_block():
    rng = np.random.default_rng(5)
    x = rng.integers(-3000, 3000, BLOCK_SIZE * 2 + 777)
    rate, s = decode_flac(encode_flac(8000, x))
    assert np.array_equal(s.astype(np.int64), x)


def test_escape_coded_residuals_roundtrip():
    # rice_cap=0 forces the quotients so large the encoder escapes to
    # verbatim residuals — the decoder's escape branch runs on a real
    # file, and losslessness still holds bit-exactly.
    rng = np.random.default_rng(9)
    x = rng.integers(-32768, 32768, 3000)
    lo = encode_flac(8000, x, rice_cap=0)
    hi = encode_flac(8000, x, rice_cap=14)
    assert len(lo) != len(hi)  # genuinely different residual coding
    for data in (lo, hi):
        assert np.array_equal(decode_flac(data)[1].astype(np.int64), x)


def test_empty_and_single_sample():
    assert decode_flac(encode_flac(8000, np.array([], dtype=np.int64)))[1].size == 0
    assert list(decode_flac(encode_flac(8000, np.array([-7])))[1]) == [-7]


def test_signal_features_closed_form():
    x = np.array([100, -200, 300, 0], dtype=np.int64)
    rate, n, dur, energy, peak = flac_signal_features(encode_flac(8000, x))
    assert (rate, n, dur) == (8000, 4, 4 * 1000 // 8000)
    assert energy == int((x * x).sum())
    assert peak == 300


def test_encoder_validates_inputs():
    with pytest.raises(ValueError, match="int16"):
        encode_flac(8000, np.array([40000]))
    with pytest.raises(ValueError, match="sample rate"):
        encode_flac(0, np.array([1]))


# ----------------------- hypothesis properties ----------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        x=arrays(
            np.int64,
            st.integers(0, 400),
            elements=st.integers(-32768, 32767),
        ),
        cap=st.integers(0, 14),
    )
    def test_lossless_roundtrip_property(x, cap):
        rate, s = decode_flac(encode_flac(8000, x, rice_cap=cap))
        assert rate == 8000
        assert np.array_equal(s.astype(np.int64), x)

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=96))
    def test_decoder_never_crashes_on_junk(junk):
        for payload in (junk, b"fLaC" + junk):
            try:
                decode_flac(payload)
            except ValueError:
                pass  # the ONLY acceptable failure mode

except ImportError:  # hypothesis is baked in; belt-and-braces gate
    pass
