"""Goldens for the pure-Python baseline JPEG codec.

Same discipline as tests/test_codecs.py: the decoder is exercised on a
file built BY HAND (every marker byte literal, the entropy byte
hand-computed from the Annex K code tables), not just on our encoder's
output; canonical Huffman construction is spot-checked against
well-known Annex K code values; the DCT/quantize/IDCT math path is
re-derived NAIVELY (double-loop cosine sums) as a third
implementation; the even-constant-block exactness class the
mm_decoded_jpeg oracle leans on is pinned exhaustively over all 128
even values; and malformed / out-of-envelope inputs reject loudly."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from molgraphdb_spark.functions.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    build_huffman_codes,
    decode_jpeg,
    encode_jpeg,
    jpeg_luminance_features,
)


# ----------------------- Huffman construction -----------------------

def test_annex_k_canonical_codes_spot_values():
    # Known Annex K code assignments (public, printable from the spec):
    dc = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    assert dc[0] == (2, 0b00)
    assert dc[1] == (3, 0b010)
    assert dc[2] == (3, 0b011)
    assert dc[5] == (3, 0b110)
    assert dc[6] == (4, 0b1110)
    assert dc[11] == (9, 0b111111110)
    ac = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert ac[0x00] == (4, 0b1010)          # EOB
    assert ac[0x01] == (2, 0b00)            # run 0, size 1
    assert ac[0x11] == (4, 0b1100)          # run 1, size 1
    assert ac[0xF0] == (11, 0b11111111001)  # ZRL


def test_huffman_codes_are_prefix_free():
    codes = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(codes) == 162
    as_strings = sorted(format(c, f"0{ln}b") for ln, c in codes.values())
    for a, b in zip(as_strings, as_strings[1:]):
        assert not b.startswith(a), f"{a} is a prefix of {b}"


# ----------------------- hand-built decoder goldens -----------------

def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _hand_built_gray(entropy: bytes) -> bytes:
    """A complete 8x8 grayscale baseline JPEG written marker by marker
    (Annex K luma tables), with the caller's hand-computed entropy."""
    dqt = bytes([0]) + bytes(int(QUANT_LUMA.reshape(64)[i]) for i in ZIGZAG)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xFF\xD8"
        + _seg(0xFFDB, dqt) + _seg(0xFFC0, sof) + _seg(0xFFC4, dht)
        + _seg(0xFFDA, sos) + entropy + b"\xFF\xD9"
    )


def test_hand_built_constant_128_block():
    # Constant 128 => level-shifted block is all zero => DC diff 0, no
    # ACs. Bits: DC cat0 '00' + EOB '1010' = 001010, padded '11'
    # => 0b00101011 = 0x2B. One hand-computed entropy byte.
    w, h, nc, px = decode_jpeg(_hand_built_gray(bytes([0x2B])))
    assert (w, h, nc) == (8, 8, 1)
    assert px == bytes([128] * 64)


def test_hand_built_constant_130_block():
    # Constant 130 => DC = 8*(130-128) = 16, quantized by 16 => 1.
    # Bits: DC cat1 '010' + amplitude '1' + EOB '1010' = 01011010
    # = 0x5A exactly (no padding needed).
    w, h, nc, px = decode_jpeg(_hand_built_gray(bytes([0x5A])))
    assert (w, h, nc) == (8, 8, 1)
    assert px == bytes([130] * 64)


def test_hand_built_with_app0_and_comment_segments():
    # APPn/COM segments are length-skipped wherever they appear.
    base = _hand_built_gray(bytes([0x2B]))
    spliced = (
        base[:2]
        + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xFFFE, b"a comment")
        + base[2:]
    )
    assert decode_jpeg(spliced)[3] == bytes([128] * 64)


# ----------------------- exactness class ----------------------------

def test_even_constant_blocks_exact_all_values():
    # THE class mm_decoded_jpeg's closed-form oracle relies on: every
    # even v in 0..254, as a constant 8x8 block, round-trips bit-exact
    # (module docstring derivation). Exhaustive over all 128 values in
    # one 8-blocks-wide image per batch of 8.
    vals = np.arange(0, 256, 2, dtype=np.uint8)
    img = np.kron(vals.reshape(16, 8), np.ones((8, 8), dtype=np.uint8))
    w, h, nc, out = decode_jpeg(encode_jpeg(64, 128, img.tobytes(), 1))
    assert (w, h, nc) == (64, 128, 1)
    assert np.array_equal(np.frombuffer(out, dtype=np.uint8).reshape(128, 64), img)


def test_even_constant_blocks_exact_color():
    # R=G=B=v (even) => Y=v, Cb=Cr=128 constant planes — exact through
    # the color path too (BT.601 full-range forward+inverse).
    rng = np.random.default_rng(11)
    v = (rng.integers(0, 128, 12) * 2).astype(np.uint8)
    gray = np.kron(v.reshape(3, 4), np.ones((8, 8), dtype=np.uint8))
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    w, h, nc, out = decode_jpeg(encode_jpeg(32, 24, rgb.tobytes(), 3))
    assert (w, h, nc) == (32, 24, 3)
    assert np.array_equal(np.frombuffer(out, dtype=np.uint8).reshape(24, 32, 3), rgb)


def test_odd_constant_blocks_within_one():
    # Arbitrary constant blocks: only the DC quantizer (16) rounds, so
    # the reconstruction error is at most 16/2 / 8 = 1 per pixel.
    vals = np.arange(1, 256, 2, dtype=np.uint8)[:24]
    img = np.kron(vals.reshape(4, 6), np.ones((8, 8), dtype=np.uint8))
    _, _, _, out = decode_jpeg(encode_jpeg(48, 32, img.tobytes(), 1))
    err = np.abs(
        np.frombuffer(out, dtype=np.uint8).reshape(32, 48).astype(int) - img.astype(int)
    )
    assert err.max() <= 1


def test_luminance_features_match_closed_form():
    # The exact formula the DuckDB oracle computes (floor semantics).
    v = np.array([0, 2, 54, 128, 200, 254], dtype=np.uint8)
    img = np.kron(v.reshape(2, 3), np.ones((8, 8), dtype=np.uint8))
    w, h, luma, peak = jpeg_luminance_features(encode_jpeg(24, 16, img.tobytes(), 1))
    assert (w, h) == (24, 16)
    assert luma == int(v.astype(np.int64).sum()) * 1000 // 6
    assert peak == 254


# ----------------------- third implementation -----------------------

def _naive_dct(block: np.ndarray) -> np.ndarray:
    """Textbook T.81 forward DCT: four nested cosine loops, no matrix."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_matrix_dct_matches_naive_loops():
    rng = np.random.default_rng(3)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128.0
    from molgraphdb_spark.functions.jpeg import _DCT_M

    fast = np.einsum("ux,xy,vy->uv", _DCT_M, block, _DCT_M)
    assert np.allclose(fast, _naive_dct(block), atol=1e-9)


def test_decode_matches_naive_reference_pipeline():
    # Third implementation of the whole math path: quantize with naive
    # DCT, dequantize, naive IDCT — what the decoder OUGHT to emit for
    # a single-block image, compared against the real bitstream decode.
    rng = np.random.default_rng(5)
    block = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    q = np.rint(_naive_dct(block.astype(np.float64) - 128.0) / QUANT_LUMA)
    deq = (q * QUANT_LUMA).astype(np.float64)
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * deq[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = 0.25 * s + 128.0
    ref = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg(8, 8, block.tobytes(), 1))
    assert np.array_equal(np.frombuffer(out, dtype=np.uint8).reshape(8, 8), ref)


# ----------------------- structural behavior ------------------------

def test_non_multiple_of_8_dimensions():
    # 13x11: edge-replicated to 16x16 internally, cropped on decode.
    rng = np.random.default_rng(9)
    img = (rng.integers(0, 128, (11, 13)) * 2).astype(np.uint8)
    w, h, nc, out = decode_jpeg(encode_jpeg(13, 11, img.tobytes(), 1))
    assert (w, h, nc) == (13, 11, 1)
    assert len(out) == 13 * 11


def test_entropy_ff_byte_stuffing_roundtrip():
    # Gradient images produce dense AC activity; some entropy byte hits
    # 0xFF with non-negligible probability across many images. Assert
    # the codec round-trips a batch that DOES contain stuffed bytes.
    rng = np.random.default_rng(13)
    saw_stuffed = False
    for _ in range(40):
        img = rng.integers(0, 256, (8, 16)).astype(np.uint8)
        data = encode_jpeg(16, 8, img.tobytes(), 1)
        if b"\xFF\x00" in data:
            saw_stuffed = True
        decode_jpeg(data)  # must parse cleanly regardless
    assert saw_stuffed, "no test image exercised 0xFF byte stuffing"


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"PK" + d[2:], "SOI"),                         # wrong magic
        (lambda d: d[:-2], "EOI"),                                # truncated
        (lambda d: d[: len(d) // 2], ""),                         # mid-file cut
        (lambda d: d.replace(b"\xFF\xC0", b"\xFF\xC2", 1), "progressive"),
        (lambda d: d.replace(b"\xFF\xC0", b"\xFF\xC9", 1), "arithmetic"),
        # ADVICE r11: marker bodies shorter than their fixed headers
        # leaked struct.error through the loud-ValueError contract — a
        # 10-byte SOI + SOF0 with seglen=4 (2-byte body) hit
        # struct.unpack('>BHHB', body[:6]) on a 2-byte buffer.
        (lambda d: b"\xFF\xD8\xFF\xC0\x00\x04\x08\x00", "SOF0 header truncated"),
        (lambda d: b"\xFF\xD8\xFF\xDD\x00\x03\x00", "DRI segment truncated"),
        (
            # SOF0 declares 3 components but carries specs for none
            lambda d: b"\xFF\xD8\xFF\xC0\x00\x08\x08\x00\x08\x00\x08\x03",
            "component specs truncated",
        ),
        (lambda d: b"\xFF\xD8\xFF\xC4\x00\x05\x00\x01\x02", "DHT bits table truncated"),
    ],
)
def test_rejects_malformed(mutate, msg):
    good = encode_jpeg(16, 16, bytes(256), 1)
    with pytest.raises(ValueError, match=msg):
        decode_jpeg(mutate(good))


def test_rejects_implausible_sof_dimensions():
    # ADVICE r11: declared 65535x65535 dims would reserve ~34 GB per
    # component before the entropy decode ever discovers the stream is
    # empty — the plausibility cap must reject BEFORE allocating.
    good = encode_jpeg(8, 8, bytes(64), 1)
    sof_at = good.index(b"\xFF\xC0")
    dims_at = sof_at + 5  # marker(2) + len(2) + precision(1)
    bad = good[:dims_at] + b"\xFF\xFF\xFF\xFF" + good[dims_at + 4 :]
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bad)


def test_truncated_sos_header_rejects():
    good = encode_jpeg(8, 8, bytes(64), 1)
    sos_at = good.index(b"\xFF\xDA")
    # keep the SOS marker but shrink its body to 1 byte (ns only)
    bad = good[:sos_at] + b"\xFF\xDA\x00\x03\x01"
    with pytest.raises(ValueError, match=""):
        decode_jpeg(bad)


def test_rejects_subsampled_chroma():
    # Flip component 1's sampling factors to 2x2 (what a 4:2:0 encoder
    # writes) — outside the envelope, must be a loud rejection.
    good = encode_jpeg(8, 8, bytes(64 * 3), 3)
    sof_at = good.index(b"\xFF\xC0")
    comp0_hv = sof_at + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc+cid
    bad = good[:comp0_hv] + b"\x22" + good[comp0_hv + 1 :]
    with pytest.raises(ValueError, match="1x1 sampling"):
        decode_jpeg(bad)


def test_rejects_duplicate_sof_and_scan_order_mismatch():
    good = encode_jpeg(8, 8, bytes(64), 1)
    sof_at = good.index(b"\xFF\xC0")
    sof_end = sof_at + 2 + struct.unpack(">H", good[sof_at + 2 : sof_at + 4])[0]
    dup = good[:sof_end] + good[sof_at:sof_end] + good[sof_end:]
    with pytest.raises(ValueError, match="multiple SOF0"):
        decode_jpeg(dup)
    sos_at = good.index(b"\xFF\xDA")
    cs_at = sos_at + 5  # marker(2) + len(2) + ns(1) -> first component id
    swapped = good[:cs_at] + b"\x02" + good[cs_at + 1 :]
    with pytest.raises(ValueError, match="disagrees with frame"):
        decode_jpeg(swapped)


def test_rejects_restart_intervals():
    good = encode_jpeg(8, 8, bytes(64), 1)
    dri = _seg(0xFFDD, struct.pack(">H", 4))
    bad = good[:2] + dri + good[2:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bad)


def test_encoder_validates_inputs():
    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg(0, 8, b"", 1)
    with pytest.raises(ValueError, match="components"):
        encode_jpeg(8, 8, bytes(128), 2)
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_jpeg(8, 8, bytes(63), 1)


# ----------------------- hypothesis properties ----------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        bw=st.integers(1, 4),
        bh=st.integers(1, 3),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_even_block_exactness_property(bw, bh, seed):
        rng = np.random.default_rng(seed)
        v = (rng.integers(0, 128, bw * bh) * 2).astype(np.uint8)
        img = np.kron(v.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8))
        _, _, _, out = decode_jpeg(encode_jpeg(bw * 8, bh * 8, img.tobytes(), 1))
        assert np.array_equal(
            np.frombuffer(out, dtype=np.uint8).reshape(bh * 8, bw * 8), img
        )

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
    def test_arbitrary_images_decode_in_range(w, h, seed):
        # Lossy format: no exactness claim for arbitrary pixels — but
        # decode(encode(x)) must always parse, keep dimensions, and
        # stay in byte range (clamping).
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, h * w).astype(np.uint8)
        dw, dh, nc, out = decode_jpeg(encode_jpeg(w, h, img.tobytes(), 1))
        assert (dw, dh, nc) == (w, h, 1)
        assert len(out) == w * h

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=96))
    def test_decoder_never_crashes_on_junk(junk):
        for payload in (junk, b"\xFF\xD8" + junk):
            try:
                decode_jpeg(payload)
            except ValueError:
                pass  # the ONLY acceptable failure mode

except ImportError:  # hypothesis is baked in; belt-and-braces gate
    pass
