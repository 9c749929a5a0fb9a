"""Round-10 PNG codec: the first COMPRESSED container through the pure
real-decode path (PNG's only compression is RFC-1951 inflate — stdlib zlib —
so unlike JPEG/H.264 it does not belong behind the PIL gate).

Coverage: hand-pinned filter reconstruction against spec arithmetic (an
encode/decode pair can be "consistent but both wrong"; the pin can't),
roundtrips across color types / filters / sizes (hypothesis-fuzzed), CRC and
truncation quarantine through the sniff scan, the honest Adam7/bit-depth
gates, and PIL-independence of PNG hashing (previously PNG REQUIRED the PIL
tier; a poisoned PIL now proves the pure path never consults it)."""

from __future__ import annotations

import struct
import sys
import types
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kda_flink_demo_spark.operators.llm import imaging, synth_media
from kda_flink_demo_spark.operators.llm.image_dedup import (
    image_hash_bits,
    pack_bits_i64,
    pixels_to_8x8_gray,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(ihdr: tuple, scanlines: bytes, extra: bytes = b"") -> bytes:
    return (
        imaging.PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr))
        + extra
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Filter reconstruction pinned against hand-computed spec arithmetic
# ---------------------------------------------------------------------------


def test_unfilter_pinned_by_hand():
    """3×4 gray raster, one row per non-trivial filter type, reconstruction
    worked out by hand from the PNG spec (Sub lane-add, Up prior-row add,
    Average floor-mean, Paeth predictor tie rules)."""
    scanlines = (
        b"\x01" + bytes([10, 5, 5])  # Sub    -> 10, 15, 20
        + b"\x02" + bytes([1, 2, 3])  # Up     -> 11, 17, 23
        + b"\x03" + bytes([4, 5, 6])  # Average-> 9, 18, 26
        + b"\x04" + bytes([7, 8, 9])  # Paeth  -> 16, 26, 35
    )
    w, h, c, px = imaging.decode_png(_png((3, 4, 8, 0, 0, 0, 0), scanlines))
    assert (w, h, c) == (3, 4, 1)
    expected = np.array(
        [[10, 15, 20], [11, 17, 23], [9, 18, 26], [16, 26, 35]], dtype=np.uint8
    )
    assert np.array_equal(px[:, :, 0], expected)


def test_unfilter_sub_wraps_mod_256():
    scanlines = b"\x01" + bytes([200, 100, 100])
    _, _, _, px = imaging.decode_png(_png((3, 1, 8, 0, 0, 0, 0), scanlines))
    assert list(px[0, :, 0]) == [200, 44, 144]  # 300 % 256 = 44


def test_paeth_uses_bytes_per_pixel_lanes():
    """RGB Paeth: left/up-left are bpp bytes back, not 1 — a byte-lane slip
    moves channel values between channels."""
    row0 = bytes([100, 0, 50, 10, 0, 200])
    row1 = bytes([5, 5, 5, 5, 5, 5])
    raw = b"\x00" + row0 + b"\x04" + row1
    _, _, _, px = imaging.decode_png(_png((2, 2, 8, 2, 0, 0, 0), raw))
    assert list(px[0].flatten()) == [100, 0, 50, 10, 0, 200]
    # Paeth x0: left=0, up=row0 pixel0, upleft=0 -> pred = up
    assert list(px[1, 0]) == [105, 5, 55]
    # x1: per lane p = left + up − upleft; lane0: 105+10−100=15 → pa=|15−105|=90,
    # pb=5, pc=85 → pred=up=10 → 15; lane1: 5+0−0=5 → pa=0 → pred=left=5 → 10;
    # lane2: 55+200−50=205 → pa=150, pb=5, pc=155 → pred=up=200 → 205
    assert list(px[1, 1]) == [15, 10, 205]


# ---------------------------------------------------------------------------
# Roundtrips (encoder is the corpus writer — decode must invert it exactly)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_per_row", [False, True])
def test_roundtrip_color_types(c, filter_per_row):
    rng = np.random.default_rng(20 * c + filter_per_row)
    px = rng.integers(0, 256, size=(13, 7, c), dtype=np.uint8)
    w, h, cc, out = imaging.decode_png(
        imaging.encode_png(px, filter_per_row=filter_per_row)
    )
    assert (w, h, cc) == (7, 13, c)
    assert np.array_equal(out, px)


def test_roundtrip_palette_expands_to_rgb():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, size=(6, 9, 1), dtype=np.uint8)
    w, h, c, out = imaging.decode_png(
        imaging.encode_png(idx, color_type=3, palette=pal, filter_per_row=True)
    )
    assert (w, h, c) == (9, 6, 3)
    assert np.array_equal(out, pal[idx[:, :, 0]])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    fpr=st.booleans(),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_fuzz(w, h, c, fpr, interlace, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    ww, hh, cc, out = imaging.decode_png(
        imaging.encode_png(px, filter_per_row=fpr, interlace=interlace)
    )
    assert (ww, hh, cc) == (w, h, c) and np.array_equal(out, px)


@pytest.mark.parametrize("depth,step", [(1, 255), (2, 85), (4, 17)])
@pytest.mark.parametrize("interlace", [False, True])
def test_subbyte_gray_roundtrip(depth, step, interlace):
    rng = np.random.default_rng(depth)
    vals = (rng.integers(0, 1 << depth, size=(9, 17, 1)) * step).astype(np.uint8)
    b = imaging.encode_png(
        vals, color_type=0, depth=depth, interlace=interlace, filter_per_row=True
    )
    w, h, c, out = imaging.decode_png(b)
    assert (w, h, c) == (17, 9, 1) and np.array_equal(out, vals)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_roundtrip(depth):
    rng = np.random.default_rng(depth + 10)
    n = 1 << depth
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(7, 11, 1)).astype(np.uint8)
    b = imaging.encode_png(idx, color_type=3, palette=pal, depth=depth, interlace=True)
    w, h, c, out = imaging.decode_png(b)
    assert (w, h, c) == (11, 7, 3) and np.array_equal(out, pal[idx[:, :, 0]])


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_16bit_roundtrips_via_high_byte(c):
    rng = np.random.default_rng(c + 20)
    px = rng.integers(0, 256, size=(6, 8, c), dtype=np.uint8)
    b = imaging.encode_png(px, depth=16, filter_per_row=True, interlace=True)
    w, h, cc, out = imaging.decode_png(b)
    assert (w, h, cc) == (8, 6, c) and np.array_equal(out, px)


def test_invalid_depth_color_combo_is_value_error():
    # depth 2 RGB and depth 16 palette are spec-invalid -> corrupt, not gated
    with pytest.raises(ValueError, match="depth"):
        imaging.decode_png(_png((2, 2, 2, 2, 0, 0, 0), b""))
    with pytest.raises(ValueError, match="depth"):
        imaging.decode_png(_png((2, 2, 16, 3, 0, 0, 0), b""))


def test_decode_image_dispatches_png():
    px = np.full((4, 4, 3), 77, dtype=np.uint8)
    w, h, c, out = imaging.decode_image(imaging.encode_png(px))
    assert (w, h, c) == (4, 4, 3) and np.array_equal(out, px)


def test_gray_alpha_luma_is_channel_zero():
    """Color type 4 decodes to (h, w, 2); luma paths must read channel 0 and
    ignore alpha — both the sniff brightness and the aHash gray."""
    px = np.zeros((8, 8, 2), dtype=np.uint8)
    px[:, :, 0] = 60
    px[:, :, 1] = 9  # junk alpha that must not leak into luma
    b = imaging.encode_png(px)
    _, _, c, out = imaging.decode_png(b)
    assert c == 2
    assert imaging.grayscale_mean(out) == 60.0
    assert np.all(pixels_to_8x8_gray(out, 2) == 60)


# ---------------------------------------------------------------------------
# Honest gates and quarantine
# ---------------------------------------------------------------------------


def test_adam7_roundtrip_and_plain_equivalence():
    """Adam7 is a byte permutation, not a pixel transform: interlaced and
    plain encodes of the same raster must decode to identical pixels, at
    sizes below/at/above the 8×8 pass grid."""
    rng = np.random.default_rng(77)
    for c in (1, 3, 4):
        for h, w in [(1, 1), (2, 3), (7, 7), (8, 8), (16, 16), (13, 29)]:
            px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            il = imaging.encode_png(px, interlace=True, filter_per_row=True)
            ww, hh, cc, out = imaging.decode_png(il)
            assert (ww, hh, cc) == (w, h, c) and np.array_equal(out, px)
            assert np.array_equal(out, imaging.decode_png(imaging.encode_png(px))[3])


def test_adam7_truncated_pass_data_raises():
    short = _png((16, 16, 8, 0, 0, 0, 1), b"\x00" + bytes(16))  # one pass row only
    with pytest.raises(ValueError, match="interlaced"):
        imaging.decode_png(short)


def test_crc_mismatch_raises_value_error():
    b = bytearray(imaging.encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    b[b.index(b"IDAT") + 6] ^= 0xFF  # a byte inside IDAT's data
    with pytest.raises(ValueError, match="CRC"):
        imaging.decode_png(bytes(b))


def test_truncated_and_oversized_palette_raise():
    with pytest.raises(ValueError):
        imaging.decode_png(imaging.PNG_SIGNATURE + b"\x00\x00\x00\x0dIHDR")
    # palette index beyond PLTE length
    raw = b"\x00" + bytes([5])
    pal = _chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))  # 2 entries, index 5 invalid
    with pytest.raises(ValueError, match="palette"):
        imaging.decode_png(_png((1, 1, 8, 3, 0, 0, 0), raw, extra=pal))


def test_ancillary_trns_chunk_is_skipped():
    raw = b"\x00" + bytes([0])
    pal = _chunk(b"PLTE", bytes([10, 20, 30])) + _chunk(b"tRNS", b"\x80")
    _, _, c, px = imaging.decode_png(_png((1, 1, 8, 3, 0, 0, 0), raw, extra=pal))
    assert c == 3 and list(px[0, 0]) == [10, 20, 30]


def test_sniff_quarantines_corrupt_png(spark):
    """Signature-matching but undecodable payloads must land as 'corrupt'
    quarantine rows, never exceptions — the 100 TB scan contract."""
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    good = imaging.encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))
    bad_crc = bytearray(good)
    bad_crc[35] ^= 0xFF
    rows = [
        (0, good),
        (1, bytes(bad_crc)),
        (2, imaging.PNG_SIGNATURE + b"garbage-after-signature"),
        (3, _png((2, 2, 8, 0, 0, 0, 1), b"")),  # interlaced, no pass data -> corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["modality"] for r in sniff_media_features(df).collect()}
    assert got == {0: "image", 1: "corrupt", 2: "corrupt", 3: "corrupt"}


# ---------------------------------------------------------------------------
# PIL-independence + corpus/pattern parity (the LUT pin's driver-side twin)
# ---------------------------------------------------------------------------


def test_png_hashing_never_consults_pil(monkeypatch):
    """PNG used to be exactly the format that fell through to the PIL tier;
    now the pure path owns it. A PIL whose Image.open RAISES proves no PNG
    payload reaches that tier anymore."""

    def _boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("PNG payload consulted PIL")

    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = _boom
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    for d in (0, 1, 2, 3, 21, 42, 63, 85):
        b = _synth_png_payload(d)
        got = int(pack_bits_i64(image_hash_bits(b)[None, :])[0]) & (2**64 - 1)
        assert got == synth_media.image_pattern(d), d


def _synth_png_payload(d: int) -> bytes:
    """Driver-side replica of synth_media.synth_pngs' per-doc kernel."""
    off = (d // 20 % 8) * 5
    lo, hi = 40 + off, 200 + off
    bits = np.array(
        [(synth_media.image_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    ).reshape(8, 8)
    big = np.repeat(np.repeat(bits, 2, axis=0), 2, axis=1)
    m = d % 4
    il = d % 8 >= 4
    if m == 2:
        pal = np.array([[lo] * 3, [hi] * 3], dtype=np.uint8)
        return imaging.encode_png(
            big[:, :, None].astype(np.uint8), color_type=3, palette=pal,
            filter_per_row=True, interlace=il, depth=(1, 2, 4, 8)[(d // 8) % 4],
        )
    lvl = np.where(big == 1, hi, lo).astype(np.uint8)[:, :, None]
    if m == 1:
        lvl = np.repeat(lvl, 3, axis=2)
    elif m == 3:
        lvl = np.concatenate([np.repeat(lvl, 3, axis=2), np.full_like(lvl, 255)], axis=2)
    return imaging.encode_png(
        lvl, filter_per_row=True, interlace=il, depth=16 if (d // 8) % 2 else 8
    )


def test_synth_pngs_kernel_matches_local_replica(spark):
    """The Spark corpus generator and the driver-side replica emit identical
    bytes — so the PIL-independence pin above covers the real corpus."""
    from tests.conftest import SF_DIR

    from kda_flink_demo_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    rows = synth_media.synth_pngs(docs).collect()
    assert len(rows) == 40
    for r in rows:
        assert bytes(r["payload"]) == _synth_png_payload(int(r["doc_id"]))
