"""Round-10 GIF codec: the second compressed container through the pure
decode path — GIF's LZW is fully specifiable in a page, and GIF is lossless
and palettized, so decoded pixels (and therefore the aHash LUT pin) are
exact. Coverage: LZW roundtrips incl. variable code widths, table overflow
(CLEAR emission) and the KwKwK case, GIF row interlace, multi-frame
composition at offsets, quarantine of corrupt streams through the sniff
scan, and corpus/replica parity."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kda_flink_demo_spark.operators.llm import imaging, synth_media
from kda_flink_demo_spark.operators.llm.image_dedup import image_hash_bits, pack_bits_i64


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def test_lzw_kwkwk_case():
    """The code-equals-next-table-slot case (cScSc strings): LZW's one
    special rule. 'ababab...' with 2 colors triggers it immediately."""
    idx = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1], dtype=np.uint8)
    enc = imaging._lzw_encode(idx, 2)
    assert np.array_equal(imaging._lzw_decode(enc, 2, len(idx)), idx)


def test_lzw_table_overflow_emits_clear():
    """A long high-entropy stream must overflow the 4096-entry table; the
    encoder emits CLEAR and the decoder must reset widths with it."""
    idx = np.random.default_rng(0).integers(0, 256, size=30000).astype(np.uint8)
    enc = imaging._lzw_encode(idx, 8)
    assert np.array_equal(imaging._lzw_decode(enc, 8, len(idx)), idx)


def test_lzw_truncated_stream_raises():
    idx = np.arange(16, dtype=np.uint8)
    enc = imaging._lzw_encode(idx, 4)
    with pytest.raises(ValueError):
        imaging._lzw_decode(enc[: len(enc) // 2], 4, 64)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4000),
    ncolors=st.sampled_from([2, 4, 7, 16, 100, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lzw_roundtrip_fuzz(n, ncolors, seed):
    idx = np.random.default_rng(seed).integers(0, ncolors, size=n).astype(np.uint8)
    mcs = max(2, int(np.ceil(np.log2(ncolors))))
    assert np.array_equal(
        imaging._lzw_decode(imaging._lzw_encode(idx, mcs), mcs, n), idx
    )


# ---------------------------------------------------------------------------
# GIF container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_multiframe(interlace):
    rng = np.random.default_rng(interlace)
    pal = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    frames = [rng.integers(0, 6, size=(11, 7)).astype(np.uint8) for _ in range(4)]
    w, h, out = imaging.decode_gif(imaging.encode_gif(frames, pal, interlace=interlace))
    assert (w, h) == (7, 11) and len(out) == 4
    for fi, fo in zip(frames, out):
        assert np.array_equal(fo, pal[fi])


def test_gif_decode_image_takes_first_frame():
    pal = np.array([[1, 2, 3], [200, 100, 50]], dtype=np.uint8)
    f0 = np.zeros((4, 4), dtype=np.uint8)
    f1 = np.ones((4, 4), dtype=np.uint8)
    w, h, c, px = imaging.decode_image(imaging.encode_gif([f0, f1], pal))
    assert (w, h, c) == (4, 4, 3) and np.array_equal(px, pal[f0])


def test_gif_partial_frame_composites_over_previous():
    """A second image block smaller than the logical screen overwrites only
    its (x, y) window — the rest of the screen keeps frame 1's pixels."""
    import struct as _struct

    pal = np.array([[10, 10, 10], [250, 250, 250]], dtype=np.uint8)
    full = np.zeros((6, 6), dtype=np.uint8)
    b = bytearray(imaging.encode_gif([full], pal))
    # append a 2×2 all-ones image block at offset (3, 1) before the trailer
    patch = imaging._lzw_encode(np.ones(4, dtype=np.uint8), 2)
    blk = (
        b"\x2c"
        + _struct.pack("<HHHHB", 3, 1, 2, 2, 0)
        + bytes([2, len(patch)])
        + patch
        + b"\x00"
    )
    b = bytes(b[:-1]) + blk + b"\x3b"
    w, h, frames = imaging.decode_gif(b)
    assert len(frames) == 2
    expect = pal[full].copy()
    expect[1:3, 3:5] = pal[1]
    assert np.array_equal(frames[1], expect)
    assert np.array_equal(frames[0], pal[full])  # frame 1 not mutated in place


def test_gif_extension_blocks_are_skipped():
    pal = np.array([[5, 5, 5], [99, 99, 99]], dtype=np.uint8)
    f = np.eye(4, dtype=np.uint8)
    b = bytearray(imaging.encode_gif([f], pal))
    # inject a Graphic Control Extension right after the GCT (offset 13 + 6)
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    pos = 13 + 6
    b2 = bytes(b[:pos]) + gce + bytes(b[pos:])
    _, _, frames = imaging.decode_gif(b2)
    assert np.array_equal(frames[0], pal[f])


def test_sniff_routes_gif_as_image_and_quarantines_corrupt(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    good = imaging.encode_gif([np.ones((4, 4), dtype=np.uint8)], pal)
    rows = [
        (0, good),
        (1, b"GIF89a" + b"\x01\x02"),  # truncated header
        (2, good[: len(good) // 2]),  # truncated LZW stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["modality"], r["width"], r["brightness"])
        for r in sniff_media_features(df).collect()
    }
    assert got[0] == ("image", 4, 255.0)
    assert got[1][0] == "corrupt" and got[2][0] == "corrupt"


# ---------------------------------------------------------------------------
# Corpus parity (the driver-side twin of the gif_ahash_values LUT pin)
# ---------------------------------------------------------------------------


def _synth_gif_payload(d: int) -> bytes:
    off = (d // 20 % 8) * 5
    pal = np.array([[40 + off] * 3, [200 + off] * 3], dtype=np.uint8)
    bits = np.array(
        [(synth_media.image_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    ).reshape(8, 8)
    big = np.repeat(np.repeat(bits, 2, axis=0), 2, axis=1).astype(np.uint8)
    return imaging.encode_gif([big], pal, interlace=bool(d % 2))


def test_gif_corpus_hashes_to_designed_patterns():
    for d in range(0, 100):
        got = int(pack_bits_i64(image_hash_bits(_synth_gif_payload(d))[None, :])[0])
        assert got & (2**64 - 1) == synth_media.image_pattern(d), d


def test_synth_gifs_kernel_matches_local_replica(spark):
    from tests.conftest import SF_DIR

    from kda_flink_demo_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    rows = synth_media.synth_gifs(docs).collect()
    assert len(rows) == 40
    for r in rows:
        assert bytes(r["payload"]) == _synth_gif_payload(int(r["doc_id"]))
