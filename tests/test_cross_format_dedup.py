"""The payoff of canonical pure-path hashing across SIX image containers:
the SAME designed pattern encoded as PPM, PNG (any color type, interlaced or
not), GIF, baseline JPEG and BMP must produce the IDENTICAL 64-bit aHash —
so the dedup machinery detects cross-format re-encodes of one image as exact
fingerprint duplicates, which is precisely what a crawl dedup needs (the
same picture circulates as .png, .gif, .jpg and .bmp). BMP gets its LUT pin
here too (the one image container without a dedicated driver row)."""

from __future__ import annotations

import numpy as np

from kda_flink_demo_spark.operators.llm import imaging, jpeg, synth_media
from kda_flink_demo_spark.operators.llm.image_dedup import (
    hash_near_dup_pairs,
    image_ahash,
    image_hash_bits,
    pack_bits_i64,
)


def _pattern_gray(d: int) -> np.ndarray:
    """(16, 16) uint8: the designed pattern at the doc's brightness offset."""
    off = (d // 20 % 8) * 5
    bits = np.array(
        [(synth_media.image_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    ).reshape(8, 8)
    lvl = np.where(bits == 1, 200 + off, 40 + off).astype(np.uint8)
    return np.repeat(np.repeat(lvl, 2, axis=0), 2, axis=1)


def _encodings(d: int) -> dict[str, bytes]:
    g16 = _pattern_gray(d)
    rgb = np.repeat(g16[:, :, None], 3, axis=2)
    off = (d // 20 % 8) * 5
    pal = np.array([[40 + off] * 3, [200 + off] * 3], dtype=np.uint8)
    idx = (g16 > 128).astype(np.uint8)
    # JPEG needs 8x8-constant blocks for exactness: 8x upscale of the 8x8
    jlvl = np.repeat(np.repeat(_pattern_gray(d)[::2, ::2], 8, 0), 8, 1)
    return {
        "ppm": imaging.encode_ppm(rgb),
        "png": imaging.encode_png(rgb, filter_per_row=True, interlace=bool(d % 2)),
        "png_pal": imaging.encode_png(idx[:, :, None], color_type=3, palette=pal),
        "gif": imaging.encode_gif([idx], pal, interlace=bool(d % 2)),
        "jpeg": jpeg.encode_jpeg_gray(jlvl, dri=2 if d % 3 == 0 else 0),
        "bmp": imaging.encode_bmp(rgb),
    }


def test_every_container_hashes_to_the_same_designed_value():
    """Driver-side: all six encodings of one doc hash to image_pattern(d) —
    including BMP, whose LUT pin lives here."""
    for d in (0, 1, 2, 3, 7, 25, 42, 61, 78):
        expect = synth_media.image_pattern(d)
        for fmt, payload in _encodings(d).items():
            got = int(pack_bits_i64(image_hash_bits(payload)[None, :])[0])
            assert got & (2**64 - 1) == expect, (d, fmt)


def test_cross_format_reencodes_collide_as_exact_dups(spark):
    """Spark-side: one pattern in six containers → the pair machinery finds
    all 15 cross-encoding pairs at Hamming 0, and nothing across groups."""
    rows = []
    rid = 0
    for d in (5, 11):  # two distinct groups
        for payload in _encodings(d).values():
            rows.append((rid * 100 + d, payload))  # ids encode (replica, doc)
            rid += 1
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_ahash(df)
    pairs = hash_near_dup_pairs(hashes, max_hamming=3).collect()
    same = [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs]
    # 6 encodings per group -> C(6,2)=15 pairs per group, all at hamming 0
    assert len(same) == 30
    assert all(h == 0 for _, _, h in same)
    assert all((a % 100 == 5) == (b % 100 == 5) for a, b, _ in same)
