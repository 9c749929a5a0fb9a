"""Round-10 baseline JPEG codec: the archetypal 'compressed codec requires
PIL' format through the pure decode path. Pins: the IDCT against an
INDEPENDENT O(n^4) textbook sum (matrix-form and direct-sum agreeing kills a
shared-transform bug class), flat-block EXACT round-trips (the property the
LUT pin rests on), Huffman canonical-code construction against spec examples,
restart-marker handling, a hand-built 4:2:0 color JPEG with flat chroma
(box upsampling + JFIF matrix pinned by independent arithmetic), honest
progressive/12-bit gates, and sniff quarantine of corrupt streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kda_flink_demo_spark.operators.llm import imaging, jpeg, synth_media
from kda_flink_demo_spark.operators.llm.image_dedup import image_hash_bits, pack_bits_i64


# ---------------------------------------------------------------------------
# Transform + table pins against independent arithmetic
# ---------------------------------------------------------------------------


def _idct_direct(coef: np.ndarray) -> np.ndarray:
    """Textbook O(n^4) IDCT sum, written independently of the matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_idct_matches_independent_direct_sum():
    rng = np.random.default_rng(0)
    for _ in range(5):
        coef = rng.integers(-512, 512, size=(8, 8)).astype(np.float64)
        assert np.allclose(jpeg._idct_block(coef), _idct_direct(coef), atol=1e-9)


def test_idct_dc_only_is_constant_dc_over_8():
    coef = np.zeros((8, 8))
    coef[0, 0] = 400.0
    assert np.allclose(jpeg._idct_block(coef), 50.0)


def test_huffman_canonical_codes_match_spec():
    """Annex-K DC luminance: category 0 -> code 00 (2 bits), category 1 ->
    010, category 5 -> 110 — the spec's own table K.3."""
    tbl = jpeg._build_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    inv = {v: (ln, code) for (ln, code), v in tbl.items()}
    assert inv[0] == (2, 0b00)
    assert inv[1] == (3, 0b010)
    assert inv[5] == (3, 0b110)
    assert inv[11] == (9, 0b111111110)


def test_extend_sign_rule():
    assert jpeg._extend(0b0, 1) == -1 and jpeg._extend(0b1, 1) == 1
    assert jpeg._extend(0b011, 3) == -4 and jpeg._extend(0b100, 3) == 4
    assert jpeg._extend(0, 0) == 0


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


def test_flat_blocks_roundtrip_exactly():
    """The property the driver LUT pin rests on: 8x8-constant blocks survive
    the lossy pipeline verbatim at DC quant step 8."""
    rng = np.random.default_rng(3)
    levels = rng.integers(0, 256, size=(5, 4))
    px = np.repeat(np.repeat(levels, 8, 0), 8, 1).astype(np.uint8)
    for dri in (0, 3):
        w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px, dri=dri))
        assert (w, h, c) == (32, 40, 1)
        assert np.array_equal(out[:, :, 0], px)


def test_restart_markers_present_and_decoded():
    rng = np.random.default_rng(4)
    px = np.repeat(np.repeat(rng.integers(0, 256, (2, 6)), 8, 0), 8, 1).astype(np.uint8)
    b = jpeg.encode_jpeg_gray(px, dri=2)
    assert b.count(b"\xff\xdd") == 1  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))  # RSTn in scan
    assert np.array_equal(jpeg.decode_jpeg(b)[3][:, :, 0], px)


def test_general_content_bounded_by_quant_noise():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(24, 16)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))[3][:, :, 0]
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 48


def test_odd_dimensions_edge_padded():
    rng = np.random.default_rng(6)
    px = np.repeat(np.repeat(rng.integers(0, 256, (2, 2)), 8, 0), 8, 1).astype(np.uint8)
    px = px[:13, :11]
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
    assert (w, h) == (11, 13) and np.array_equal(out[:, :, 0], px)


# ---------------------------------------------------------------------------
# Hand-built 4:2:0 color JPEG (flat chroma — box upsampling is exact there)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, code: int, ln: int) -> None:
        self.bits.extend((code >> k) & 1 for k in range(ln - 1, -1, -1))

    def bytes(self) -> bytes:
        self.bits.extend([1] * (-len(self.bits) % 8))
        return np.packbits(np.array(self.bits, dtype=np.uint8)).tobytes()


def _color_jpeg_flat(yv: int, cbv: int, crv: int, w: int = 16, h: int = 16) -> bytes:
    """One 4:2:0 MCU (4 Y + 1 Cb + 1 Cr), every block DC-only — built by hand
    with an independent bit writer, not the library encoder."""
    dc = jpeg._encode_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    ac = jpeg._encode_huffman(jpeg._AC_LUM_BITS, jpeg._AC_LUM_VALS)
    bw = _BitWriter()

    def put_dc(diff: int) -> None:
        s = 0 if diff == 0 else int(abs(diff)).bit_length()
        ln, code = dc[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def put_eob() -> None:
        ln, code = ac[0x00]
        bw.put(code, ln)

    # 4 Y blocks (DC diff: first = Y-128, rest 0), then Cb, then Cr
    put_dc(yv - 128); put_eob()
    for _ in range(3):
        put_dc(0); put_eob()
    put_dc(cbv - 128); put_eob()
    put_dc(crv - 128); put_eob()
    entropy = bw.bytes().replace(b"\xff", b"\xff\x00")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    q = np.full(64, 8, dtype=np.uint8)
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + q.tobytes())
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling
        + bytes([2, 0x11, 0])  # Cb: 1x1
        + bytes([3, 0x11, 0]),  # Cr: 1x1
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(jpeg._DC_LUM_BITS) + bytes(jpeg._DC_LUM_VALS)
        + bytes([0x10]) + bytes(jpeg._AC_LUM_BITS) + bytes(jpeg._AC_LUM_VALS),
    )
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += entropy + b"\xff\xd9"
    return out


def test_color_420_flat_pinned_by_independent_jfif_math():
    yv, cbv, crv = 120, 90, 180
    w, h, c, px = jpeg.decode_jpeg(_color_jpeg_flat(yv, cbv, crv))
    assert (w, h, c) == (16, 16, 3)
    # independent JFIF arithmetic (not the decoder's helper)
    r = round(yv + 1.402 * (crv - 128))
    g = round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))
    b_ = round(yv + 1.772 * (cbv - 128))
    assert np.all(px.reshape(-1, 3) == [r, g, b_])


# ---------------------------------------------------------------------------
# Honest gates + quarantine
# ---------------------------------------------------------------------------


def test_arithmetic_coding_gates_naming_pil():
    b = jpeg.encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    b2 = b.replace(b"\xff\xc0", b"\xff\xc9", 1)  # SOF0 -> SOF9 (arith. seq.)
    with pytest.raises(NotImplementedError, match="PIL"):
        jpeg.decode_jpeg(b2)


# ---------------------------------------------------------------------------
# Progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


def test_progressive_decodes_identically_to_baseline():
    """The strongest cross-layer pin available without a C library: baseline
    and progressive encodes carry the SAME quantized coefficients, so their
    decodes must agree bit-for-bit — on random images (dense AC, refinement
    correction bits), gradients (long EOB runs), and constants (maximal
    EOBRUN batching)."""
    rng = np.random.default_rng(7)
    cases = [rng.integers(0, 256, (h, w)).astype(np.uint8) for h, w in
             [(8, 8), (24, 40), (17, 9)]]
    cases.append(np.tile((np.arange(64) * 4 % 256).astype(np.uint8), (32, 1)))
    cases.append(np.full((40, 40), 177, dtype=np.uint8))
    for px in cases:
        bp = jpeg.encode_jpeg_gray(px, progressive=True)
        assert bp.count(b"\xff\xc2") == 1 and bp.count(b"\xff\xda") == 4
        assert np.array_equal(
            jpeg.decode_jpeg(bp)[3], jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))[3]
        )


def test_progressive_flat_blocks_exact():
    rng = np.random.default_rng(8)
    levels = rng.integers(0, 256, (3, 4))
    px = np.repeat(np.repeat(levels, 8, 0), 8, 1).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px, progressive=True))[3]
    assert np.array_equal(out[:, :, 0], px)


def test_progressive_truncated_scan_quarantines(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    good = jpeg.encode_jpeg_gray(np.full((16, 16), 50, dtype=np.uint8), progressive=True)
    df = spark.createDataFrame(
        [(0, good), (1, good[: len(good) * 2 // 3])], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r["modality"] for r in sniff_media_features(df).collect()}
    assert got == {0: "image", 1: "corrupt"}


def test_12bit_gates_naming_pil():
    b = bytearray(jpeg.encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(b).index(b"\xff\xc0") + 4
    b[i] = 12  # precision byte
    with pytest.raises(NotImplementedError, match="PIL"):
        jpeg.decode_jpeg(bytes(b))


def test_sniff_routes_jpeg_and_quarantines_corrupt(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    good = jpeg.encode_jpeg_gray(np.full((16, 16), 99, dtype=np.uint8))
    rows = [
        (0, good),
        (1, good[: len(good) // 2]),  # truncated mid-scan
        (2, b"\xff\xd8\xff\xd9"),  # SOI+EOI, no SOF/SOS
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["modality"], r["width"], r["brightness"]) for r in
           sniff_media_features(df).collect()}
    assert got[0] == ("image", 16, 99.0)
    assert got[1][0] == "corrupt" and got[2][0] == "corrupt"


def test_decode_image_dispatches_jpeg():
    px = np.full((8, 8), 42, dtype=np.uint8)
    w, h, c, out = imaging.decode_image(jpeg.encode_jpeg_gray(px))
    assert (w, h, c) == (8, 8, 1) and np.all(out[:, :, 0] == 42)


# ---------------------------------------------------------------------------
# Spec-validity regressions (round-10 review findings)
# ---------------------------------------------------------------------------


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    they must not be taken as the marker code."""
    px = np.full((16, 16), 123, dtype=np.uint8)
    b = jpeg.encode_jpeg_gray(px)
    i = b.index(b"\xff\xdb")  # pad before DQT and before SOS
    b2 = b[:i] + b"\xff\xff\xff" + b[i:]
    j = b2.index(b"\xff\xda")
    b3 = b2[:j] + b"\xff" + b2[j:]
    assert np.array_equal(jpeg.decode_jpeg(b3)[3][:, :, 0], px)


def test_noninterleaved_sequential_scans_decode_correctly():
    """A spec-valid sequential JPEG may write each component in its OWN scan
    (non-interleaved: one data unit per MCU, raster order over the
    component's true block counts). Build the 4:2:0 flat color file as three
    single-component scans and require pixel equality with the interleaved
    twin."""
    yv, cbv, crv = 120, 90, 180
    dc = jpeg._encode_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    ac = jpeg._encode_huffman(jpeg._AC_LUM_BITS, jpeg._AC_LUM_VALS)

    def scan_bytes(n_blocks: int, dcv: int) -> bytes:
        bw = _BitWriter()
        pred = 0
        for _ in range(n_blocks):
            diff = dcv - 128 - pred
            s = 0 if diff == 0 else int(abs(diff)).bit_length()
            ln, code = dc[s]
            bw.put(code, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            pred = dcv - 128
            ln, code = ac[0x00]
            bw.put(code, ln)
        return bw.bytes().replace(b"\xff", b"\xff\x00")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    q = np.full(64, 8, dtype=np.uint8)
    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + q.tobytes())
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(jpeg._DC_LUM_BITS) + bytes(jpeg._DC_LUM_VALS)
        + bytes([0x10]) + bytes(jpeg._AC_LUM_BITS) + bytes(jpeg._AC_LUM_VALS),
    )
    # Y: 2x2 = 4 blocks in ITS OWN scan; then Cb; then Cr (1 block each)
    for cid, n_blocks, v in [(1, 4, yv), (2, 1, cbv), (3, 1, crv)]:
        out += seg(0xDA, bytes([1, cid, 0x00, 0, 63, 0])) + scan_bytes(n_blocks, v)
    out += b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(out)
    assert (w, h, c) == (16, 16, 3)
    assert np.array_equal(px, jpeg.decode_jpeg(_color_jpeg_flat(yv, cbv, crv))[3])


def _put_dc_diff(bw: _BitWriter, tbl, diff: int) -> None:
    s = 0 if diff == 0 else int(abs(diff)).bit_length()
    ln, code = tbl[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jfif_rgb(yv: int, cbv: int, crv: int) -> list[int]:
    r = round(yv + 1.402 * (crv - 128))
    g = round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))
    b_ = round(yv + 1.772 * (cbv - 128))
    return [min(max(v, 0), 255) for v in (r, g, b_)]


def test_dht_slot_redefinition_between_scans():
    """T.81 allows a DHT to REDEFINE a table slot between scans; each scan
    must decode with the table in force at its SOS. Round-11 regression: the
    LUT memo was keyed on id(table-dict), so when the old dict was freed and
    a new _build_huffman dict reused its address, a later scan silently got
    the OLD table's LUT (allocator-dependent wrong pixels). The memo now
    keys on the raw BITS/HUFFVAL contents. This file encodes the Y scan
    with Annex-K slot-0 tables, then redefines BOTH slot-0 tables (reversed
    DC categories at uniform length 4; a 1-bit-EOB AC table) and encodes the
    chroma scans with the new tables."""
    dc1 = jpeg._encode_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    ac1 = jpeg._encode_huffman(jpeg._AC_LUM_BITS, jpeg._AC_LUM_VALS)
    dc2_bits = [0] * 16
    dc2_bits[3] = 12  # 12 codes of length 4 (Kraft: 12/16 <= 1)
    dc2_vals = list(range(11, -1, -1))  # reversed -> codes differ from K.3
    dc2 = jpeg._encode_huffman(dc2_bits, dc2_vals)
    ac2_bits = [1] + [0] * 15
    ac2_vals = [0x00]  # EOB as the single 1-bit code
    ac2 = jpeg._encode_huffman(ac2_bits, ac2_vals)

    def seq_scan(cid: int, dcvals: list[int], dctbl, actbl) -> bytes:
        bw = _BitWriter()
        pred = 0
        for v in dcvals:
            _put_dc_diff(bw, dctbl, (v - 128) - pred)
            pred = v - 128
            ln, code = actbl[0x00]
            bw.put(code, ln)  # EOB
        ent = bw.bytes().replace(b"\xff", b"\xff\x00")
        return _seg(0xDA, bytes([1, cid, 0x00, 0, 63, 0])) + ent

    yv, cbv, crv = 120, 90, 180
    q = np.full(64, 8, dtype=np.uint8)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + q.tobytes())
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(jpeg._DC_LUM_BITS) + bytes(jpeg._DC_LUM_VALS)
        + bytes([0x10]) + bytes(jpeg._AC_LUM_BITS) + bytes(jpeg._AC_LUM_VALS),
    )
    out += seq_scan(1, [yv] * 4, dc1, ac1)
    out += _seg(  # redefine BOTH slot-0 tables mid-stream
        0xC4,
        bytes([0x00]) + bytes(dc2_bits) + bytes(dc2_vals)
        + bytes([0x10]) + bytes(ac2_bits) + bytes(ac2_vals),
    )
    out += seq_scan(2, [cbv], dc2, ac2)
    out += seq_scan(3, [crv], dc2, ac2)
    out += b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(out)
    assert (w, h, c) == (16, 16, 3)
    assert np.all(px.reshape(-1, 3) == _jfif_rgb(yv, cbv, crv))


def test_progressive_percomponent_dc_scans_noninterleaved():
    """Round-11 regression (the progressive twin of the sequential Ns=1 bug):
    a progressive DC scan with Ns=1 is NON-interleaved per T.81 A.2.2 — one
    data unit per MCU in raster order over the component's TRUE block counts
    (bh x bw), not the MCU-padded interleaved grid. 24x8 4:2:0 makes the
    walks differ (Y true blocks = 1x3; the MCU-grid walk would expect
    2 MCUs x 4 = 8). Old code raised 'bad JPEG Huffman code' here; padded
    counts can also coincide and then it is silently wrong."""
    dc = jpeg._encode_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    yvs = [64, 128, 200]
    cbv, crv = 90, 180
    q = np.full(64, 8, dtype=np.uint8)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + q.tobytes())
    out += _seg(
        0xC2,  # SOF2 progressive
        struct.pack(">BHHB", 8, 8, 24, 3)
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(jpeg._DC_LUM_BITS) + bytes(jpeg._DC_LUM_VALS))

    def dc_scan(cid: int, vals: list[int]) -> bytes:
        bw = _BitWriter()
        pred = 0
        for v in vals:
            _put_dc_diff(bw, dc, (v - 128) - pred)
            pred = v - 128
        ent = bw.bytes().replace(b"\xff", b"\xff\x00")
        return _seg(0xDA, bytes([1, cid, 0x00, 0, 0, 0])) + ent

    out += dc_scan(1, yvs)  # Y: 3 true blocks in raster order
    out += dc_scan(2, [cbv, cbv])  # Cb: bw=2, bh=1
    out += dc_scan(3, [crv, crv])
    out += b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(out)
    assert (w, h, c) == (24, 8, 3)
    for i, yv in enumerate(yvs):  # per-Y-block colors pin the block ORDER too
        blk = px[:, 8 * i : 8 * i + 8, :]
        assert np.all(blk.reshape(-1, 3) == _jfif_rgb(yv, cbv, crv)), i


def test_progressive_interleaved_dc_scan_color():
    """The Ns=3 progressive DC path (interleaved MCU walk) — the branch the
    per-component fix must NOT disturb."""
    dc = jpeg._encode_huffman(jpeg._DC_LUM_BITS, jpeg._DC_LUM_VALS)
    yv, cbv, crv = 120, 90, 180
    q = np.full(64, 8, dtype=np.uint8)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + q.tobytes())
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(jpeg._DC_LUM_BITS) + bytes(jpeg._DC_LUM_VALS))
    bw = _BitWriter()
    pred = 0
    for v in [yv] * 4:  # one MCU: 4 Y blocks then Cb then Cr
        _put_dc_diff(bw, dc, (v - 128) - pred)
        pred = v - 128
    _put_dc_diff(bw, dc, cbv - 128)
    _put_dc_diff(bw, dc, crv - 128)
    ent = bw.bytes().replace(b"\xff", b"\xff\x00")
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])) + ent
    out += b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(out)
    assert (w, h, c) == (16, 16, 3)
    assert np.all(px.reshape(-1, 3) == _jfif_rgb(yv, cbv, crv))


def test_ac_refine_zrl_flushes_before_buffering_correction_bits():
    """Round-11 regression (libjpeg encode_mcu_AC_refine parity): a history-
    nonzero coefficient (abs >= 2 at Al=0) following >= 16 zeros must flush
    pending ZRLs BEFORE its correction bit is buffered — deferring the ZRL
    puts the correction bit where the decoder's run-advance never crosses a
    history-nonzero slot, desyncing the stream (the old encoder's output made
    its own decoder raise 'bad refinement magnitude'). Pixel blocks are
    synthesized from exact quantized coefficients (DC, a +-2/3 at zigzag
    p >= 18, a +-1 after it) so the structural trigger is guaranteed, then
    re-verified against the encoder's own quantizer."""
    q8 = np.full((8, 8), 8, dtype=np.int64)
    cases = [  # (dc, p, vp, qpos, vq) — found by search, encoder-verified
        (4, 32, -2, 48, -1),
        (-5, 19, -3, 20, 1),
        (2, 38, 2, 51, 1),
    ]
    for dc_v, p, vp, qpos, vq in cases:
        zzq = np.zeros(64, dtype=np.int64)
        zzq[0], zzq[p], zzq[qpos] = dc_v, vp, vq
        nat = np.zeros(64)
        nat[jpeg._ZIGZAG] = zzq
        px = np.clip(
            np.round(jpeg._idct_block(nat.reshape(8, 8) * 8.0) + 128.0), 0, 255
        ).astype(np.uint8)
        got = jpeg._quantized_blocks(px, q8)[0]
        assert np.array_equal(got, zzq), "trigger block must survive quantization"
        assert np.array_equal(
            jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px, progressive=True))[3],
            jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))[3],
        )


def test_oversized_bit_read_raises_not_garbage():
    """A corrupt DHT can define magnitude values past any legal width; the
    bit reader must error rather than silently drop high bits."""
    r = jpeg._BitReader(b"\xaa" * 8)
    with pytest.raises(ValueError, match="width"):
        r.read_bits(26)


# ---------------------------------------------------------------------------
# Motion-JPEG AVI: a compressed VIDEO codec through the pure decode path
# ---------------------------------------------------------------------------


def test_mjpeg_avi_roundtrips_flat_frames_exactly():
    rng = np.random.default_rng(9)
    levels = rng.integers(0, 256, (3, 2, 2))
    frames = [np.repeat(np.repeat(lv, 8, 0), 8, 1).astype(np.uint8) for lv in levels]
    w, h, fps, out = imaging.decode_avi(imaging.encode_avi_mjpeg(frames, fps=10))
    assert (w, h, fps, len(out)) == (16, 16, 10.0, 3)
    for f_in, f_out in zip(frames, out):
        assert f_out.shape == (16, 16, 3)
        assert all(np.array_equal(f_out[:, :, ch], f_in) for ch in range(3))


def test_mjpeg_unknown_codec_still_gates():
    f = np.zeros((8, 8), dtype=np.uint8)
    b = imaging.encode_avi_mjpeg([f]).replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="pyav"):
        imaging.decode_avi(b)


def _synth_mjpeg_payload(d: int) -> bytes:
    bits = np.array(
        [(synth_media.image_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    ).reshape(8, 8)
    frames = []
    for i in range(d % 5 + 2):
        fb = (1 - bits) if i % 3 == 2 else bits
        off = (i * 7 + d) % 8 * 5
        lvl = np.where(fb == 1, 200 + off, 40 + off).astype(np.uint8)
        frames.append(np.repeat(np.repeat(lvl, 8, axis=0), 8, axis=1))
    return imaging.encode_avi_mjpeg(frames, fps=10)


def test_mjpeg_corpus_majority_fingerprints_to_designed_patterns():
    from kda_flink_demo_spark.operators.llm.image_dedup import video_hash_bits

    for d in (0, 1, 2, 3, 4, 23, 57, 84):
        got = int(pack_bits_i64(video_hash_bits(_synth_mjpeg_payload(d))[None, :])[0])
        assert got & (2**64 - 1) == synth_media.image_pattern(d), d


def test_synth_mjpeg_videos_kernel_matches_local_replica(spark):
    from tests.conftest import SF_DIR

    from kda_flink_demo_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(25)
    rows = synth_media.synth_mjpeg_videos(docs).collect()
    assert len(rows) == 25
    for r in rows:
        assert bytes(r["payload"]) == _synth_mjpeg_payload(int(r["doc_id"]))


# ---------------------------------------------------------------------------
# Corpus parity (driver-side twin of the jpeg_ahash_values LUT pin)
# ---------------------------------------------------------------------------


def _synth_jpeg_payload(d: int) -> bytes:
    off = (d // 20 % 8) * 5
    bits = np.array(
        [(synth_media.image_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    ).reshape(8, 8)
    lvl = np.where(bits == 1, 200 + off, 40 + off).astype(np.uint8)
    big = np.repeat(np.repeat(lvl, 8, axis=0), 8, axis=1)
    return jpeg.encode_jpeg_gray(
        big, dri=2 if d % 3 == 0 else 0, progressive=d % 3 == 1
    )


def test_jpeg_corpus_hashes_to_designed_patterns():
    for d in range(0, 90):
        got = int(pack_bits_i64(image_hash_bits(_synth_jpeg_payload(d))[None, :])[0])
        assert got & (2**64 - 1) == synth_media.image_pattern(d), d


def test_synth_jpegs_kernel_matches_local_replica(spark):
    from tests.conftest import SF_DIR

    from kda_flink_demo_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    rows = synth_media.synth_jpegs(docs).collect()
    assert len(rows) == 30
    for r in rows:
        assert bytes(r["payload"]) == _synth_jpeg_payload(int(r["doc_id"]))


def test_optimized_tables_decode_identically_and_shrink():
    """optimize=True (T.81 Annex K.2 per-image tables) must change the DHT
    and entropy bytes only: identical decoded pixels, never-larger output,
    and a distinct DHT per distinct image (the property the decoder's
    content-keyed LUT memo probe relies on)."""
    rng = np.random.RandomState(20260816)

    def dht(b: bytes) -> bytes:
        i = b.index(b"\xff\xc4")
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        return b[i + 4 : i + 2 + ln]

    dhts = set()
    for trial in range(8):
        px = rng.randint(0, 256, (24, 24), dtype=np.uint8)
        for dri in (0, 2):
            plain = jpeg.encode_jpeg_gray(px, dri=dri)
            opt = jpeg.encode_jpeg_gray(px, dri=dri, optimize=True)
            assert len(opt) <= len(plain)
            assert np.array_equal(jpeg.decode_jpeg(opt)[3], jpeg.decode_jpeg(plain)[3])
        dhts.add(dht(opt))
    assert len(dhts) == 8, "each random image must carry its own optimized DHT"
    with pytest.raises(ValueError, match="baseline"):
        jpeg.encode_jpeg_gray(px, progressive=True, optimize=True)


def test_optimized_tables_flat_image_edge_case():
    """A flat image emits one DC-size symbol and one AC EOB symbol — the
    minimal-alphabet corner of the K.2 code-length derivation (reserved
    symbol removal must leave a valid 1-code table, not an all-ones code)."""
    px = np.full((16, 16), 77, dtype=np.uint8)
    opt = jpeg.encode_jpeg_gray(px, optimize=True)
    assert np.array_equal(
        jpeg.decode_jpeg(opt)[3], jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))[3]
    )


def test_ac_refine_zrl_past_eob_folds_into_block_eob():
    """libjpeg encode_mcu_AC_refine parity (round-12, from review): a
    history-nonzero coefficient (abs >= 2 at Al=0) sitting AFTER the last
    newly-significant index must NOT emit ZRLs for the >= 16 zeros before
    it — the run folds into the block's EOB code and the decoder's EOB-mode
    correction-bit path picks up its bit. Trigger: the ±1 BEFORE the ±2/3
    (eob < p), the mirror of the r11 regression cases (eob > p)."""
    q8 = np.full((8, 8), 8, dtype=np.int64)
    cases = [(4, 48, -2, 12, -1), (-3, 51, 3, 9, 1)]  # (dc, p, vp, qpos<p, vq)
    pinned = 0
    for dc_v, p, vp, qpos, vq in cases:
        zzq = np.zeros(64, dtype=np.int64)
        zzq[0], zzq[p], zzq[qpos] = dc_v, vp, vq
        nat = np.zeros(64)
        nat[jpeg._ZIGZAG] = zzq
        px = np.clip(
            np.round(jpeg._idct_block(nat.reshape(8, 8) * 8.0) + 128.0), 0, 255
        ).astype(np.uint8)
        got = jpeg._quantized_blocks(px, q8)[0]
        if not np.array_equal(got, zzq):
            continue  # quantizer rejected the synthetic block; other case pins it
        pinned += 1
        prog = jpeg.encode_jpeg_gray(px, progressive=True)
        assert np.array_equal(
            jpeg.decode_jpeg(prog)[3],
            jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))[3],
        )
    assert pinned >= 1, "no trigger block survived quantization — test is vacuous"
