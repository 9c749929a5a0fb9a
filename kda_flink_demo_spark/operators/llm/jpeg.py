"""Pure-python/numpy JPEG codec for the multimodal real-decode path —
baseline sequential (SOF0/1) AND progressive (SOF2).

JPEG was the archetypal "compressed codec stays behind the PIL gate" format;
Huffman-coded JPEG is specified tightly enough to decode exactly with stdlib
+ numpy: marker parse → per-scan Huffman entropy decode (byte unstuffing,
restart markers; progressive spectral-selection and successive-approximation
scans accumulate into the coefficient grids — DC first/refine, AC first with
EOB runs, AC refine with correction bits) → dequant → dezigzag → float64
IDCT (rounded per the spec's reference arithmetic) → level shift → optional
box chroma upsampling + JFIF YCbCr→RGB.

Honesty notes, in decode_jpeg's gates and docstrings:
- arithmetic-coded / 12-bit / lossless / hierarchical JPEG → PIL;
- the IDCT is the exact float64 separable transform, rounded — bit-equal to
  any spec-conforming reference implementation on the DC-only blocks the
  designed corpus uses, and within the spec's accuracy bounds elsewhere
  (decoders may legally differ by ±1 LSB on high-AC content; the corpus
  deliberately avoids relying on that);
- chroma upsampling is BOX (pixel replication); libjpeg's default "fancy"
  upsampler differs on non-flat chroma, so color pins use flat chroma only.

The encoder (``encode_jpeg_gray``) is the corpus/test writer: baseline
grayscale with the Annex-K luminance Huffman tables and a quant table whose
DC step is 8 — an 8×8-CONSTANT block round-trips EXACTLY (FDCT of a flat
block is DC-only; DC = 8·(level−128) quantizes losslessly at step 8 and the
IDCT reproduces the level verbatim), which is what makes the LUT value pin
possible for a lossy format.

Determinism over speed: JPEG now decodes in the PURE path unconditionally —
PIL is never consulted for it even when installed. libjpeg's integer IDCT
approximations can differ from the exact transform by ±1 LSB, and a
mixed-backend cluster would then hash threshold-marginal images differently
(exactly the standing-index poisoning the r08 review flagged for resize).
The cost is honest: the entropy decoder is a per-symbol Python loop —
fine for fingerprint-sized scans and exact-by-construction corpora, but a
production lake of full-AC photographs would want a C decoder wired in as a
PIXEL-IDENTICAL backend, not PIL-by-default.

Scale note: like the other codecs this runs inside Arrow-batched mapInPandas
workers — partition-local, never on the driver.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# restart markers 0xFFD0..0xFFD7 (see _unstuff_chunks for why split-first is
# the only safe order)
_RST_SPLIT = re.compile(b"\xff[\xd0-\xd7]")

# end-of-scan: 0xFF followed by a non-stuffing, non-restart byte
_SCAN_END = re.compile(b"\xff[^\x00\xd0-\xd7]")

# zigzag order: zigzag_index -> (row, col) flattened natural index
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8-point DCT-III basis: _IDCT_M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_IDCT_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])

# Annex K.3 luminance Huffman tables (bits[1..16], then values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(bits[16], values) → {(code_length, code): value} canonical table."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code_length, code), the encoder-side view."""
    return {v: (ln, c) for (ln, c), v in _build_huffman(bits, values).items()}


# Cross-payload memos keyed on table CONTENTS (raw BITS/HUFFVAL bytes): a
# media scan decodes thousands of frames that share the handful of Annex-K
# tables, and rebuilding the dict + 65536-entry LUT per frame was ~17% of a
# flat-corpus decode. Content keys make sharing exact (never id()-based — see
# decode_jpeg's per-stream cache note). Eviction is LRU (re-insert on hit,
# pop oldest at the bound), never clear-all: a mixed-source corpus of
# per-image OPTIMIZED tables is common, not pathological, and a wholesale
# clear would discard the hot shared entries with the cold ones. Bounds are
# sized by entry weight: a LUT entry is ~128 KB (two 65536-byte tables), so
# 64 entries cap the memo at ~8 MB per Python worker; the dict entries are
# hundreds of bytes, so 512 of them are noise.
_HUFF_MEMO: dict[tuple[bytes, bytes], dict[tuple[int, int], int]] = {}
_LUT_MEMO: dict[tuple[bytes, bytes], tuple[bytes, bytes]] = {}
_HUFF_MEMO_BOUND = 512
_LUT_MEMO_BOUND = 64


def _build_huffman_cached(key: tuple[bytes, bytes]) -> dict[tuple[int, int], int]:
    tbl = _HUFF_MEMO.pop(key, None)
    if tbl is None:
        if len(_HUFF_MEMO) >= _HUFF_MEMO_BOUND:
            _HUFF_MEMO.pop(next(iter(_HUFF_MEMO)))
        tbl = _build_huffman(list(key[0]), list(key[1]))
    _HUFF_MEMO[key] = tbl  # (re-)insert at the MRU end
    return tbl


def _huffman_lut_cached(key: tuple[bytes, bytes]) -> tuple[bytes, bytes]:
    lut = _LUT_MEMO.pop(key, None)
    if lut is None:
        if len(_LUT_MEMO) >= _LUT_MEMO_BOUND:
            _LUT_MEMO.pop(next(iter(_LUT_MEMO)))
        lut = _huffman_lut(_build_huffman_cached(key))
    _LUT_MEMO[key] = lut  # (re-)insert at the MRU end
    return lut


def _huffman_lut(table: dict[tuple[int, int], int]) -> tuple[bytes, bytes]:
    """Canonical table → (sym[65536], len[65536]) max-code-length lookup as
    ``bytes`` (byte indexing is a plain-int fetch — the entropy loop is the
    decoder's honest hot spot, see the module docstring): peek 16 bits, index
    once, O(1) per symbol instead of a per-bit walk. len 0 marks an invalid
    prefix."""
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for (length, code), v in table.items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym.tobytes(), ln.tobytes()


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes: a plain-int bit
    buffer refilled a byte at a time (pure-Python int ops beat per-call numpy
    by ~10× at this grain). Reads past the real data see virtual 0xFF padding
    (the spec pads entropy segments with 1-bits); consuming into the padding
    is the truncation error."""

    __slots__ = ("data", "n_data", "byte_pos", "bitbuf", "nbits", "limit")

    def __init__(self, data: bytes):
        self.data = data
        self.n_data = len(data)
        self.byte_pos = 0
        self.bitbuf = 0
        self.nbits = 0
        self.limit = 8 * len(data)

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.byte_pos] if self.byte_pos < self.n_data else 0xFF
            self.byte_pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:  # legal JPEG magnitudes stop at 16 bits; the 32-bit
            # buffer only guarantees 25 valid bits — a corrupt DHT value
            # must error, not silently drop the oldest bits
            raise ValueError(f"bad JPEG bit-read width {n}")
        self._fill(n)
        if self.byte_pos * 8 - self.nbits + n > self.limit:
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def read_symbol(self, lut: tuple[bytes, bytes]) -> int:
        self._fill(16)
        peek = (self.bitbuf >> (self.nbits - 16)) & 0xFFFF
        length = lut[1][peek]
        if length == 0 or self.byte_pos * 8 - self.nbits + length > self.limit:
            raise ValueError("bad JPEG Huffman code")
        self.nbits -= length
        return lut[0][peek]


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: an s-bit magnitude v → signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(coef: np.ndarray) -> np.ndarray:
    """(8, 8) dequantized coefficients (natural order) → (8, 8) float spatial
    samples (before level shift): the exact separable float64 IDCT."""
    return _IDCT_M.T @ coef @ _IDCT_M


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF YCbCr → RGB (float in, rounded uint8 out)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _unstuff_chunks(scan: bytes) -> list[bytes]:
    """Entropy bytes → restart-delimited chunks with 0xFF00 stuffing removed.

    Byte-level, not per-byte Python: split on restart markers FIRST (inside a
    scan every 0xFF is either stuffing 0xFF00 or a restart 0xFFD0–D7 — the SOS
    extent scan already stopped at any other marker), then strip the stuffing
    zero bytes per chunk with one ``replace``. Splitting must come first: a
    stuffed 0xFF directly followed by a literal 0xD0 data byte (… FF 00 D0 …)
    would otherwise turn into a false restart marker after the replace. The
    split pattern itself can never match inside a stuffed pair (its second
    byte is 0x00, outside D0–D7). A trailing lone 0xFF stays a literal byte,
    exactly like the old per-byte walk."""
    parts = _RST_SPLIT.split(scan)
    return [p.replace(b"\xff\x00", b"\xff") for p in parts]


def decode_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """bytes → (width, height, channels, uint8 pixels (h, w, c)): baseline
    sequential (SOF0/1) AND progressive (SOF2) JPEG — spectral-selection and
    successive-approximation scans both decoded (DC first/refine, AC first
    with EOB runs, AC refine with correction bits), grayscale or YCbCr with
    sampling factors 1 or 2 per axis (4:4:4 / 4:2:2 / 4:2:0), restart
    intervals included. Arithmetic coding / 12-bit / hierarchical JPEG raise
    NotImplementedError naming PIL."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    comps: list[dict] = []
    w = h = None
    dri = 0
    progressive = False
    scans: list[dict] = []
    # Huffman tables resolve through the CONTENT-keyed module memos (raw
    # BITS/HUFFVAL bytes captured at DHT parse time), never id(): a redefined
    # DHT slot frees the old dict and a later build can reuse its address, so
    # an id()-keyed cache would silently serve the OLD table's LUT for a
    # different table — allocator-dependent wrong pixels on multi-DHT
    # progressive streams.
    huff_key: dict[tuple[int, int], tuple[bytes, bytes]] = {}
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — a padding 0xFF must not be taken as the marker code itself
        while b[off + 1] == 0xFF and off + 4 <= len(b):
            off += 1
        marker = b[off + 1]
        off += 2
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", b, off)[0]
        seg = b[off + 2 : off + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables require PIL")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                ck = (bytes(seg[p + 1 : p + 17]), bytes(seg[p + 17 : p + 17 + n]))
                huff[(tc, th)] = _build_huffman_cached(ck)
                huff_key[(tc, th)] = ck
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG requires PIL")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                raise NotImplementedError("sampling factors beyond 2 require PIL")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/lossless/hierarchical JPEG requires PIL "
                "(pure path reads baseline SOF0/1 and progressive SOF2)"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            in_scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                for ci, c in enumerate(comps):
                    if c["id"] == cs:
                        in_scan.append((ci, tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            # scan extent: first 0xFF whose next byte is a real marker (not
            # stuffing 0x00, not a restart D0–D7) — a regex jump, not a
            # per-byte Python walk over the entropy segment; the pattern
            # requires a following byte, so a lone trailing 0xFF stays inside
            # the scan exactly like the old p+1 < len(b) loop bound
            m = _SCAN_END.search(b, off + ln)
            p = m.start() if m else max(off + ln, len(b) - 1)
            # LUTs only for the tables this scan's components reference,
            # memoized on table contents — unchanged tables across a
            # multi-scan progressive file are expanded once, not per SOS
            needed = set()
            for _ci, td, ta in in_scan:
                needed.add((0, td))
                needed.add((1, ta))
            scan_luts = {}
            for key in needed:
                if key not in huff:
                    continue  # e.g. DC-refine scans never read the DC table
                scan_luts[key] = _huffman_lut_cached(huff_key[key])
            scans.append(
                {
                    "comps": in_scan,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0x0F,
                    "chunks": _unstuff_chunks(b[off + ln : p]),
                    "dri": dri,
                    "luts": scan_luts,
                }
            )
            off = p
            continue
        off += ln
    if w is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component zigzag-order coefficient grids, MCU-padded
    coef = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64) for c in comps
    ]
    for c in comps:  # true (unpadded) block counts for non-interleaved scans
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["bw"], c["bh"] = (cw + 7) // 8, (ch + 7) // 8

    for scan in scans:
        if progressive:
            _decode_progressive_scan(scan, comps, coef, mcus_x, mcus_y)
        else:
            _decode_baseline_scan(scan, comps, coef, mcus_x, mcus_y)

    out_planes = []
    for ci, c in enumerate(comps):
        zzs = coef[ci].reshape(-1, 64)
        nat = np.zeros_like(zzs)
        nat[:, _ZIGZAG] = zzs
        deq = nat.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        # batched exact IDCT: out[n, x, y] = Σ_u Σ_v M[u,x] deq[n,u,v] M[v,y].
        # DC-only blocks (the common case in flat regions) skip the einsum via
        # (M00*d)*M00 — BIT-IDENTICAL to the einsum for ALL integer d, not
        # just the exhaustively-swept ±600000 range: with every other deq
        # cell zero, einsum's sum over (u, v) has exactly ONE nonzero term,
        # M[0,x]·d·M[0,y], accumulated with no additions (adding the 63 exact
        # zeros cannot perturb a float), and einsum evaluates that term as
        # the same left-to-right (M00*d)*M00 product — so equality is the
        # associativity-free identity of one multiplication chain, valid for
        # any d a (possibly hostile) stream can accumulate. (d/8.0 is NOT
        # equivalent: it differs by 1 ulp on most inputs.)
        flat = ~zzs[:, 1:].any(axis=1)
        m00 = float(_IDCT_M[0, 0])
        blocks = np.empty((deq.shape[0], 8, 8), dtype=np.float64)
        blocks[flat] = ((m00 * deq[flat, 0, 0].astype(np.float64)) * m00)[:, None, None]
        if not flat.all():
            nonflat = ~flat
            blocks[nonflat] = np.einsum(
                "ux,nuv,vy->nxy", _IDCT_M, deq[nonflat].astype(np.float64), _IDCT_M
            )
        blocks += 128.0
        by, bx = coef[ci].shape[0], coef[ci].shape[1]
        plane = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        if c["h"] != hmax or c["v"] != vmax:  # box-upsample subsampled chroma
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        px = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    if len(comps) == 3:
        return w, h, 3, _ycbcr_to_rgb(*out_planes)
    raise NotImplementedError("JPEG with component counts beyond 1/3 requires PIL")


def _scan_lut(scan, key):
    lut = scan["luts"].get(key)
    if lut is None:
        raise ValueError(f"JPEG scan references undefined Huffman table {key}")
    return lut


def _decode_seq_units(data: bytes, blocks, bi: int, count: int, dc_lut, ac_lut) -> None:
    """Fused sequential decode of ``count`` data units from ONE restart chunk
    into ``blocks[bi : bi + count]`` — the _BitReader + _decode_seq_block pair
    with all state in locals. The entropy loop is the decoder's honest hot
    spot (module docstring) and the per-symbol method-call version spent more
    time on attribute access and call frames than on bit math; this form is
    bit-identical by construction: same byte fills (virtual 0xFF padding, same
    32-bit mask), same limit checks, same error conditions in the same order."""
    dc_sym, dc_len = dc_lut
    ac_sym, ac_len = ac_lut
    n_data = len(data)
    limit = 8 * n_data
    bitbuf = nbits = byte_pos = 0
    pred = 0
    for zz in blocks[bi : bi + count]:
        # DC: Huffman symbol, then its magnitude bits
        while nbits < 16:
            bitbuf = (
                (bitbuf << 8) | (data[byte_pos] if byte_pos < n_data else 0xFF)
            ) & 0xFFFFFFFF
            byte_pos += 1
            nbits += 8
        peek = (bitbuf >> (nbits - 16)) & 0xFFFF
        ln = dc_len[peek]
        if ln == 0 or byte_pos * 8 - nbits + ln > limit:
            raise ValueError("bad JPEG Huffman code")
        nbits -= ln
        s = dc_sym[peek]
        if s:
            if s > 16:  # corrupt DHT value — same gate as _BitReader.read_bits
                raise ValueError(f"bad JPEG bit-read width {s}")
            while nbits < s:
                bitbuf = (
                    (bitbuf << 8) | (data[byte_pos] if byte_pos < n_data else 0xFF)
                ) & 0xFFFFFFFF
                byte_pos += 1
                nbits += 8
            if byte_pos * 8 - nbits + s > limit:
                raise ValueError("truncated JPEG entropy stream")
            nbits -= s
            v = (bitbuf >> nbits) & ((1 << s) - 1)
            pred += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        zz[0] = pred
        # AC run/size symbols to EOB
        k = 1
        while k < 64:
            while nbits < 16:
                bitbuf = (
                    (bitbuf << 8) | (data[byte_pos] if byte_pos < n_data else 0xFF)
                ) & 0xFFFFFFFF
                byte_pos += 1
                nbits += 8
            peek = (bitbuf >> (nbits - 16)) & 0xFFFF
            ln = ac_len[peek]
            if ln == 0 or byte_pos * 8 - nbits + ln > limit:
                raise ValueError("bad JPEG Huffman code")
            nbits -= ln
            rs = ac_sym[peek]
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("JPEG AC run overflows block")
            sz = rs & 0x0F
            if sz:
                while nbits < sz:
                    bitbuf = (
                        (bitbuf << 8) | (data[byte_pos] if byte_pos < n_data else 0xFF)
                    ) & 0xFFFFFFFF
                    byte_pos += 1
                    nbits += 8
                if byte_pos * 8 - nbits + sz > limit:
                    raise ValueError("truncated JPEG entropy stream")
                nbits -= sz
                v = (bitbuf >> nbits) & ((1 << sz) - 1)
                zz[k] = v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1
            else:
                zz[k] = 0
            k += 1


def _decode_seq_block(reader, zz, pred, dc_lut, ac_lut) -> int:
    """One sequential (DC+AC) data unit; returns the updated DC predictor."""
    s = reader.read_symbol(dc_lut)
    pred += _extend(reader.read_bits(s), s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_lut)
        r, sz = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = _extend(reader.read_bits(sz), sz)
        k += 1
    return pred


def _decode_baseline_scan(scan, comps, coef, mcus_x, mcus_y) -> None:
    """One sequential scan (Ss=0..Se=63) into the coefficient grids: multi-
    component scans interleave v×h data units per component over the MCU
    grid; a single-component scan is NON-interleaved (T.81 A.2.2 — one data
    unit per MCU, raster order over the component's TRUE block counts, not
    the MCU-padded grid)."""
    if len(scan["comps"]) == 1:
        ci, td, ta = scan["comps"][0]
        c = comps[ci]
        dc_lut, ac_lut = _scan_lut(scan, (0, td)), _scan_lut(scan, (1, ta))
        blocks = [coef[ci][by, bx] for by in range(c["bh"]) for bx in range(c["bw"])]
        per_chunk = scan["dri"] if scan["dri"] else len(blocks)
        bi = 0
        for chunk in scan["chunks"]:
            if bi >= len(blocks):
                break
            count = min(per_chunk, len(blocks) - bi)
            _decode_seq_units(chunk, blocks, bi, count, dc_lut, ac_lut)
            bi += count
        if bi != len(blocks):
            raise ValueError("JPEG entropy stream ended before all MCUs")
        return
    n_mcus = mcus_x * mcus_y
    per_chunk = scan["dri"] if scan["dri"] else n_mcus
    mcu = 0
    for chunk in scan["chunks"]:
        if mcu >= n_mcus:
            break
        reader = _BitReader(chunk)
        pred = {ci: 0 for ci, _td, _ta in scan["comps"]}
        for _ in range(min(per_chunk, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, td, ta in scan["comps"]:
                c = comps[ci]
                dc_lut, ac_lut = _scan_lut(scan, (0, td)), _scan_lut(scan, (1, ta))
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        pred[ci] = _decode_seq_block(
                            reader,
                            coef[ci][my * c["v"] + by, mx * c["h"] + bx],
                            pred[ci],
                            dc_lut,
                            ac_lut,
                        )
            mcu += 1
    if mcu != n_mcus:
        raise ValueError("JPEG entropy stream ended before all MCUs")


def _decode_progressive_scan(scan, comps, coef, mcus_x, mcus_y) -> None:
    """One progressive scan (T.81 Annex G, Huffman): DC first/refine scans
    are (possibly) interleaved over the MCU grid; AC scans are single-
    component over the component's true block raster, with EOB-run state and
    (in refinement) correction bits for already-nonzero coefficients."""
    luts = scan["luts"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if len(scan["comps"]) == 1:
            # Ns=1 DC scan is NON-interleaved per T.81 A.2.2: one data unit
            # per MCU, raster order over the component's TRUE block counts
            # (bh×bw), never the MCU-padded interleaved grid — the grid walk
            # permutes/miscounts blocks for subsampled components (the
            # sequential twin of this bug was fixed in _decode_baseline_scan).
            ci, td, _ta = scan["comps"][0]
            c = comps[ci]
            blocks = [
                coef[ci][by, bx] for by in range(c["bh"]) for bx in range(c["bw"])
            ]
            per_chunk = scan["dri"] if scan["dri"] else len(blocks)
            bi = 0
            for chunk in scan["chunks"]:
                if bi >= len(blocks):
                    break
                reader = _BitReader(chunk)
                pred = 0
                for _ in range(min(per_chunk, len(blocks) - bi)):
                    zz = blocks[bi]
                    if ah == 0:  # first DC scan
                        s = reader.read_symbol(_scan_lut(scan, (0, td)))
                        pred += _extend(reader.read_bits(s), s)
                        zz[0] = pred << al
                    else:  # DC refinement: one raw bit
                        if reader.read_bits(1):
                            zz[0] |= 1 << al
                    bi += 1
            if bi != len(blocks):
                raise ValueError("JPEG entropy stream ended before all blocks")
            return
        n_mcus = mcus_x * mcus_y
        per_chunk = scan["dri"] if scan["dri"] else n_mcus
        mcu = 0
        for chunk in scan["chunks"]:
            if mcu >= n_mcus:
                break
            reader = _BitReader(chunk)
            pred = {ci: 0 for ci, _td, _ta in scan["comps"]}
            for _ in range(min(per_chunk, n_mcus - mcu)):
                my, mx = divmod(mcu, mcus_x)
                for ci, td, _ta in scan["comps"]:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = coef[ci][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:  # first DC scan
                                s = reader.read_symbol(_scan_lut(scan, (0, td)))
                                pred[ci] += _extend(reader.read_bits(s), s)
                                zz[0] = pred[ci] << al
                            else:  # DC refinement: one raw bit
                                if reader.read_bits(1):
                                    zz[0] |= 1 << al
                mcu += 1
        if mcu != n_mcus:
            raise ValueError("JPEG entropy stream ended before all MCUs")
        return
    # AC scan: exactly one component, non-interleaved block raster
    if len(scan["comps"]) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci, _td, ta = scan["comps"][0]
    c = comps[ci]
    ac_lut = _scan_lut(scan, (1, ta))
    blocks = [
        coef[ci][by, bx] for by in range(c["bh"]) for bx in range(c["bw"])
    ]
    n_blocks = len(blocks)
    per_chunk = scan["dri"] if scan["dri"] else n_blocks
    bi = 0
    for chunk in scan["chunks"]:
        if bi >= n_blocks:
            break
        reader = _BitReader(chunk)
        eobrun = 0
        for _ in range(min(per_chunk, n_blocks - bi)):
            zz = blocks[bi]
            if ah == 0:
                eobrun = _ac_first_block(reader, ac_lut, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, ac_lut, zz, ss, se, al, eobrun)
            bi += 1
    if bi != n_blocks:
        raise ValueError("JPEG entropy stream ended before all blocks")


def _ac_first_block(reader, ac_lut, zz, ss, se, al, eobrun) -> int:
    """AC first scan (Ah=0) for one block; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                return (1 << r) - 1 + (reader.read_bits(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflows band")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_lut, zz, ss, se, al, eobrun) -> int:
    """AC refinement scan (Ah=Al+1) for one block: newly-significant
    coefficients arrive as ±1<<Al, and every already-nonzero coefficient
    passed on the way consumes a correction bit (T.81 G.2 / the classic
    decode_mcu_AC_refine structure). Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    # per-coefficient history checks/refinements run on a plain-int list copy
    # (numpy int64 scalar reads dominated the refine loop), written back once
    zl = zz.tolist()
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_lut)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.read_bits(1) else m1
            elif r != 15:
                eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                break  # EOB-mode tail handled below
            # advance over the run, refining nonzero-history coefficients
            while k <= se:
                if zl[k] != 0:
                    if reader.read_bits(1) and (zl[k] & p1) == 0:
                        zl[k] += p1 if zl[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zl[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB mode: refine the remaining nonzero coefficients
            if zl[k] != 0:
                if reader.read_bits(1) and (zl[k] & p1) == 0:
                    zl[k] += p1 if zl[k] >= 0 else m1
            k += 1
        eobrun -= 1
    zz[ss : se + 1] = zl[ss : se + 1]
    return eobrun


class _BitWriter:
    """MSB-first bit writer; packs with 1-bit padding (the spec's fill).
    A plain-int bit buffer drained into a bytearray — O(1) per put and
    bit-identical to the old per-bit list (the encoder is fixture-synthesis
    cost on every media bench/probe row, and the list writer was ~half of
    the per-frame encode time)."""

    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, ln: int) -> None:
        self.buf = (self.buf << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.buf >> self.nbits) & 0xFF)
        self.buf &= (1 << self.nbits) - 1

    def tobytes(self) -> bytes:
        if not self.nbits:
            return bytes(self.out)
        pad = 8 - self.nbits
        return bytes(self.out) + bytes([((self.buf << pad) | ((1 << pad) - 1)) & 0xFF])


def _quantized_blocks(pixels: np.ndarray, q: np.ndarray) -> list[np.ndarray]:
    """Grayscale pixels → per-block quantized zigzag-order coefficients
    (full FDCT + per-coefficient rounding), MCU raster order. Batched via
    BROADCAST matmul (M @ blocks @ M.T over the leading axis) — the same
    GEMM per 8×8 slice as the old per-block loop, so the pre-round floats
    and therefore the rounded coefficients are bit-identical (einsum was
    rejected: its different summation order can flip exact-half roundings)."""
    h, w = pixels.shape
    mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
    padded = np.pad(pixels, ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge")
    blocks = (
        padded.astype(np.float64)
        .reshape(mcus_y, 8, mcus_x, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    coefs = np.round(_IDCT_M @ blocks @ _IDCT_M.T / q.astype(np.float64)).astype(np.int64)
    return list(coefs.reshape(-1, 64)[:, _ZIGZAG])


def _toward_zero(v: int, al: int) -> int:
    """The spec's AC point transform: |v| >> al with the sign restored."""
    return -((-v) >> al) if v < 0 else v >> al


def _put_coef(bw: _BitWriter, v: int, tbl, run: int = -1) -> None:
    s = 0 if v == 0 else int(abs(v)).bit_length()
    sym = s if run < 0 else ((run << 4) | s)
    ln, code = tbl[sym]
    bw.put(code, ln)
    if s:
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _jpeg_headers(
    h: int,
    w: int,
    q: np.ndarray,
    sof_marker: int,
    dc_table: tuple[list[int], list[int]] | None = None,
    ac_table: tuple[list[int], list[int]] | None = None,
) -> bytes:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dc_bits, dc_vals = dc_table or (_DC_LUM_BITS, _DC_LUM_VALS)
    ac_bits, ac_vals = ac_table or (_AC_LUM_BITS, _AC_LUM_VALS)
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[np.arange(64)] = q.reshape(-1)[_ZIGZAG]
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + zz_q.tobytes())
    out += seg(sof_marker, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    return out


def _optimal_code_lengths(freq256: list[int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (BITS[1..16], HUFFVAL): the T.81 Annex K.2
    optimal-table procedure (Figures K.1–K.3) — the same algorithm libjpeg's
    -optimize runs, re-implemented from the published spec. Symbol 256 is the
    spec's reserved all-ones-code placeholder (frequency 1) so no real symbol
    gets a code of all 1-bits; code lengths > 16 are folded down by Figure
    K.3's pair-lifting adjustment."""
    freq = list(freq256) + [1]  # index 256: reserved
    others = [-1] * 257
    codesize = [0] * 257
    while True:
        # v1: least-frequency symbol, ties broken toward the LARGER value
        # (Figure K.1's "largest value of V with the least value of FREQ(V)")
        v1 = v2 = -1
        for v in range(257):
            if freq[v] > 0 and (v1 < 0 or freq[v] <= freq[v1]):
                v1 = v
        for v in range(257):
            if v != v1 and freq[v] > 0 and (v2 < 0 or freq[v] <= freq[v2]):
                v2 = v
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33  # bits[l] = number of codes of length l, l in 1..32
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    i = 32  # Figure K.3: fold lengths > 16 down by lifting a shorter pair
    while i > 16:
        if bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        else:
            i -= 1
    while bits[i] == 0:  # drop the reserved symbol's (longest) code
        i -= 1
    bits[i] -= 1
    huffval = sorted((v for v in range(256) if codesize[v]), key=lambda v: (codesize[v], v))
    return bits[1:17], huffval


def _baseline_symbol_freqs(
    blocks: list[np.ndarray], dri: int
) -> tuple[list[int], list[int]]:
    """Count the DC-size and AC run/size symbols the baseline scan will emit
    (mirroring the encode loop below, including DC-predictor resets at
    restart boundaries) — the statistics pass of a two-pass optimized encode."""
    dc_freq = [0] * 256
    ac_freq = [0] * 256
    pred = 0
    n_in_chunk = 0
    for bi, zz in enumerate(blocks):
        dc_freq[int(abs(int(zz[0]) - pred)).bit_length()] += 1
        pred = int(zz[0])
        nz = np.nonzero(zz[1:])[0]
        k = 0
        for pos in nz:
            run = int(pos) - k
            while run > 15:
                ac_freq[0xF0] += 1
                run -= 16
            ac_freq[(run << 4) | int(abs(int(zz[1 + pos]))).bit_length()] += 1
            k = int(pos) + 1
        if k < 63:
            ac_freq[0x00] += 1
        n_in_chunk += 1
        if dri and n_in_chunk == dri and bi != len(blocks) - 1:
            pred = 0
            n_in_chunk = 0
    return dc_freq, ac_freq


# flat AC table for the progressive scans: RS symbols 0x00..0xFE (incl. the
# EOBn run-length codes 0x10..0xE0, which Annex K's BASELINE table doesn't
# define) at a 9-bit canonical code each — valid (255 fits a DHT count byte),
# simple, and deliberately not size-optimal
_AC_FLAT_BITS = [0] * 8 + [255] + [0] * 7
_AC_FLAT_VALS = list(range(255))


def _sos(ss: int, se: int, ah: int, al: int, tables: int = 0x00) -> bytes:
    body = bytes([1, 1, tables, ss, se, (ah << 4) | al])
    return bytes([0xFF, 0xDA]) + struct.pack(">H", len(body) + 2) + body


def _stuff(data: bytes) -> bytes:
    return data.replace(b"\xff", b"\xff\x00")


def encode_jpeg_gray(
    pixels: np.ndarray, dri: int = 0, progressive: bool = False, optimize: bool = False
) -> bytes:
    """uint8 (h, w) or (h, w, 1) grayscale → JPEG bytes, quant table all-8s,
    Annex-K luminance Huffman tables, full FDCT with per-coefficient rounding
    (``decode_jpeg``'s test/corpus inverse — for 8×8-CONSTANT blocks the
    round trip is EXACT, see the module docstring). ``dri`` emits a DRI
    segment and RST markers every ``dri`` MCUs so restart handling is
    exercised end-to-end (baseline only). ``progressive=True`` emits SOF2
    with the classic 4-scan layout — DC first (Al=1), AC 1..63 first (Al=1,
    EOB runs batched across blocks), DC refine, AC refine (correction bits) —
    which reconstructs the SAME quantized coefficients exactly, so baseline
    and progressive encodes of one image must decode bit-identically.
    ``optimize=True`` (baseline only) derives per-image Huffman tables from
    the scan's actual symbol frequencies (T.81 Annex K.2, libjpeg -optimize):
    smaller output, identical decode — and every image carries its OWN DHT,
    which is what exercises the decoder's content-keyed table memos."""
    if pixels.ndim == 3:
        pixels = pixels[:, :, 0]
    if progressive and dri:
        raise ValueError("progressive encoder does not emit restart intervals")
    if progressive and optimize:
        raise ValueError("optimized tables are implemented for baseline scans only")
    h, w = pixels.shape
    q = np.full((8, 8), 8, dtype=np.int64)
    dc_table = ac_table = None  # Annex-K defaults
    blocks = _quantized_blocks(pixels, q)
    if optimize:
        dc_freq, ac_freq = _baseline_symbol_freqs(blocks, dri)
        dc_table = _optimal_code_lengths(dc_freq)
        ac_table = _optimal_code_lengths(ac_freq)
    dc_tbl = _encode_huffman(*(dc_table or (_DC_LUM_BITS, _DC_LUM_VALS)))
    ac_tbl = _encode_huffman(*(ac_table or (_AC_LUM_BITS, _AC_LUM_VALS)))

    if progressive:
        ac_tbl = _encode_huffman(_AC_FLAT_BITS, _AC_FLAT_VALS)
        out = bytearray(_jpeg_headers(h, w, q, 0xC2))
        # the flat AC table (slot class 1, id 1) carries the EOBn symbols
        flat_dht = bytes([0x11]) + bytes(_AC_FLAT_BITS) + bytes(_AC_FLAT_VALS)
        out += bytes([0xFF, 0xC4]) + struct.pack(">H", len(flat_dht) + 2) + flat_dht
        # scan 1: DC first, Al=1 (diffs of dc >> 1, arithmetic shift)
        bw = _BitWriter()
        pred = 0
        for zz in blocks:
            v = int(zz[0]) >> 1
            _put_coef(bw, v - pred, dc_tbl)
            pred = v
        out += _sos(0, 0, 0, 1) + _stuff(bw.tobytes())
        # scan 2: AC 1..63 first, Al=1, with EOB-run batching
        bw = _BitWriter()
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            while eobrun > 0:
                r = min(eobrun.bit_length() - 1, 14)
                ln, code = ac_tbl[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun -= min(eobrun, (1 << (r + 1)) - 1)

        for zz in blocks:
            vals = [_toward_zero(int(zz[k]), 1) for k in range(1, 64)]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            k = 0
            for pos in nz:
                run = pos - k
                while run > 15:
                    ln, code = ac_tbl[0xF0]
                    bw.put(code, ln)
                    run -= 16
                _put_coef(bw, vals[pos], ac_tbl, run)
                k = pos + 1
            if k < 63:
                eobrun = 1
        flush_eob()
        out += _sos(1, 63, 0, 1, tables=0x01) + _stuff(bw.tobytes())
        # scan 3: DC refinement — one raw bit per block
        bw = _BitWriter()
        for zz in blocks:
            bw.put(int(zz[0]) & 1, 1)
        out += _sos(0, 0, 1, 0) + _stuff(bw.tobytes())
        # scan 4: AC refinement, Ah=1 → Al=0 (per-block EOB; the decoder's
        # EOB-mode correction-bit path runs for every block with a tail)
        bw = _BitWriter()
        for zz in blocks:
            # libjpeg's EOB bound: the index of the last NEWLY-significant
            # coefficient. ZRLs are only emitted up to it — zero runs past it
            # (before trailing history-nonzero coefficients) fold into the
            # final EOB code, whose decoder path reads the remaining
            # correction bits anyway. Without the bound the stream is still
            # decodable, just larger than encode_mcu_AC_refine's.
            eob = 0
            for k in range(1, 64):
                if abs(int(zz[k])) == 1:
                    eob = k
            pending: list[int] = []
            r = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    r += 1
                    continue
                # A nonzero at k <= EOB flushes pending ZRLs (with the
                # correction bits buffered so far) FIRST, as libjpeg's
                # encode_mcu_AC_refine does — buffering a history-nonzero bit
                # across a deferred ZRL desyncs the stream when >=16 zeros
                # precede it, because the decoder only reads correction bits
                # for history-nonzero coefficients it actually crosses during
                # that ZRL's advance.
                while r > 15 and k <= eob:
                    ln, code = ac_tbl[0xF0]
                    bw.put(code, ln)
                    for bit in pending:
                        bw.put(bit, 1)
                    pending = []
                    r -= 16
                if abs(v) >= 2:  # history-nonzero: buffer correction bit
                    pending.append(abs(v) & 1)
                    continue
                # newly significant at this Al
                ln, code = ac_tbl[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if v > 0 else 0, 1)
                for bit in pending:
                    bw.put(bit, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                ln, code = ac_tbl[0x00]  # EOB (run 1)
                bw.put(code, ln)
                for bit in pending:
                    bw.put(bit, 1)
        out += _sos(1, 63, 1, 0, tables=0x01) + _stuff(bw.tobytes())
        return bytes(out) + b"\xff\xd9"

    # baseline: one interleaved DC+AC scan, optional restart intervals
    chunks: list[bytes] = []
    bw = _BitWriter()
    pred = 0
    n_in_chunk = 0
    for bi, zz in enumerate(blocks):
        _put_coef(bw, int(zz[0]) - pred, dc_tbl)
        pred = int(zz[0])
        nz = np.nonzero(zz[1:])[0]
        k = 0
        for pos in nz:
            run = int(pos) - k
            while run > 15:
                ln, code = ac_tbl[0xF0]
                bw.put(code, ln)
                run -= 16
            _put_coef(bw, int(zz[1 + pos]), ac_tbl, run)
            k = int(pos) + 1
        if k < 63:
            ln, code = ac_tbl[0x00]
            bw.put(code, ln)
        n_in_chunk += 1
        if dri and n_in_chunk == dri and bi != len(blocks) - 1:
            chunks.append(bw.tobytes())
            bw = _BitWriter()
            pred = 0
            n_in_chunk = 0
    chunks.append(bw.tobytes())

    entropy = bytearray(_stuff(chunks[0]))
    for i, ch in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + _stuff(ch)

    out = bytearray(_jpeg_headers(h, w, q, 0xC0, dc_table, ac_table))
    if dri:
        out += bytes([0xFF, 0xDD]) + struct.pack(">H", 4) + struct.pack(">H", dri)
    out += _sos(0, 63, 0, 0) + bytes(entropy) + b"\xff\xd9"
    return bytes(out)
