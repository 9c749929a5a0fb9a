"""Pure-python/numpy BASELINE JPEG codec for the multimodal real-decode path.

JPEG was the archetypal "compressed codec stays behind the PIL gate" format;
baseline sequential JPEG (SOF0) is specified tightly enough to decode exactly
with stdlib + numpy: marker parse → Huffman entropy decode (byte unstuffing,
restart markers) → dequant → dezigzag → float64 IDCT (rounded per the spec's
reference arithmetic) → level shift → optional box chroma upsampling + JFIF
YCbCr→RGB.

Honesty notes, in decode_jpeg's gates and docstrings:
- progressive (SOF2) / arithmetic / 12-bit / hierarchical JPEG → PIL;
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

import struct

import numpy as np

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


def decode_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """bytes → (width, height, channels, uint8 pixels (h, w, c)): baseline
    sequential JPEG (SOF0), grayscale or YCbCr with sampling factors 1 or 2
    per axis (4:4:4 / 4:2:2 / 4:2:0), restart intervals included. Progressive
    / extended / arithmetic JPEG raise NotImplementedError naming PIL."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    comps: list[dict] = []
    w = h = None
    dri = 0
    off = 2
    scan = None
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
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
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG requires PIL")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                raise NotImplementedError("sampling factors beyond 2 require PIL")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG requires PIL "
                "(pure path reads baseline sequential SOF0)"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tables >> 4, tables & 0x0F
            # scan runs to the next real marker (skip stuffed FF00 / RSTn)
            p = off + ln
            while p + 1 < len(b) and not (
                b[p] == 0xFF and b[p + 1] not in (0x00,) and not (0xD0 <= b[p + 1] <= 0xD7)
            ):
                p += 1
            scan = b[off + ln : p]
            off = p
            continue
        off += ln
    if w is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]

    # split on restart markers, unstuff each chunk
    chunks = []
    cur = bytearray()
    p = 0
    while p < len(scan):
        if scan[p] == 0xFF and p + 1 < len(scan):
            nxt = scan[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                chunks.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
        cur.append(scan[p])
        p += 1
    chunks.append(bytes(cur))

    n_mcus = mcus_x * mcus_y
    per_chunk = dri if dri else n_mcus
    luts = {key: _huffman_lut(tbl) for key, tbl in huff.items()}
    # pass 1 — entropy decode (inherently sequential) into per-component
    # coefficient stacks; pass 2 — ONE batched einsum IDCT per component
    # (the per-block matmul overhead, not the Huffman loop, dominated the
    # profile; see SCALE.md)
    coef_rows: list[list[np.ndarray]] = [[] for _ in comps]
    placements: list[list[tuple[int, int]]] = [[] for _ in comps]
    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcus:
            break
        reader = _BitReader(chunk)
        pred = [0] * len(comps)
        for _ in range(min(per_chunk, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(comps):
                dc_lut, ac_lut = luts[(0, c["td"])], luts[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = reader.read_symbol(dc_lut)
                        pred[ci] += _extend(reader.read_bits(s), s)
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
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
                        coef_rows[ci].append(zz)
                        placements[ci].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
            mcu += 1
    if mcu != n_mcus:
        raise ValueError("JPEG entropy stream ended before all MCUs")
    for ci, c in enumerate(comps):
        zzs = np.stack(coef_rows[ci])  # (n_blocks, 64) zigzag order
        coefs = np.zeros_like(zzs)
        coefs[:, _ZIGZAG] = zzs
        deq = coefs.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        # batched exact IDCT: out[n, x, y] = Σ_u Σ_v M[u,x] deq[n,u,v] M[v,y]
        blocks = np.einsum("ux,nuv,vy->nxy", _IDCT_M, deq.astype(np.float64), _IDCT_M) + 128.0
        plane = planes[ci]
        for (y0, x0), blk in zip(placements[ci], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk

    out_planes = []
    for c, plane in zip(comps, planes):
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


def encode_jpeg_gray(pixels: np.ndarray, dri: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, 1) grayscale → baseline JPEG bytes, quant table
    all-8s, Annex-K luminance Huffman tables, full FDCT with per-coefficient
    rounding (``decode_jpeg``'s test/corpus inverse — for 8×8-CONSTANT blocks
    the round trip is EXACT, see the module docstring). ``dri`` emits a DRI
    segment and RST markers every ``dri`` MCUs so restart handling is
    exercised end-to-end."""
    if pixels.ndim == 3:
        pixels = pixels[:, :, 0]
    h, w = pixels.shape
    q = np.full((8, 8), 8, dtype=np.int64)
    dc_tbl = _encode_huffman(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_tbl = _encode_huffman(_AC_LUM_BITS, _AC_LUM_VALS)

    bits: list[int] = []

    def put(code: int, ln: int) -> None:
        bits.extend((code >> k) & 1 for k in range(ln - 1, -1, -1))

    def put_coef(v: int, tbl: dict[int, tuple[int, int]], run: int = -1) -> None:
        s = 0 if v == 0 else int(abs(v)).bit_length()
        sym = s if run < 0 else ((run << 4) | s)
        ln, code = tbl[sym]
        put(code, ln)
        if s:
            put(v if v >= 0 else v + (1 << s) - 1, s)

    mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
    padded = np.pad(pixels, ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge")
    pred = 0
    chunks: list[bytes] = []
    n_in_chunk = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].astype(np.float64) - 128.0
            coef = np.round(_IDCT_M @ blk @ _IDCT_M.T / (q.astype(np.float64))).astype(np.int64)
            zz = coef.reshape(-1)[_ZIGZAG]
            put_coef(int(zz[0]) - pred, dc_tbl)
            pred = int(zz[0])
            # AC: run-length encode the zigzag tail
            nz = np.nonzero(zz[1:])[0]
            k = 0
            for pos in nz:
                run = int(pos) - k
                while run > 15:
                    ln, code = ac_tbl[0xF0]
                    put(code, ln)
                    run -= 16
                put_coef(int(zz[1 + pos]), ac_tbl, run)
                k = int(pos) + 1
            if k < 63:
                ln, code = ac_tbl[0x00]
                put(code, ln)
            n_in_chunk += 1
            if dri and n_in_chunk == dri and (my, mx) != (mcus_y - 1, mcus_x - 1):
                bits.extend([1] * (-len(bits) % 8))  # pad chunk with 1s
                chunks.append(np.packbits(np.array(bits, dtype=np.uint8)).tobytes())
                bits = []
                pred = 0
                n_in_chunk = 0
    bits.extend([1] * (-len(bits) % 8))
    chunks.append(np.packbits(np.array(bits, dtype=np.uint8)).tobytes())

    def stuff(data: bytes) -> bytes:
        return data.replace(b"\xff", b"\xff\x00")

    entropy = bytearray(stuff(chunks[0]))
    for i, ch in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + stuff(ch)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[np.arange(64)] = q.reshape(-1)[_ZIGZAG]
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + zz_q.tobytes())
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(entropy) + b"\xff\xd9"
    return out
