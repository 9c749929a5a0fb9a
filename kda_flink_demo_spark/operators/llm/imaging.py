"""Pure-python/numpy media codecs for the multimodal real-decode path.

This container has no PIL/librosa and installs are off-limits, so the
``real_decode=True`` stages fall back to these minimal, dependency-free
decoders: binary PPM/PGM (P6/P5), full PNG (stdlib ``zlib`` inflate + all
five scanline filters + Adam7 — see ``decode_png``) and uncompressed 24-bit
BMP for images, stdlib ``wave`` (8/16/24/32-bit integer PCM) for audio. They
exist so the REAL decode path —
bytes → pixels/samples → features, through the exact mapInPandas contract the
production stage uses — executes and is tested here, not just stubbed.
Formats outside this set raise NotImplementedError naming the library that
would handle them (PIL / librosa), keeping the gate honest.

Scale note: these run inside Arrow-batched mapInPandas workers exactly like a
PIL/librosa-backed decode would — partition-local, never on the driver.
"""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _ppm_header_tokens(b: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace/comment-separated ASCII integers after
    the magic, returning (values, index_of_the_separator_byte_after_them) —
    the raster offset is then chosen by ``_ppm_data_offset``."""
    vals: list[int] = []
    i = 2  # past the 2-byte magic
    while len(vals) < n_tokens:
        if i >= len(b):
            raise ValueError("truncated PPM/PGM header")
        c = b[i : i + 1]
        if c == b"#":  # comment runs to end of line
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            vals.append(int(b[i:j]))
            i = j
    return vals, i  # i = index of the separator byte after the last token


def _ppm_data_offset(b: bytes, sep_idx: int, need: int) -> int:
    """Offset of the raster after the single separator byte at ``sep_idx`` —
    except CRLF writers (Windows netpbm tools), whose "\\r\\n" counts as ONE
    separator. A lone-CR file whose first pixel byte is 0x0A looks identical
    at the boundary, so the raster LENGTH disambiguates: prefer the offset
    that leaves exactly ``need`` bytes (r08 review findings, both rounds)."""
    one, two = sep_idx + 1, sep_idx + 2
    if b[sep_idx : two] == b"\r\n" and len(b) - one != need and len(b) - two >= need:
        return two
    return one


def decode_image(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """bytes → (width, height, channels, uint8 pixels shaped (h, w, c)).

    Supports binary PPM (P6, RGB), binary PGM (P5, gray), full PNG (gray /
    RGB / palette / gray+alpha / RGBA via ``decode_png``), and uncompressed
    24-bit bottom-up BMP. Anything else needs PIL."""
    if b[:2] == b"P6" or b[:2] == b"P5":
        (w, h, maxval), sep_idx = _ppm_header_tokens(b, 3)
        if maxval != 255:
            raise ValueError(f"only maxval=255 PPM/PGM supported, got {maxval}")
        c = 3 if b[:2] == b"P6" else 1
        need = w * h * c
        off = _ppm_data_offset(b, sep_idx, need)
        data = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
        return w, h, c, data.reshape(h, w, c)
    if b[:8] == PNG_SIGNATURE:
        return decode_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h, frames = decode_gif(b)
        return w, h, 3, frames[0]  # image semantics: the first frame
    if b[:2] == b"\xff\xd8":
        from kda_flink_demo_spark.operators.llm import jpeg

        return jpeg.decode_jpeg(b)
    if b[:2] == b"BM":
        if len(b) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        compression = struct.unpack_from("<I", b, 30)[0]
        if hdr_size < 40 or bpp != 24 or compression != 0:
            raise NotImplementedError(
                "only uncompressed 24-bit BMP decodes without PIL"
            )
        bottom_up = h > 0
        h = abs(h)
        row_stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_stride * h, offset=data_off
        ).reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return w, h, 3, rows[:, :, ::-1].copy()  # BGR → RGB
    raise NotImplementedError(
        "image format not decodable without PIL (pure-python path handles "
        "P6/P5 PPM/PGM, PNG, GIF, baseline JPEG, and uncompressed 24-bit BMP)"
    )


def grayscale_mean(pixels: np.ndarray) -> float:
    """Mean luma over the image using PIL's convert('L') integer formula
    (ITU-R 601-2, truncating): L = (299·R + 587·G + 114·B) // 1000 — so the
    pure backend and a PIL backend agree bit-for-bit on RGB input."""
    px = pixels.astype(np.int64)
    if px.shape[2] <= 2:  # gray / gray+alpha: channel 0 IS the luma
        luma = px[:, :, 0]
    else:  # RGB / RGBA: alpha (if any) is ignored, like PIL convert('L')
        luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return float(luma.mean())


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (floor index mapping) — pure numpy take."""
    h, w = pixels.shape[0], pixels.shape[1]
    yi = (np.arange(target_h) * h // target_h).astype(np.int64)
    xi = (np.arange(target_w) * w // target_w).astype(np.int64)
    return pixels[yi][:, xi]


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary P6 PPM bytes (the pure-path resize output
    container; a PIL backend would emit PNG — checksums are backend-tagged)."""
    h, w = pixels.shape[0], pixels.shape[1]
    if pixels.shape[2] == 1:
        pixels = np.repeat(pixels, 3, axis=2)
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → uncompressed 24-bit bottom-up BMP bytes (the
    ``decode_image`` BMP branch's inverse; deterministic — used by tests and
    cross-format corpora)."""
    h, w = pixels.shape[0], pixels.shape[1]
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    raster = b"".join(
        bytes(pixels[y, :, ::-1].tobytes()) + pad for y in range(h - 1, -1, -1)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    return header + raster


# PNG decoded channel count per color type:
# 0 = gray, 2 = RGB, 3 = palette (expands to RGB), 4 = gray+alpha, 6 = RGBA.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanline bytes (h rows of 1 filter byte + ``stride`` data
    bytes) → uint8 (h, stride) reconstructed raster. Implements all five
    PNG filter types; Sub is a per-byte-lane cumulative sum and Up a prior-row
    add (both vectorized), Average/Paeth scan pixels left-to-right with the
    channel lanes vectorized — the spec's reconstruction is inherently
    sequential in x for those two."""
    # ONE vectorized uint8→int64 conversion of the whole filtered raster and
    # an int64 working matrix for the reconstruction (each row is masked to a
    # byte as it is stored, so prior-row reads see the same 0..255 values the
    # old per-row astype round-trip produced) — the per-row astype pair was
    # most of the unfilter cost on small images
    arr = (
        np.frombuffer(raw, dtype=np.uint8, count=h * (1 + stride))
        .reshape(h, 1 + stride)
        .astype(np.int64)
    )
    out = np.zeros((h, stride), dtype=np.int64)
    zero_row = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:]
        prev = out[y - 1] if y else zero_row
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] — lane cumsum
            rec = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1)
        elif ft == 2:  # Up
            rec = row + prev
        elif ft == 3:  # Average: + floor((left + up) / 2), left is sequential
            # the spec's reconstruction is sequential in x, so true
            # vectorization is impossible — plain-int loops beat a per-pixel
            # loop of bpp-lane numpy micro-ops ~10× at this grain (each lane's
            # left neighbour is simply byte i-bpp, so per-byte == per-lane)
            rl, pl = row.tolist(), prev.tolist()
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rl[i] + (a + pl[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth predictor over (left, up, up-left)
            rl, pl = row.tolist(), prev.tolist()
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                c = pl[i - bpp] if i >= bpp else 0
                up = pl[i]
                p = a + up - c
                pa = p - a if p >= a else a - p
                pb = p - up if p >= up else up - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (rl[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        # the list branches (Average/Paeth) mask as they go
        out[y] = rec if type(rec) is list else rec & 0xFF
    return out.astype(np.uint8)


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass — each pass is
# its own independently-filtered mini-image inside the single IDAT stream
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Non-empty Adam7 passes as (x0, y0, dx, dy, pass_w, pass_h)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _png_samples(raw: bytes, rows: int, width: int, c: int, depth: int) -> np.ndarray:
    """Filtered scanline bytes for one (sub-)image → (rows, width, c) uint8
    samples: unfilter at the byte level (bpp = bytes per pixel, min 1 — the
    spec filters PACKED bytes for sub-byte depths), then unpack MSB-first
    bit groups (depths 1/2/4), pass through (8), or take the high byte (16 —
    the uint8 feature path's documented projection, same as a >>8)."""
    stride = (width * c * depth + 7) // 8
    rec = _png_unfilter(raw, rows, stride, max(1, (c * depth) // 8))
    if depth == 8:
        return rec[:, : width * c].reshape(rows, width, c)
    if depth == 16:
        return rec[:, 0::2][:, : width * c].reshape(rows, width, c).copy()
    bits = np.unpackbits(rec, axis=1)
    groups = bits[:, : (stride * 8 // depth) * depth].reshape(rows, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, : width * c].reshape(rows, width, c)


# gray sample scaling to full 8-bit range per sub-byte depth (exact integers)
_PNG_GRAY_SCALE = {1: 255, 2: 85, 4: 17}


def decode_png(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """bytes → (width, height, channels, uint8 pixels shaped (h, w, c)):
    dependency-free PNG decode via stdlib ``zlib`` (RFC 2083 inflate is the
    only compression PNG has, and the stdlib ships it — unlike JPEG/H.264,
    "compressed" does not have to mean "gated").

    Supports EVERY spec depth/color-type combination: color types 0 (gray),
    2 (RGB), 3 (palette, expanded to RGB), 4 (gray+alpha) and 6 (RGBA) at
    bit depths 1/2/4 (gray + palette), 8, and 16 (projected to uint8 via the
    high byte — this decoder feeds a uint8 feature path; sub-byte gray
    scales to full range, 85/17 steps, per the spec). All five scanline
    filters, BOTH interlace methods (progressive Adam7 sub-images are
    independently unfiltered and reassembled), and every chunk CRC verified
    (a corrupt payload must land in the sniff scan's quarantine, not decode
    to garbage). Ancillary chunks (tRNS included) are skipped: the
    luma/feature path ignores alpha."""
    if b[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    off = 8
    ihdr = None
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    while off + 8 <= len(b):
        length = struct.unpack_from(">I", b, off)[0]
        ctype = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + length]
        if len(data) != length or off + 12 + length > len(b):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", b, off + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        off += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    valid = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
    if depth not in valid:
        raise ValueError(f"bad PNG depth {depth} for color type {color_type}")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        stride = (w * c * depth + 7) // 8
        if len(raw) != h * (1 + stride):
            raise ValueError("PNG raster size mismatch")
        px = _png_samples(raw, h, w, c, depth)
    else:  # Adam7: seven independently-filtered sub-images, reassembled
        px = np.zeros((h, w, c), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            pstride = (pw * c * depth + 7) // 8
            need = ph * (1 + pstride)
            if off + need > len(raw):
                raise ValueError("PNG raster size mismatch (interlaced)")
            px[y0::dy, x0::dx] = _png_samples(raw[off : off + need], ph, pw, c, depth)
            off += need
        if off != len(raw):
            raise ValueError("PNG raster size mismatch (interlaced)")
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        px = plte[px[:, :, 0]]
        c = 3
    elif depth in _PNG_GRAY_SCALE:  # sub-byte gray (+alpha) to full range
        px = (px.astype(np.int64) * _PNG_GRAY_SCALE[depth]).astype(np.uint8)
    return w, h, c, px


def _filter_scanlines(rows: np.ndarray, bpp: int, filter_per_row: bool) -> bytes:
    """(h, stride) int64 raster rows → filtered scanline bytes (filter-type
    byte + filtered data per row); cycles filters 0..4 by row when asked."""
    h, stride = rows.shape
    lines = []
    for y in range(h):
        row = rows[y]
        prev = rows[y - 1] if y else np.zeros(stride, dtype=np.int64)
        ft = y % 5 if filter_per_row else 0
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            filt = row - (left + prev) // 2
        else:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            filt = row - pred
        lines.append(bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes())
    return b"".join(lines)


def _pack_png_rows(sub: np.ndarray, depth: int) -> np.ndarray:
    """(rows, width, c) uint8 samples → (rows, stride) int64 PACKED scanline
    bytes at the given depth (the encoder-side inverse of ``_png_samples``).
    Sub-byte samples must already be index/step values (< 2^depth); 16-bit
    emits v·257 (high byte == low byte == v, so the decode projection is the
    exact inverse)."""
    rows, width, c = sub.shape
    flat = sub.reshape(rows, width * c)
    if depth == 8:
        return flat.astype(np.int64)
    if depth == 16:
        out = np.empty((rows, width * c * 2), dtype=np.int64)
        out[:, 0::2] = flat
        out[:, 1::2] = flat  # v*257 big-endian: high byte == low byte == v
        return out
    if int(flat.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample out of range for {depth}-bit PNG")
    bits = (
        (flat[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(rows, -1).astype(np.uint8)
    return np.packbits(bits, axis=1).astype(np.int64)


def encode_png(
    pixels: np.ndarray,
    color_type: int | None = None,
    palette: np.ndarray | None = None,
    filter_per_row: bool = False,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """uint8 (h, w, c) → PNG bytes (``decode_png``'s inverse; deterministic —
    fixed zlib level, used by tests and the synthetic media corpus).

    ``color_type`` defaults from the channel count (1 → gray, 2 → gray+alpha,
    3 → RGB, 4 → RGBA); pass ``color_type=3`` with a ``palette`` (n, 3) and
    single-channel index pixels for a palette image. ``filter_per_row=True``
    cycles scanline filters 0..4 by row index so a decoder must get ALL five
    reconstructions right to round-trip — the corpus uses it on purpose.
    ``interlace=True`` emits Adam7 (each pass filtered independently, filters
    cycling within the pass when asked). ``depth``: 1/2/4 (gray values must
    be exact multiples of the 255/85/17 step; palette input stays indices),
    8, or 16 (each uint8 sample emitted as v·257, which the decoder's
    high-byte projection inverts exactly)."""
    h, w = pixels.shape[0], pixels.shape[1]
    c = pixels.shape[2]
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    samples = pixels
    if depth in _PNG_GRAY_SCALE and color_type == 0:
        scale = _PNG_GRAY_SCALE[depth]
        if np.any(pixels.astype(np.int64) % scale):
            raise ValueError(f"{depth}-bit gray needs multiples of {scale}")
        samples = (pixels // scale).astype(np.uint8)
    bpp = max(1, (c * depth) // 8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    if interlace:
        scan = b"".join(
            _filter_scanlines(
                _pack_png_rows(samples[y0::dy, x0::dx], depth), bpp, filter_per_row
            )
            for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h)
        )
    else:
        scan = _filter_scanlines(_pack_png_rows(samples, depth), bpp, filter_per_row)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace))
    body = chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG needs a palette")
        body += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += chunk(b"IDAT", zlib.compress(scan, 6)) + chunk(b"IEND", b"")
    return PNG_SIGNATURE + body


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    growing to 12 bits, CLEAR resets the table, EOI ends the stream. Returns
    uint8 palette indices (exactly ``n_pixels`` of them)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: GIF packs codes LSB-first — an int bit buffer refilled a
    # byte at a time (the JPEG _BitReader lesson: plain-int bit ops beat a
    # per-code numpy dot by ~10× at this grain), output accumulated in ONE
    # bytearray instead of a numpy slice-store per LZW entry
    n_data = len(data)
    pos = bitbuf = nbits = 0
    out = bytearray()

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n_data:
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad GIF LZW code")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor (``_lzw_decode``'s inverse — used by the
    synthetic corpus and tests): dict-growth encoding with CLEAR emitted on
    table overflow, codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []

    def emit(code: int, width: int) -> None:
        out_bits.extend((code >> k) & 1 for k in range(width))

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for ix in bytes(indices.astype(np.uint8).tobytes()):
        cand = seq + bytes([ix])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([ix])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    packed = np.packbits(
        np.array(out_bits + [0] * (-len(out_bits) % 8), dtype=np.uint8),
        bitorder="little",
    ).tobytes()
    return packed


# GIF interlace: four passes of rows (start, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> tuple[int, int, list[np.ndarray]]:
    """bytes → (width, height, [uint8 (h, w, 3) RGB frames]): dependency-free
    GIF87a/89a decode — logical screen descriptor, global/local color tables,
    GIF row interlace, and the real LZW stream (``_lzw_decode``). GIF is
    lossless and palettized, so decoded pixels are exact.

    Scope (documented, not silent): extension blocks are skipped —
    transparency and frame disposal are ignored; each image block is decoded
    onto the logical screen at its (x, y) offset over the PREVIOUS frame's
    pixels (disposal method 1 semantics), which is exact for the full-frame
    GIFs real crawls overwhelmingly contain."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n
    frames: list[np.ndarray] = []
    screen = np.zeros((h, w, 3), dtype=np.uint8)
    while off < len(b):
        marker = b[off]
        off += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks, skipped
            off += 1
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"bad GIF block marker 0x{marker:02x}")
        x0, y0, fw, fh, iflags = struct.unpack_from("<HHHHB", b, off)
        off += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
            off += 3 * n
        if pal is None:
            raise ValueError("GIF image block with no color table")
        min_code_size = b[off]
        off += 1
        data = bytearray()
        while off < len(b) and b[off] != 0:
            ln = b[off]
            data += b[off + 1 : off + 1 + ln]
            off += 1 + ln
        off += 1  # sub-block terminator
        idx = _lzw_decode(bytes(data), min_code_size, fw * fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of range")
        rows = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in the 4-pass order
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE:
                n_rows = len(range(start, fh, step))
                ordered[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = ordered
        screen = screen.copy()
        screen[y0 : y0 + fh, x0 : x0 + fw] = pal[rows]
        frames.append(screen)
    if not frames:
        raise ValueError("GIF with no image blocks")
    return w, h, frames


def encode_gif(
    frames_idx: list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """[(h, w) uint8 palette indices] + (n, 3) palette → GIF89a bytes
    (``decode_gif``'s inverse; deterministic — used by tests and the
    synthetic media corpus)."""
    h, w = frames_idx[0].shape
    # smallest power-of-two table size >= len(palette), minimum 2
    size_bits = 1
    while (2 << (size_bits - 1)) < len(palette):
        size_bits += 1
    table_n = 2 << (size_bits - 1)
    pal_bytes = palette.astype(np.uint8).tobytes() + b"\x00" * (3 * (table_n - len(palette)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += pal_bytes
    min_code = max(2, size_bits)
    for rows in frames_idx:
        if interlace:
            parts = [rows[start::step] for start, step in _GIF_INTERLACE]
            rows = np.concatenate(parts, axis=0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        out += bytes([min_code])
        stream = _lzw_encode(rows.reshape(-1), min_code)
        for i in range(0, len(stream), 255):
            blk = stream[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_G711_TABLE_MEMO: dict[str, np.ndarray] = {}


def _g711_ulaw_table() -> np.ndarray:
    """256-entry μ-law byte → linear PCM16 table (G.711 decode expansion:
    invert, split sign/exponent/mantissa, ((m<<3)+0x84)<<e − 0x84).
    Memoized — the table is a pure constant and was rebuilt per payload on
    the decode path."""
    t = _G711_TABLE_MEMO.get("ulaw")
    if t is not None:
        return t
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    t = np.where(sign, -mag, mag)
    _G711_TABLE_MEMO["ulaw"] = t
    return t


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law byte → linear PCM16 table (G.711: XOR 0x55, segment 0
    is (m<<4)+8, segment s≥1 is ((m<<4)+0x108)<<(s−1)). Memoized like the
    μ-law table."""
    t = _G711_TABLE_MEMO.get("alaw")
    if t is not None:
        return t
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    mag = np.where(
        exponent == 0, (mantissa << 4) + 8, ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0)
    )
    t = np.where(sign, mag, -mag)
    _G711_TABLE_MEMO["alaw"] = t
    return t


def _g711_encode(samples16: np.ndarray, law: str) -> bytes:
    """Linear PCM16 → G.711 bytes (the corpus/test inverse): nearest-table
    inverse of the decode expansion — exact on values the law can represent."""
    table = _g711_ulaw_table() if law == "ulaw" else _g711_alaw_table()
    order = np.argsort(table)
    sorted_vals = table[order]
    idx = np.searchsorted(sorted_vals, samples16)
    idx = np.clip(idx, 0, 255)
    lo = np.clip(idx - 1, 0, 255)
    pick = np.where(
        np.abs(sorted_vals[idx] - samples16) <= np.abs(sorted_vals[lo] - samples16),
        idx,
        lo,
    )
    return order[pick].astype(np.uint8).tobytes()


def encode_wav_g711(samples16: np.ndarray, law: str, sr: int = 8000) -> bytes:
    """PCM16 samples → a μ-law (fmt tag 7) or A-law (tag 6) mono RIFF/WAVE —
    hand-assembled because stdlib ``wave`` writes PCM only."""
    data = _g711_encode(samples16.astype(np.int64), law)
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHH", tag, 1, sr, sr, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA-ADPCM (G.726-family) tables: per-nibble step-index delta and the
# 89-entry quantizer step ladder
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA-ADPCM nibble → (new predictor, new step index)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble])))
    return pred, index


def encode_wav_ima_adpcm(samples16: np.ndarray, sr: int = 8000, block_align: int = 256) -> bytes:
    """PCM16 samples → a mono IMA-ADPCM RIFF/WAVE (fmt tag 0x11): per block,
    a 4-byte header (first sample verbatim + step index) then 4-bit nibbles,
    each chosen greedily against the decoder's own reconstruction — the
    test/corpus inverse of ``_decode_wav_adpcm``."""
    vals = samples16.astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # header sample + 2 nibbles/byte
    out = bytearray()
    index = 0
    i = 0
    while i < len(vals):
        block = vals[i : i + spb]
        i += spb
        pred = int(block[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for v in block[1:]:
            step = int(_IMA_STEPS[index])
            diff = int(v) - pred
            n = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            pred, index = _ima_step(pred, index, n)
            nibbles.append(n)
        nibbles += [0] * (-len(nibbles) % 2)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - len(nibbles) // 2)
    fact = struct.pack("<I", len(vals))
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sr, sr * block_align // spb, block_align, 4, 2, spb)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(out)) + bytes(out)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_adpcm(b: bytes, block_align: int, n_samples: int | None) -> np.ndarray:
    """Mono IMA-ADPCM data blocks → float64 samples in [-1, 1): per block the
    4-byte header carries the first sample and step index, then two nibbles
    per byte (low first) through the adaptive quantizer."""
    off = 12
    data = None
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        size = struct.unpack_from("<I", b, off + 4)[0]
        if cid == b"data":
            data = b[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    if data is None:
        raise ValueError("ADPCM WAV missing data chunk")
    # _ima_step inlined with plain-int tables and if-chains: the adaptive
    # recursion is sequential by construction (each nibble's predictor feeds
    # the next), so the win is cutting per-nibble call/numpy-scalar overhead,
    # not vectorizing — ~2× on the decode kernel, bit-identical arithmetic
    steps = _IMA_STEPS.tolist()
    idx_delta = _IMA_INDEX.tolist()
    out: list[int] = []
    for boff in range(0, len(data) - 3, block_align):
        block = data[boff : boff + block_align]
        pred, index = struct.unpack_from("<hB", block, 0)
        index = max(0, min(88, index))
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                step = steps[index]
                diff = step >> 3
                if nibble & 1:
                    diff += step >> 2
                if nibble & 2:
                    diff += step >> 1
                if nibble & 4:
                    diff += step
                pred = pred - diff if nibble & 8 else pred + diff
                if pred > 32767:
                    pred = 32767
                elif pred < -32768:
                    pred = -32768
                index += idx_delta[nibble]
                if index < 0:
                    index = 0
                elif index > 88:
                    index = 88
                out.append(pred)
    if n_samples is not None:
        out = out[:n_samples]
    return np.array(out, dtype=np.float64) / 32768.0


# MS-ADPCM (WAVE fmt tag 2) constants from the published Microsoft spec
# (the msadpcm reference algorithm; also RFC 2361's codec registry): 7
# standard predictor pairs in 8.8 fixed point and the 16-entry delta
# adaptation table indexed by the encoded nibble.
_MS_ADPCM_COEFS: tuple[tuple[int, int], ...] = (
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232),
)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def _c_div(a: int, b: int) -> int:
    """C integer division (truncate toward zero) — the MS reference
    algorithm's semantics; Python's // floors, which differs on negatives."""
    q = abs(a) // b
    return -q if a < 0 else q


def encode_wav_ms_adpcm(samples16: np.ndarray, sr: int = 8000, block_align: int = 256) -> bytes:
    """PCM16 samples → a mono MS-ADPCM RIFF/WAVE (fmt tag 2): per block a
    7-byte header (predictor index, initial delta, the two seed samples)
    then one 4-bit code per sample, HIGH nibble first. Fixture encoder (the
    test/corpus inverse of ``_decode_wav_ms_adpcm``): predictor 0
    ((256, 0) — prediction = previous sample) with a signal-scaled initial
    delta; simple, spec-valid, and any conformant decoder reproduces it."""
    vals = np.clip(samples16, -32768, 32767).astype(np.int64)
    spb = (block_align - 7) * 2 + 2  # samples per block, mono
    out_blocks: list[bytes] = []
    for boff in range(0, len(vals), spb):
        chunk = vals[boff : boff + spb]
        if len(chunk) < 2:
            chunk = np.concatenate([chunk, np.zeros(2 - len(chunk), dtype=np.int64)])
        samp2, samp1 = int(chunk[0]), int(chunk[1])
        diffs = np.abs(np.diff(chunk)) if len(chunk) > 1 else np.array([16])
        delta = max(16, int(diffs.mean()) // 4 or 16)
        block = bytearray(struct.pack("<Bhhh", 0, delta, samp1, samp2))
        nibbles: list[int] = []
        c1, c2 = _MS_ADPCM_COEFS[0]
        for v in chunk[2:]:
            pred = _c_div(samp1 * c1 + samp2 * c2, 256)
            err = int(v) - pred
            # nearest-code quantization (round half away from zero): halves
            # the reconstruction error vs truncation at identical bitstream
            # validity — the decoder doesn't care how the encoder rounded
            code = _c_div(2 * err + (delta if err >= 0 else -delta), 2 * delta)
            code = max(-8, min(7, code))
            sample = pred + delta * code
            sample = max(-32768, min(32767, sample))
            nibbles.append(code & 0x0F)
            samp2, samp1 = samp1, sample
            delta = max(16, _c_div(_MS_ADAPT[code & 0x0F] * delta, 256))
        if len(nibbles) % 2:
            nibbles.append(0)
        for hi, lo in zip(nibbles[0::2], nibbles[1::2]):
            block.append((hi << 4) | lo)
        block.extend(b"\x00" * (block_align - len(block)))
        out_blocks.append(bytes(block))
    data = b"".join(out_blocks)
    coef_bytes = b"".join(struct.pack("<hh", c1, c2) for c1, c2 in _MS_ADPCM_COEFS)
    extra = struct.pack("<HH", spb, len(_MS_ADPCM_COEFS)) + coef_bytes
    fmt = (
        struct.pack(
            "<HHIIHHH",
            2, 1, sr, sr * block_align // spb, block_align, 4, len(extra),
        )
        + extra
    )
    fact = struct.pack("<I", len(vals))
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _decode_wav_ms_adpcm(
    data: bytes, block_align: int, coefs: list[tuple[int, int]], n_samples: int | None
) -> np.ndarray:
    """Mono MS-ADPCM data blocks → float64 samples in [-1, 1): per block the
    7-byte header seeds (predictor, delta, samp1, samp2); each 4-bit code
    (HIGH nibble first) is a signed quantized prediction error; delta adapts
    through the 16-entry table with the spec's C-division semantics and the
    16 floor."""
    out: list[int] = []
    # _c_div / clamps inlined (sequential adaptive recursion — same rationale
    # as the IMA loop above; C truncate-toward-zero semantics preserved)
    for boff in range(0, len(data) - 6, block_align):
        block = data[boff : boff + block_align]
        ipred, delta, samp1, samp2 = struct.unpack_from("<Bhhh", block, 0)
        c1, c2 = coefs[ipred] if ipred < len(coefs) else coefs[0]
        c1, c2 = int(c1), int(c2)
        out.append(samp2)  # the OLDER seed plays first
        out.append(samp1)
        for byte in block[7:]:
            for nibble in (byte >> 4, byte & 0x0F):  # HIGH nibble first
                signed = nibble - 16 if nibble >= 8 else nibble
                acc = samp1 * c1 + samp2 * c2
                sample = (acc // 256 if acc >= 0 else -((-acc) // 256)) + delta * signed
                if sample > 32767:
                    sample = 32767
                elif sample < -32768:
                    sample = -32768
                out.append(sample)
                samp2, samp1 = samp1, sample
                # floor-div is safe here: it differs from the spec's truncate
                # only for a negative product (hostile negative header delta),
                # and both round down past the 16 floor then anyway
                delta = (_MS_ADAPT[nibble] * delta) // 256
                if delta < 16:
                    delta = 16
    if n_samples is not None:
        out = out[:n_samples]
    return np.array(out, dtype=np.float64) / 32768.0


# --------------------------------------------------------------------------
# GSM 06.10 full-rate decoder (ETSI EN 300 961: RPE-LTP, 260-bit frames).
# Pure-spec integer arithmetic: every op is the standard's saturating 16-bit
# add/sub/mult_r, so the output is bit-exact by construction and the in-test
# independent spec replica can pin it over random bitstreams (the MS-ADPCM
# methodology). WAV container: fmt tag 49 ("GSM610"/WAV49) packs TWO frames
# per 65-byte block (520 bits MSB-first, frame 2 starting at bit 260).
# --------------------------------------------------------------------------

_GSM_FAC = (18431, 20479, 22527, 24575, 26623, 28671, 30719, 32767)
_GSM_QLB = (3277, 11469, 21299, 32767)
_GSM_MIC = (-32, -32, -16, -16, -8, -8, -4, -4)
_GSM_B = (0, 0, 2048, -2560, 94, -1792, -341, -1144)
_GSM_INVA = (13107, 13107, 13107, 13107, 19223, 17476, 31454, 29708)
_GSM_LAR_BITS = (6, 6, 5, 5, 4, 4, 3, 3)


def _gsm_add(a: int, b: int) -> int:
    s = a + b
    return -32768 if s < -32768 else (32767 if s > 32767 else s)


def _gsm_mult_r(a: int, b: int) -> int:
    if a == -32768 and b == -32768:
        return 32767
    p = (a * b + 16384) >> 15
    return -32768 if p < -32768 else (32767 if p > 32767 else p)


def _gsm_frame_params(bits: list[int]) -> tuple[list[int], list[dict]]:
    """260 bits (MSB-first field order per the spec's table 1.1) →
    (LARc[8], 4 subframes of {Nc, bc, Mc, xmaxc, xMc[13]})."""
    pos = 0

    def take(n: int) -> int:
        nonlocal pos
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[pos]
            pos += 1
        return v

    larc = [take(n) for n in _GSM_LAR_BITS]
    subs = []
    for _ in range(4):
        subs.append(
            {
                "Nc": take(7),
                "bc": take(2),
                "Mc": take(2),
                "xmaxc": take(6),
                "xMc": [take(3) for _ in range(13)],
            }
        )
    return larc, subs


def _gsm_xmaxc_to_exp_mant(xmaxc: int) -> tuple[int, int]:
    exp = 0
    if xmaxc > 15:
        exp = (xmaxc >> 3) - 1
    mant = xmaxc - (exp << 3)
    if mant == 0:
        exp, mant = -4, 7
    else:
        while mant <= 7:
            mant = (mant << 1) | 1
            exp -= 1
        mant -= 8
    return exp, mant


def _gsm_inverse_apcm(xmc: list[int], xmaxc: int) -> list[int]:
    exp, mant = _gsm_xmaxc_to_exp_mant(xmaxc)
    temp1 = _GSM_FAC[mant]
    temp2 = 6 - exp
    # spec: temp3 = asl(1, temp2 − 1); a negative left-shift count is an
    # arithmetic RIGHT shift, so exp = 6 (xmaxc ≥ 56) yields 0
    temp3 = (1 << (temp2 - 1)) if temp2 >= 1 else 0
    out = []
    for c in xmc:
        t = (c << 1) - 7  # ±odd in [-7, 7]
        t <<= 12
        t = _gsm_mult_r(temp1, t)
        t = _gsm_add(t, temp3)
        out.append(t >> temp2)
    return out


def _gsm_new_state() -> dict:
    return {
        "drp": [0] * 160,  # [0:120] past residual, [120:160] current subframe
        "nrp": 40,
        "larpp": [0] * 8,
        "v": [0] * 9,
        "msr": 0,
    }


def _gsm_decode_frame(bits: list[int], st: dict) -> list[int]:
    """One 260-bit frame + decoder state → 160 PCM16 samples (spec §4.3:
    RPE decoding, long-term synthesis, short-term lattice synthesis,
    de-emphasis, upscale + 3-LSB truncation)."""
    larc, subs = _gsm_frame_params(bits)

    # long-term + RPE per subframe → wt[0:160]
    wt = []
    for sub in subs:
        xmp = _gsm_inverse_apcm(sub["xMc"], sub["xmaxc"])
        erp = [0] * 40
        for i, v in enumerate(xmp):
            erp[sub["Mc"] + 3 * i] = v
        nc = sub["Nc"]
        nr = nc if 40 <= nc <= 120 else st["nrp"]
        st["nrp"] = nr
        brp = _GSM_QLB[sub["bc"]]
        drp = st["drp"]
        for k in range(40):
            drpp = _gsm_mult_r(brp, drp[120 + k - nr])
            drp[120 + k] = _gsm_add(erp[k], drpp)
        wt.extend(drp[120:160])
        del drp[0:40]
        drp.extend([0] * 40)

    # LARc → LARpp (decoding of the coded log-area ratios)
    larpp = []
    for i in range(8):
        t1 = _gsm_add(larc[i], _GSM_MIC[i]) << 10
        t1 = _gsm_add(t1, -(_GSM_B[i] << 1))
        t1 = _gsm_mult_r(_GSM_INVA[i], t1)
        larpp.append(_gsm_add(t1, t1))

    # interpolation zones + reflection coefficients + lattice synthesis
    prev = st["larpp"]
    out = []
    zones = ((0, 13), (13, 27), (27, 40), (40, 160))
    for zi, (ks, ke) in enumerate(zones):
        rrp = []
        for i in range(8):
            if zi == 0:
                larp = _gsm_add(prev[i] >> 2, larpp[i] >> 2)
                larp = _gsm_add(larp, prev[i] >> 1)
            elif zi == 1:
                larp = _gsm_add(prev[i] >> 1, larpp[i] >> 1)
            elif zi == 2:
                larp = _gsm_add(prev[i] >> 2, larpp[i] >> 2)
                larp = _gsm_add(larp, larpp[i] >> 1)
            else:
                larp = larpp[i]
            t = 32767 if larp == -32768 else abs(larp)
            if t < 11059:
                t <<= 1
            elif t < 20070:
                t += 11059
            else:
                t = _gsm_add(t >> 2, 26112)
            rrp.append(t if larp >= 0 else -t)
        v = st["v"]
        for k in range(ks, ke):
            sri = wt[k]
            for i in range(1, 9):
                sri = _gsm_add(sri, -_gsm_mult_r(rrp[8 - i], v[8 - i]))
                v[9 - i] = _gsm_add(v[8 - i], _gsm_mult_r(rrp[8 - i], sri))
            v[0] = sri
            # de-emphasis, upscale ×2, truncate to 13-bit left-justified
            st["msr"] = _gsm_add(sri, _gsm_mult_r(st["msr"], 28180))
            out.append(_gsm_add(st["msr"], st["msr"]) & ~7)
    st["larpp"] = larpp
    return out  # & ~7 on clamped ints keeps sign: already valid PCM16


def _decode_wav_gsm(data: bytes, n_samples: int | None) -> np.ndarray:
    """Mono GSM610 (WAV49) data → float64 samples in [-1, 1): 65-byte
    blocks of two 260-bit frames (one continuous MSB-first bitstream, frame
    2 starting at bit 260), each decoded through the full RPE-LTP synthesis
    chain with state carried across frames. Pure-python per-sample lattice —
    honest-path throughput, not a DSP library."""
    st = _gsm_new_state()
    out: list[int] = []
    for boff in range(0, len(data) - 64, 65):
        block = data[boff : boff + 65]
        bits = [(block[i >> 3] >> (7 - (i & 7))) & 1 for i in range(520)]
        out.extend(_gsm_decode_frame(bits[:260], st))
        out.extend(_gsm_decode_frame(bits[260:], st))
    if n_samples is not None:
        out = out[:n_samples]
    return np.array(out, dtype=np.float64) / 32768.0


def _decode_wav_g711(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Manual RIFF walk for the codecs stdlib ``wave`` refuses: G.711 fmt
    tag 6 (A-law) / 7 (μ-law) — 8-bit companded samples expanded through the
    256-entry tables and normalized by PCM16 full scale — and IEEE float
    (tag 3, 32- or 64-bit), which is already normalized samples on disk."""
    off = 12
    tag = ch = sr = bits = None
    block_align = 0
    n_samples = None
    data = fmt_body = None
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        size = struct.unpack_from("<I", b, off + 4)[0]
        body = b[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
            tag, ch, sr = struct.unpack_from("<HHI", body, 0)
            block_align, bits = struct.unpack_from("<HH", body, 12)
        elif cid == b"fact":
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)
    if data is None or not ch:
        raise ValueError("WAV missing fmt/data chunks")
    if tag == 0x11 and ch == 1 and block_align >= 8:  # mono IMA-ADPCM
        samples = _decode_wav_adpcm(b, block_align, n_samples)
        return sr, len(samples), 1, samples
    if tag == 2 and ch == 1 and block_align >= 8:  # mono MS-ADPCM
        # fmt extra: cbSize @16, then wSamplesPerBlock, wNumCoef, coef pairs
        coefs = list(_MS_ADPCM_COEFS)
        if fmt_body is not None and len(fmt_body) >= 22:
            n_coef = struct.unpack_from("<H", fmt_body, 20)[0]
            got = [
                struct.unpack_from("<hh", fmt_body, 22 + 4 * i)
                for i in range(n_coef)
                if 22 + 4 * i + 4 <= len(fmt_body)
            ]
            if got:
                coefs = got
        samples = _decode_wav_ms_adpcm(data, block_align, coefs, n_samples)
        return sr, len(samples), 1, samples
    if tag == 0x31 and ch == 1:  # mono GSM 06.10 (WAV49, 65-byte blocks)
        samples = _decode_wav_gsm(data, n_samples)
        return sr, len(samples), 1, samples
    if tag == 3 and bits in (32, 64):
        dt = "<f4" if bits == 32 else "<f8"
        samples = np.frombuffer(data[: len(data) // (bits // 8) * (bits // 8)], dtype=dt).astype(
            np.float64
        )
    elif tag in (6, 7):
        table = _g711_ulaw_table() if tag == 7 else _g711_alaw_table()
        samples = table[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            "non-PCM WAV codec requires librosa/soundfile (pure path reads "
            "integer PCM, IEEE float, G.711 mu-law/A-law, mono IMA/MS-ADPCM, "
            "and mono GSM 06.10)"
        )
    return sr, len(samples) // ch, ch, samples


def decode_wav(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """bytes → (sample_rate, n_frames, channels, float64 samples in [-1, 1)).

    Stdlib ``wave`` handles integer PCM WAV without librosa, at every sample
    width the format defines: 8-bit (unsigned, center 128), 16/24/32-bit
    (signed little-endian) — each normalized by its own full-scale so the
    SAME waveform fingerprints identically at any width. Formats ``wave``
    refuses take a manual RIFF walk (``_decode_wav_g711``): G.711
    μ-law/A-law (fmt tags 7/6) expand through 256-entry tables pinned
    byte-for-byte against ``audioop``, IEEE float (tag 3, 32/64-bit) is read
    verbatim, mono IMA-ADPCM (tag 0x11) / MS-ADPCM (tag 2) run their
    published adaptive-quantizer algorithms, and mono GSM 06.10 (tag 0x31,
    WAV49 two-frames-per-65-byte-block) runs the full ETSI RPE-LTP synthesis
    chain. The one remaining non-PCM codec (MP3-in-WAV) and non-RIFF
    payloads raise the honest librosa gate."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "non-WAV audio payload requires librosa/soundfile (pure-python "
            "path reads integer PCM WAV via the stdlib)"
        )
    try:
        return _decode_wav_pcm(b)
    except wave.Error:
        # stdlib wave refuses non-PCM fmt tags; G.711 gets its own walk
        return _decode_wav_g711(b)


def _decode_wav_pcm(b: bytes) -> tuple[int, int, int, np.ndarray]:
    with wave.open(io.BytesIO(b)) as wf:
        sw = wf.getsampwidth()
        sr = wf.getframerate()
        nf = wf.getnframes()
        ch = wf.getnchannels()
        raw = wf.readframes(nf)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit PCM is unsigned with midpoint 128 (the WAV spec)
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 3:  # 24-bit: assemble little-endian triplets, sign-extend bit 23
        u = np.frombuffer(raw, dtype=np.uint8)[: (len(raw) // 3) * 3]
        u = u.reshape(-1, 3).astype(np.int64)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        v -= (v & 0x800000) << 1
        samples = v.astype(np.float64) / 8388608.0
    elif sw == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(
            f"{sw * 8}-bit WAV requires librosa/soundfile (pure path reads "
            "8/16/24/32-bit integer PCM)"
        )
    return sr, nf, ch, samples


def rms_of(samples: np.ndarray, round_digits: int = 4) -> float | None:
    if samples.size == 0:
        return None
    scale = 10.0 ** round_digits
    return math.floor(math.sqrt(float(np.mean(samples * samples))) * scale + 0.5) / scale


def _bgr_rows_to_rgb(data: bytes, w: int, h: int, bottom_up: bool = True) -> np.ndarray:
    """Raw DIB raster (BGR rows padded to 4 bytes) → uint8 (h, w, 3) RGB —
    the shared back half of the BMP and AVI '00db' frame decoders."""
    row_stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_stride * h).reshape(h, row_stride)[
        :, : w * 3
    ].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _parse_avi(b: bytes):
    """RIFF/AVI container walk WITHOUT frame decoding: returns
    (width, height, fps, chunk_ranges, decode_one) where chunk_ranges is the
    [(start, end)] byte range of every video frame chunk in stream order and
    decode_one(i) decodes exactly chunk i to an RGB frame. Locating frame
    chunks is O(container bytes) string scanning; the expensive work (JPEG
    entropy decode / DIB unpack) happens only for the chunks a caller asks
    for — that is what makes bounded frame SAMPLING a real cost cap on long
    videos. Codec gates still fire at parse time (an unsupported codec must
    raise even if the caller would sample zero frames)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "non-AVI video payload requires pyav/ffmpeg (pure-python path "
            "reads uncompressed 24-bit DIB RIFF AVI)"
        )
    width = height = None  # avih main-header dims (fallback geometry)
    usec_per_frame = 0
    n_streams = 0  # strh chunks seen so far — streams are numbered in strh order
    video_stream = None  # b"NN" ascii index of the first 'vids' stream
    expect_video_strf = False
    v_w = v_h = None  # the vids stream's OWN strf geometry (authoritative)
    bpp = compression = None
    chunk_ranges: list[tuple[int, int]] = []

    def walk(off: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, n_streams, video_stream
        nonlocal expect_video_strf, v_w, v_h, bpp, compression
        while off + 8 <= end:
            cid = b[off : off + 4]
            size = struct.unpack_from("<I", b, off + 4)[0]
            body, body_end = off + 8, off + 8 + size
            if cid == b"LIST":
                walk(body + 4, body_end)  # skip the 4-byte list type
            elif cid == b"avih":
                usec_per_frame = struct.unpack_from("<I", b, body)[0]
                width, height = struct.unpack_from("<II", b, body + 32)
            elif cid == b"strh":
                # accept a stream format ONLY from a strl whose strh fccType is
                # 'vids': an audio-first AVI must not parse WAVEFORMATEX bytes
                # as BITMAPINFOHEADER, and frame decoding is restricted to the
                # vids stream's own '##db'/'##dc' chunks below (r09 advice)
                expect_video_strf = b[body : body + 4] == b"vids" and video_stream is None
                if expect_video_strf:
                    video_stream = b"%02d" % n_streams
                n_streams += 1
            elif cid == b"strf" and expect_video_strf:
                _sz, w_v, h_v, _planes, bpp_v = struct.unpack_from("<IiiHH", b, body)
                compression = struct.unpack_from("<I", b, body + 16)[0]
                bpp, v_w, v_h = bpp_v, w_v, h_v
                expect_video_strf = False
            elif cid[2:4] in (b"db", b"dc") and cid[:2] == video_stream:
                chunk_ranges.append((body, body_end))
            off = body_end + (size & 1)  # RIFF chunks pad to even offsets

    walk(12, len(b))
    if width is None:
        raise ValueError("AVI missing avih main header")
    # both codec gates fire at PARSE time (not lazily inside decode_one) so a
    # parse-only caller — or a zero-frame sample plan — rejects an unsupported
    # stream the same way a full decode would
    if chunk_ranges and compression not in (0, 0x47504A4D):
        raise NotImplementedError(
            "compressed AVI streams require pyav/ffmpeg (pure "
            "path reads uncompressed 24-bit DIB and Motion-JPEG)"
        )
    if chunk_ranges and compression == 0 and bpp != 24:
        # distinct message: this refusal is the BIT DEPTH, not compression
        # (r12 advice — the old message misdescribed the reason)
        raise NotImplementedError(
            "uncompressed AVI with bpp != 24 requires pyav/ffmpeg "
            "(pure path reads 24-bit DIB)"
        )
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0

    def decode_one(i: int) -> np.ndarray:
        body, body_end = chunk_ranges[i]
        if compression == 0x47504A4D:  # 'MJPG': each chunk is a JPEG
            from kda_flink_demo_spark.operators.llm import jpeg

            _fw, _fh, fc, px = jpeg.decode_jpeg(b[body:body_end])
            return px if fc == 3 else np.repeat(px, 3, axis=2)
        if bpp != 24:
            raise NotImplementedError(
                "uncompressed AVI with bpp != 24 requires pyav/ffmpeg "
                "(pure path reads 24-bit DIB)"
            )
        # decode with the vids stream's strf geometry (BMP semantics:
        # positive height ⇒ bottom-up rows), falling back to avih dims
        fw = v_w if v_w else width
        fh = abs(v_h) if v_h else height
        return _bgr_rows_to_rgb(
            b[body:body_end], fw, fh, bottom_up=(v_h is None or v_h > 0)
        )

    return width, height, fps, chunk_ranges, decode_one


def decode_avi(b: bytes) -> tuple[int, int, float, list[np.ndarray]]:
    """bytes → (width, height, fps, [uint8 (h, w, 3) RGB frames]).

    Minimal RIFF/AVI reader for UNCOMPRESSED 24-bit DIB video ('00db'/'00dc'
    chunks with BI_RGB data) and MOTION-JPEG ('MJPG' biCompression — every
    frame chunk is a standalone JPEG through ``decode_jpeg``, grayscale
    frames expanded to RGB), completing the modality set next to the image
    and audio codecs. Other codecs raise NotImplementedError naming the
    library that would handle them, keeping the gate honest."""
    width, height, fps, chunk_ranges, decode_one = _parse_avi(b)
    return width, height, fps, [decode_one(i) for i in range(len(chunk_ranges))]


def sample_frame_indices(n: int, stride: int = 1, max_frames: int | None = None) -> list[int]:
    """The PINNED frame-sampling rule shared by every bounded video kernel
    (and mirrored in oracle closed forms): stride first (indices 0, stride,
    2*stride, ...), then if more than ``max_frames`` remain keep the
    ``max_frames`` evenly-spaced survivors idx[floor(j*L/k)] for j in 0..k-1
    (strictly increasing for L > k, always including frame 0). Deterministic,
    no RNG — the same payload samples the same frames on every executor, so
    standing indexes and probes stay bit-identical."""
    idx = list(range(0, n, stride))
    length = len(idx)
    if max_frames is not None and length > max_frames:
        idx = [idx[(j * length) // max_frames] for j in range(max_frames)]
    return idx


def decode_avi_sampled(
    b: bytes, stride: int = 1, max_frames: int | None = None
) -> tuple[int, int, float, int, list[np.ndarray]]:
    """bytes → (width, height, fps, TOTAL frame count, sampled decoded
    frames). The container walk locates every frame chunk (cheap), but only
    the ``sample_frame_indices`` selection is actually decoded — the cost cap
    that keeps per-video work bounded on hour-long footage while geometry,
    fps and duration (total count / fps) stay exact."""
    width, height, fps, chunk_ranges, decode_one = _parse_avi(b)
    n = len(chunk_ranges)
    frames = [decode_one(i) for i in sample_frame_indices(n, stride, max_frames)]
    return width, height, fps, n, frames


def encode_avi_mjpeg(gray_frames: list[np.ndarray], fps: int = 10, repeat: int = 1) -> bytes:
    """[(h, w) uint8 grayscale] → Motion-JPEG RIFF AVI bytes: every frame is
    a standalone baseline JPEG in a '00dc' chunk, strf biCompression 'MJPG'
    (``decode_avi``'s compressed-path inverse; used by tests and the
    synthetic media corpus). ``repeat`` tiles the frame CYCLE that many times
    in the movi list (each distinct frame JPEG-encoded once, its chunk bytes
    reused) — long-footage fixtures for the bounded-sampling scale probes
    without O(total frames) encode cost; a decoder sees an ordinary
    ``len(gray_frames) * repeat``-frame stream."""
    from kda_flink_demo_spark.operators.llm import jpeg

    if not gray_frames:
        raise ValueError("need at least one frame")
    if repeat < 1:
        raise ValueError(f"repeat must be >= 1, got {repeat}")
    h, w = gray_frames[0].shape[0], gray_frames[0].shape[1]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    payloads = [jpeg.encode_jpeg_gray(f) for f in gray_frames]
    n_frames = len(payloads) * repeat
    max_sz = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_sz * fps, 0, 0x10, n_frames, 0, 1,
        max_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n_frames,
        max_sz, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, max_sz, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads) * repeat
    riff_body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """[uint8 (h, w, 3) RGB] → minimal uncompressed 24-bit DIB RIFF AVI bytes
    (the decode_avi inverse; deterministic, used by tests and the synthetic
    media corpus)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, row_stride * h * fps, 0, 0x10, len(frames), 0, 1,
        row_stride * h, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        row_stride * h, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_stride * h, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        chunk(
            b"00db",
            b"".join(bytes(f[y, :, ::-1].tobytes()) + pad for y in range(h - 1, -1, -1)),
        )
        for f in frames
    )
    riff_body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
