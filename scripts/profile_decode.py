"""Offline (no-Spark) profiler for the media decode kernels (r14 directive 1).

Synthesizes each corpus kind exactly as synth_media does (same doc_id math),
then times the decode kernel the bench rows run per payload — single-threaded
wall clock + optional cProfile of the hottest kind. This isolates pure Python
decode CPU from Spark fixed overhead so the optimization target is real.

Usage: python scripts/profile_decode.py [n_docs] [--cprofile KIND]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from kda_flink_demo_spark.operators.llm import imaging, jpeg, synth_media  # noqa: E402
from kda_flink_demo_spark.operators.llm.image_dedup import (  # noqa: E402
    audio_hash_bits,
    image_hash_bits,
    video_hash_bits,
)
from kda_flink_demo_spark.operators.llm.multimodal import _profile_row  # noqa: E402
from kda_flink_demo_spark.operators.llm.synth_media import (  # noqa: E402
    N_GROUPS,
    _bits_msb,
    audio_pattern,
    image_pattern,
)


def gen_images(d: int) -> bytes:
    off = (d // N_GROUPS % 8) * 5
    lvl = np.where(_bits_msb(image_pattern(d)).reshape(8, 8) == 1, 200 + off, 40 + off)
    big = np.repeat(np.repeat(lvl, 2, axis=0), 2, axis=1).astype(np.uint8)
    return imaging.encode_ppm(big[:, :, None])


def gen_pngs(d: int) -> bytes:
    off = (d // N_GROUPS % 8) * 5
    lo, hi = 40 + off, 200 + off
    bits = _bits_msb(image_pattern(d)).reshape(8, 8)
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
    return imaging.encode_png(lvl, filter_per_row=True, interlace=il,
                              depth=16 if (d // 8) % 2 else 8)


def gen_gifs(d: int) -> bytes:
    off = (d // N_GROUPS % 8) * 5
    pal = np.array([[40 + off] * 3, [200 + off] * 3], dtype=np.uint8)
    bits = _bits_msb(image_pattern(d)).reshape(8, 8)
    big = np.repeat(np.repeat(bits, 2, axis=0), 2, axis=1).astype(np.uint8)
    return imaging.encode_gif([big], pal, interlace=bool(d % 2))


def gen_jpegs(d: int) -> bytes:
    off = (d // N_GROUPS % 8) * 5
    bits = _bits_msb(image_pattern(d)).reshape(8, 8)
    lvl = np.where(bits == 1, 200 + off, 40 + off).astype(np.uint8)
    big = np.repeat(np.repeat(lvl, 8, axis=0), 8, axis=1)
    return jpeg.encode_jpeg_gray(big, dri=2 if d % 3 == 0 else 0, progressive=d % 3 == 1)


def gen_mjpeg(d: int) -> bytes:
    bits = _bits_msb(image_pattern(d)).reshape(8, 8)
    frames = []
    for i in range(d % 5 + 2):
        fb = (1 - bits) if i % 3 == 2 else bits
        off = (i * 7 + d) % 8 * 5
        lvl = np.where(fb == 1, 200 + off, 40 + off).astype(np.uint8)
        frames.append(np.repeat(np.repeat(lvl, 8, axis=0), 8, axis=1))
    return imaging.encode_avi_mjpeg(frames, fps=10)


def gen_wavs(d: int) -> bytes:
    import io as _io
    import wave as _wave

    s = 1 + (d // N_GROUPS % 4)
    amp = np.where(_bits_msb(audio_pattern(d)) == 1, 3000 * s, 300 * s)
    samples = np.repeat(amp.astype("<i2"), 32)
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def gen_wavs_widths(d: int) -> bytes:
    import io as _io
    import wave as _wave

    amps = {1: (25, 2), 2: (3000, 300), 3: (300_000, 30_000), 4: (80_000_000, 8_000_000)}
    s = 1 + (d // N_GROUPS % 4)
    m8 = d % 8
    if m8 >= 4:
        amp = np.where(_bits_msb(audio_pattern(d)) == 1, 3000 * s, 300 * s)
        vals = np.repeat(amp.astype(np.int64), 32)
        if m8 == 6:
            return imaging.encode_wav_ima_adpcm(vals)
        if m8 == 7:
            return imaging.encode_wav_ms_adpcm(vals)
        return imaging.encode_wav_g711(vals, "ulaw" if m8 == 4 else "alaw")
    sw = m8 + 1
    hi, lo = amps[sw]
    amp = np.where(_bits_msb(audio_pattern(d)) == 1, hi * s, lo * s)
    vals = np.repeat(amp.astype(np.int64), 32)
    if sw == 1:
        raw = (128 + vals).astype(np.uint8).tobytes()
    elif sw == 2:
        raw = vals.astype("<i2").tobytes()
    elif sw == 3:
        raw = (np.stack([vals & 0xFF, (vals >> 8) & 0xFF, (vals >> 16) & 0xFF], axis=1)
               .astype(np.uint8).tobytes())
    else:
        raw = vals.astype("<i4").tobytes()
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sw)
        wf.setframerate(8000)
        wf.writeframes(raw)
    return buf.getvalue()


def gen_videos(d: int) -> bytes:
    frames = []
    for i in range(d % 12 + 1):
        f = np.empty((4, 6, 3), dtype=np.uint8)
        f[:, :, 0] = (d * 31 + i * 17) % 256
        f[:, :, 1] = (d * 13 + i * 7) % 256
        f[:, :, 2] = (d * 29 + i * 3) % 256
        frames.append(f)
    return imaging.encode_avi(frames, fps=10)


def gen_pattern_videos(d: int) -> bytes:
    bits = _bits_msb(image_pattern(d)).reshape(8, 8)
    frames = []
    for i in range(d % 5 + 2):
        fb = (1 - bits) if i % 3 == 2 else bits
        off = (i * 7 + d) % 8 * 5
        lvl = np.where(fb == 1, 200 + off, 40 + off)
        big = np.repeat(np.repeat(lvl, 2, axis=0), 2, axis=1).astype(np.uint8)
        frames.append(np.repeat(big[:, :, None], 3, axis=2))
    return imaging.encode_avi(frames, fps=10)


KINDS = {
    "images": (gen_images, image_hash_bits),
    "pngs": (gen_pngs, image_hash_bits),
    "gifs": (gen_gifs, image_hash_bits),
    "jpegs": (gen_jpegs, image_hash_bits),
    "mjpeg_videos": (gen_mjpeg, video_hash_bits),
    "wavs": (gen_wavs, audio_hash_bits),
    "wavs_widths": (gen_wavs_widths, audio_hash_bits),
    "videos": (gen_videos, video_hash_bits),
    "pattern_videos": (gen_pattern_videos, video_hash_bits),
    "profile_mixed": (None, None),  # special: _profile_row over doc_id % 4 mix
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 500
    cprof_kind = None
    if "--cprofile" in sys.argv:
        cprof_kind = sys.argv[sys.argv.index("--cprofile") + 1]

    results = {}
    enc_results = {}
    for kind, (gen, kernel) in KINDS.items():
        if kind == "profile_mixed":
            # media_ingest_profile mix: images/wavs/videos/text by doc_id % 4
            payloads = []
            t0 = time.time()
            for d in range(n):
                m = d % 4
                if m == 0:
                    payloads.append(gen_images(d))
                elif m == 1:
                    payloads.append(gen_wavs(d))
                elif m == 2:
                    payloads.append(gen_videos(d))
                else:
                    payloads.append(b"just text %d" % d)
            enc_results[kind] = time.time() - t0
            t0 = time.time()
            for b in payloads:
                _profile_row(b)
            results[kind] = time.time() - t0
            continue
        t0 = time.time()
        payloads = [gen(d) for d in range(n)]
        enc_results[kind] = time.time() - t0
        t0 = time.time()
        for b in payloads:
            kernel(b)
        results[kind] = time.time() - t0

    print(f"n_docs={n}  (seconds, single-threaded)")
    print(f"{'kind':>16}  {'encode':>8}  {'decode':>8}  {'dec ms/doc':>10}")
    for kind in KINDS:
        print(f"{kind:>16}  {enc_results[kind]:8.3f}  {results[kind]:8.3f}"
              f"  {results[kind] / n * 1000:10.3f}")

    if cprof_kind:
        import cProfile
        import pstats

        gen, kernel = KINDS[cprof_kind]
        payloads = [gen(d) for d in range(n)]
        pr = cProfile.Profile()
        pr.enable()
        for b in payloads:
            kernel(b)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
