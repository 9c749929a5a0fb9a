"""Probe: JPEG Huffman-LUT memo bound vs optimized-table-heavy corpora.

The r11 review bounded the decoder's LUT memo at 64 entries (~8 MB/worker)
and asserted the thrash case harmless by argument only (r11 verdict
directive 6 / "what's wrong" #3). This probe measures it: a corpus where
EVERY image carries its own optimized DHT (``encode_jpeg_gray(optimize=True)``
— the common real-world case: libjpeg -optimize, mozjpeg, most phone
cameras), decoded repeatedly with the memo bound set to 16 / 64 / 256.

- bound < distinct tables → every decode rebuilds its LUT (worst-case
  thrash: the LRU evicts each entry before its next use);
- bound > distinct tables → steady-state all-hit after the first pass.

The gap between those two IS the maximum damage the bound can cause; the
per-image LUT build cost is also reported standalone. Run on a quiet host:

    python scripts/probe_jpeg_lut.py [n_images] [rounds]

Results land in SCALE.md's evidence table.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kda_flink_demo_spark.operators.llm import jpeg  # noqa: E402


def build_corpus(n: int) -> list[bytes]:
    """n 48x48 random-noise JPEGs, each with its own optimized DHT (noise
    maximizes AC symbol diversity so the optimized tables genuinely differ)."""
    rng = np.random.RandomState(20260816)
    corpus = []
    for _ in range(n):
        px = rng.randint(0, 256, (48, 48), dtype=np.uint8)
        corpus.append(jpeg.encode_jpeg_gray(px, optimize=True))
    return corpus


def distinct_dhts(corpus: list[bytes]) -> int:
    seen = set()
    for b in corpus:
        i = b.index(b"\xff\xc4")
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        seen.add(b[i + 4 : i + 2 + ln])
    return len(seen)


def decode_all(corpus: list[bytes], rounds: int) -> float:
    t0 = time.time()
    for _ in range(rounds):
        for b in corpus:
            jpeg.decode_jpeg(b)
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    corpus = build_corpus(n)
    print(f"corpus: {n} images, {distinct_dhts(corpus)} distinct DHTs, {rounds} rounds")

    # standalone LUT build cost (the thing a miss pays twice: dict + LUT)
    key = (bytes(jpeg._AC_LUM_BITS), bytes(bytearray(jpeg._AC_LUM_VALS)))
    t0 = time.time()
    reps = 200
    for _ in range(reps):
        jpeg._HUFF_MEMO.clear()
        jpeg._LUT_MEMO.clear()
        jpeg._huffman_lut_cached(key)
    per_build_ms = (time.time() - t0) / reps * 1e3
    print(f"single table dict+LUT build: {per_build_ms:.2f} ms")

    results = {}
    default_bound = jpeg._LUT_MEMO_BOUND
    try:
        for bound in (16, 64, 256):
            jpeg._LUT_MEMO_BOUND = bound
            jpeg._HUFF_MEMO.clear()
            jpeg._LUT_MEMO.clear()
            decode_all(corpus, 1)  # warm numpy/code paths outside the timing
            sec = decode_all(corpus, rounds)
            per_img_ms = sec / (rounds * n) * 1e3
            results[bound] = per_img_ms
            hit_state = "all-miss (thrash)" if bound < n else "all-hit"
            print(
                f"bound {bound:4d}: {sec:.3f} s total, {per_img_ms:.3f} ms/image "
                f"({hit_state})"
            )
    finally:
        jpeg._LUT_MEMO_BOUND = default_bound
        jpeg._HUFF_MEMO.clear()
        jpeg._LUT_MEMO.clear()
    worst, best = max(results.values()), min(results.values())
    print(
        f"max thrash penalty: {worst - best:.3f} ms/image "
        f"({(worst / best - 1) * 100:.1f}% over all-hit)"
    )


if __name__ == "__main__":
    main()
