"""Perceptual image near-dup detection — the multimodal member of the dedup
family (text: minhash/simhash/ngram; embeddings: cosine; images: THIS).

Pipeline: decode payload → grayscale → 8×8 nearest resize → average hash
(bit i = pixel i > mean) packed into one BIGINT — then the pair stage is the
exact SimHash machinery: block on 16-bit quarters (two hashes within Hamming
distance ≤ 3 of a 64-bit code share at least one exact quarter; wider radii
still catch most real near-dups because perceptual perturbations cluster),
equi-join within blocks, verify with a JVM popcount. Decode runs once per
image in Arrow-batched mapInPandas; the hash MATH (integer luma, floor-nearest
resize, mean threshold, MSB-first packbits) is always the pure path so hashes
are backend-invariant — PIL, when installed, only decodes byte formats the
pure PPM/PGM/BMP codec can't. Everything after the 8-byte hash is pure JVM.

Scale shape: the corpus collapses to (id, 8-byte hash) in one scan — image
bytes never enter a shuffle; the quarter-block join touches only hash rows
and bounds candidate generation to per-block cross products (perceptually
random images spread uniformly over 2^16 buckets per quarter). The verify is
``bit_count(a XOR b)`` — no second decode. This is the standard production
layout for billion-image dedup (aHash/pHash + banded exact-match blocking).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kda_flink_demo_spark.functions import narrow_checkpoint

AHASH_SCHEMA = "doc_id long, ahash long"


def pack_bits_i64(bitmat: "np.ndarray") -> "np.ndarray":
    """(n, 64) uint8 bit matrix → (n,) int64: one vectorized pack for a whole
    Arrow batch — MSB-first bytes viewed as big-endian int64 == the
    (h << 1 | bit) fold, two's complement included; no per-item Python bit
    loop (r08 advice)."""
    import numpy as np

    if not len(bitmat):
        return np.empty(0, dtype=np.int64)
    return np.packbits(bitmat, axis=1).view(">i8").reshape(-1).astype(np.int64)


def image_hash_bits(b: bytes) -> "np.ndarray":
    """One image payload → its uint8[64] aHash bit vector (MSB-first layout:
    index k = hash bit 63−k). Module-level so the fused ingest-profile kernel
    and the dedicated ``image_ahash`` scan share the EXACT same math (and so
    fake-PIL tests can execute it driver-side)."""
    small = _canonical_8x8_gray(b)
    return (small > small.mean()).flatten().astype("uint8")


def image_ahash(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(id, payload) → (doc_id, ahash): the 64-bit average hash of the decoded
    image. Arrow-batched mapInPandas; unsupported formats raise the same
    honest NotImplementedError as ``multimodal.decode_image_features``."""

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            bitmat = np.zeros((n, 64), dtype=np.uint8)
            for i, b in enumerate(pdf[payload_col]):
                bitmat[i] = image_hash_bits(bytes(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "ahash": pd.Series(pack_bits_i64(bitmat), dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def _canonical_8x8_gray(b: bytes) -> "np.ndarray":
    """Decode image bytes → the canonical 8×8 int64 grayscale used for aHash.

    The hash math (integer ITU-R 601-2 luma, floor-nearest resize, mean
    threshold) is ALWAYS the pure path, so the hash is identical on every
    backend; PIL — when installed — is used ONLY to decode byte formats the
    pure codec can't (PNG/JPEG/...). Without this, a cluster with mixed PIL
    availability would silently mix incomparable hashes into the standing
    aHash index (PIL's resize defaults to bicubic) and the ingest gate would
    stop catching real near-dups — the r08 advice's medium finding."""
    import io as _io

    import numpy as np

    from kda_flink_demo_spark.operators.llm import imaging

    try:
        _w, _h, c, px = imaging.decode_image(b)
    except NotImplementedError as gate:
        try:
            from PIL import Image
        except Exception:
            raise gate  # no PIL either: the honest format gate stands
        px = np.asarray(Image.open(_io.BytesIO(b)).convert("RGB"), dtype=np.uint8)
        c = 3
    return pixels_to_8x8_gray(px, c)


def pixels_to_8x8_gray(px: "np.ndarray", c: int) -> "np.ndarray":
    """Decoded (h, w, c) uint8 pixels → the canonical 8×8 int64 gray (integer
    ITU-R 601-2 luma, floor-nearest resize) — the pure back half of
    ``_canonical_8x8_gray``, split out so the fused ingest-profile kernel can
    decode ONCE and feed the same pixels to brightness + aHash."""
    import numpy as np

    from kda_flink_demo_spark.operators.llm import imaging

    px64 = px.astype(np.int64)
    gray = (
        px64[:, :, 0]  # gray / gray+alpha: channel 0 IS the luma
        if c <= 2
        else (299 * px64[:, :, 0] + 587 * px64[:, :, 1] + 114 * px64[:, :, 2]) // 1000
    )
    return imaging.resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]


def image_bits_from_pixels(px: "np.ndarray", c: int) -> "np.ndarray":
    """Already-decoded pixels → the uint8[64] aHash bit vector (the same math
    as ``image_hash_bits`` minus the decode)."""
    small = pixels_to_8x8_gray(px, c)
    return (small > small.mean()).flatten().astype("uint8")


def _quartered(df: DataFrame, hash_col: str, keep: list[str]) -> DataFrame:
    """One row per 16-bit quarter of ``hash_col``: (*keep, q, qv) —
    map-side explode, no shuffle."""
    return df.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(hash_col, q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("blk"),
    ).select(*keep, F.col("blk.q").alias("q"), F.col("blk.qv").alias("qv"))


def _distinct_hash_pairs(hashes: DataFrame, max_hamming: int) -> DataFrame:
    """Unordered pairs of DISTINCT hash values within ``max_hamming``:
    (h_a < h_b, hamming ≥ 1), via the quarter-blocked self-join.

    Collapsing to hash VALUES before the blocked join is the monoculture
    defense (r09 skew probe): a corpus of near-identical items (screenshot
    farms, re-encoded uploads) concentrates one quarter bucket, and a
    doc-level self-join would pay O(n²) candidate pairs inside that block —
    AQE can split the straggler task but cannot shrink the quadratic work.
    Distinct hash values are bounded by the CONTENT diversity (monoculture ⇒
    few), so the block cross-product collapses to O(distinct²) and exact
    duplicates only reappear at output-expansion time, which is output-sized
    by definition."""
    d = hashes.select("ahash").distinct()
    qa = _quartered(d.select(F.col("ahash").alias("h_a")), "h_a", ["h_a"])
    qb = _quartered(d.select(F.col("ahash").alias("h_b")), "h_b", ["h_b"])
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        qa.join(qb, ["q", "qv"])
        .filter(F.col("h_a") < F.col("h_b"))
        .select("h_a", "h_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_dedup_probe(
    incoming: DataFrame,
    index: DataFrame | None,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_hashes: DataFrame | None = None,
) -> DataFrame:
    """Incremental-ingest image dedup: drop incoming images that perceptually
    near-dup (aHash hamming ≤ max_hamming) an image in the standing
    ``(doc_id, ahash)`` index OR an earlier (smaller-id) image within the
    same batch — the fuzzy-ingest/span-gate shape applied to the multimodal
    column. Returns the surviving incoming rows, all columns intact.

    Scale shape: the BATCH side is hashed once (localCheckpointed — its
    quarters feed two joins) and BROADCAST into the quartered index scan, so
    the corpus-sized index never shuffles and the per-batch cost is
    O(index scan + batch²-within-blocks); images themselves never leave
    their scan (the probe works on 8-byte hashes). Pass ``batch_hashes``
    (an already-materialized ``image_ahash`` table for ``incoming``) when
    the caller needs the hashes too — ``update_ahash_index_store`` writes
    them as the index segment, and recomputing would decode every image a
    second time (r08 second-review finding).

    Driver-memory bound: the final left-anti join BROADCASTS the drop-id
    list, which is bounded by the BATCH size (never the index/corpus — all
    three drop sources are subsets of the batch's ids). Micro-batches are
    sized by the stream trigger (maxFilesPerTrigger / maxOffsetsPerTrigger),
    so in practice this is millions of 8-byte ids at most; a caller feeding
    pathologically huge batches (≳100M rows AND mostly duplicates) should
    lower the trigger size — or replace ``broadcast(...)`` with a plain
    shuffle anti-join, which the optimizer picks automatically once the hint
    is dropped (r09 advice: document the bound)."""
    bh = (
        batch_hashes
        if batch_hashes is not None
        else image_ahash(incoming, id_col=id_col, payload_col=payload_col).localCheckpoint()
    )
    # the decode ran parallel (above, before the checkpoint); the DROP
    # machinery below is a handful of joins over the batch-sized 8-byte hash
    # table, and inheriting the decode's 32-way partitioning just multiplies
    # near-empty tasks across ~10 micro-stages (measured ~2× the per-batch
    # wall at test scale) — narrow it once. The batch side is micro-batch-
    # sized by contract (see the driver-memory note below); the INDEX side
    # keeps its scan parallelism untouched.
    bh = bh.coalesce(1)
    # collapse the batch to distinct hash values + the per-value minimal id —
    # the monoculture defense (see _distinct_hash_pairs): every join below
    # touches hash VALUES, never one row per duplicate image
    per_hash = bh.groupBy("ahash").agg(F.min("doc_id").alias("_min_id"))
    # (1) non-minimal ids of a repeated hash always drop (their min is an
    #     earlier exact-dup) — a hash-equality join, no blocking needed
    same_hash_drops = (
        bh.join(broadcast(per_hash), "ahash")
        .filter(F.col("doc_id") > F.col("_min_id"))
        .select(F.col("doc_id").alias("_drop_id"))
    )
    # (2) hash values that near-dup the standing index drop ALL their ids:
    #     distinct batch quarters broadcast into the quartered index scan, so
    #     the corpus-sized index never shuffles
    dropped_hashes = None
    if index is not None:
        bq = _quartered(
            per_hash.select(F.col("ahash").alias("b_h")), "b_h", ["b_h"]
        )
        iq = _quartered(
            index.select(F.col("ahash").alias("i_h")).distinct(), "i_h", ["i_h"]
        )
        dropped_hashes = (
            iq.join(broadcast(bq), ["q", "qv"])
            .filter(F.bit_count(F.col("i_h").bitwiseXOR(F.col("b_h"))) <= max_hamming)
            .select(F.col("b_h").alias("ahash"))
            .distinct()
        )
    # (3) across distinct batch hash values within max_hamming, the LATER
    #     minimal id drops (an earlier in-batch near-dup exists)
    vpairs = _distinct_hash_pairs(bh, max_hamming)
    mins_a = per_hash.select(F.col("ahash").alias("h_a"), F.col("_min_id").alias("_min_a"))
    mins_b = per_hash.select(F.col("ahash").alias("h_b"), F.col("_min_id").alias("_min_b"))
    cross_min_drops = (
        vpairs.join(mins_a, "h_a")
        .join(mins_b, "h_b")
        .select(
            F.greatest("_min_a", "_min_b").alias("_drop_id"),
        )
    )
    drops = same_hash_drops.unionByName(cross_min_drops)
    if dropped_hashes is not None:
        drops = drops.unionByName(
            bh.join(broadcast(dropped_hashes), "ahash").select(
                F.col("doc_id").alias("_drop_id")
            )
        )
    return incoming.join(
        broadcast(drops.distinct()), F.col(id_col) == F.col("_drop_id"), "left_anti"
    )


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming ≤ max_hamming) via
    quarter blocking over the aHash table. Candidate recall: exact for
    max_hamming ≤ 3 (pigeonhole over 4 quarters); above that, a pair is
    missed only when all four quarters differ — rare for perceptual
    perturbations, which concentrate flips in few bit positions.
    Rows: (id_a, id_b, hamming)."""
    # localCheckpoint the (id, 8-byte hash) table — it's tiny, and without it
    # the CPU-heavy per-image decode mapInPandas feeds BOTH sides of the
    # self-join and can run twice (the simhash_pairs lesson; r08 review
    # finding). Eager construction cost, measured like every standing build.
    hashes = narrow_checkpoint(
        image_ahash(df, id_col=id_col, payload_col=payload_col), 500_000
    )
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming)


def hash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 5) -> DataFrame:
    """Quarter-blocked near-dup pairs over ANY (doc_id, ahash BIGINT) table —
    the shared back half of the perceptual dedup family (images via
    image_ahash, audio via audio_ahash). Rows: (id_a, id_b, hamming).

    The blocked self-join runs on DISTINCT hash values (see
    _distinct_hash_pairs — the monoculture defense); doc-level rows reappear
    only in the expansion joins, whose cost is the true pair count (the
    output itself). Exact-duplicate pairs (hamming 0) come from a plain
    hash-equality self-join — no blocking machinery needed for equality."""
    vpairs = _distinct_hash_pairs(hashes, max_hamming)
    ia = hashes.select(F.col("doc_id").alias("_id_x"), F.col("ahash").alias("h_a"))
    ib = hashes.select(F.col("doc_id").alias("_id_y"), F.col("ahash").alias("h_b"))
    cross = (
        vpairs.join(ia, "h_a")
        .join(ib, "h_b")
        .select(
            F.least("_id_x", "_id_y").alias("id_a"),
            F.greatest("_id_x", "_id_y").alias("id_b"),
            "hamming",
        )
    )
    x = hashes.select("ahash", F.col("doc_id").alias("id_a"))
    y = hashes.select("ahash", F.col("doc_id").alias("id_b"))
    same = (
        x.join(y, "ahash")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(same)


def hash_near_dup_edges(hashes: DataFrame, max_hamming: int = 5) -> DataFrame:
    """Connectivity-equivalent, LINEAR-sized edge list (doc_a, doc_b) for the
    near-dup graph — the input connected-components actually needs.

    The full pair graph is quadratic per near-dup cluster (a 250-copy image
    contributes C(250,2) pairs; a screenshot-farm corpus makes it the
    dominant shuffle). Connectivity doesn't need it: per hash VALUE, a star
    from the minimal id to its exact-dup siblings (n−1 edges), plus ONE edge
    between the minimal ids of every distinct-hash pair within max_hamming.
    Any near-dup pair (a, b) is then connected via min(hash(a)) —
    min(hash(b)), so components — and therefore canonical selection — are
    IDENTICAL to the full pair graph's (test-pinned), at O(n + distinct²
    within block) total cost."""
    per_hash = hashes.groupBy("ahash").agg(F.min("doc_id").alias("_min_id"))
    star = (
        hashes.join(per_hash, "ahash")
        .filter(F.col("doc_id") > F.col("_min_id"))
        .select(F.col("_min_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    vpairs = _distinct_hash_pairs(hashes, max_hamming)
    mins_a = per_hash.select(F.col("ahash").alias("h_a"), F.col("_min_id").alias("_min_a"))
    mins_b = per_hash.select(F.col("ahash").alias("h_b"), F.col("_min_id").alias("_min_b"))
    cross = (
        vpairs.join(mins_a, "h_a")
        .join(mins_b, "h_b")
        .select(
            F.least("_min_a", "_min_b").alias("doc_a"),
            F.greatest("_min_a", "_min_b").alias("doc_b"),
        )
    )
    return star.unionByName(cross)


def image_near_dup_edges(
    df: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Linear-sized clustering edges over the image corpus (one decode+hash
    scan, then hash_near_dup_edges) — feed this to connected_components /
    dedup_clusters instead of the quadratic image_near_dup_pairs output."""
    hashes = narrow_checkpoint(
        image_ahash(df, id_col=id_col, payload_col=payload_col), 500_000
    )
    return hash_near_dup_edges(hashes, max_hamming=max_hamming)


def audio_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_windows: int = 64,
) -> DataFrame:
    """(id, WAV payload) → (doc_id, ahash): a 64-bit energy-envelope
    fingerprint — the audio sibling of ``image_ahash``. The decoded samples
    split into ``n_windows`` equal windows; bit i = window i's mean energy >
    the MEDIAN window energy, so the fingerprint is invariant to volume
    scaling (every energy scales by the same factor) and robust to small
    noise, while different temporal envelopes flip many bits. Arrow-batched
    mapInPandas over the stdlib WAV codec; compressed formats raise the same
    honest NotImplementedError as ``decode_audio_features``."""
    if n_windows != 64:
        raise ValueError("the fingerprint is one BIGINT — n_windows must be 64")

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            bitmat = np.zeros((n, n_windows), dtype=np.uint8)
            for i, b in enumerate(pdf[payload_col]):
                bitmat[i] = audio_hash_bits(bytes(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "ahash": pd.Series(pack_bits_i64(bitmat), dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def audio_hash_bits(b: bytes) -> "np.ndarray":
    """One WAV payload → its uint8[64] energy-envelope fingerprint bits."""
    from kda_flink_demo_spark.operators.llm import imaging

    _sr, _nf, ch, samples = imaging.decode_wav(b)
    return audio_bits_from_samples(samples, channels=ch)


def audio_bits_from_samples(samples: "np.ndarray", channels: int = 1) -> "np.ndarray":
    """Already-decoded samples → fingerprint bits (bit k = window k's mean
    energy > the MEDIAN window energy). Split out so the fused ingest-profile
    kernel can decode ONCE and feed the same samples to rms + fingerprint.

    Multichannel audio DOWNMIXES to mono first (per-frame channel mean, the
    standard ITU downmix for equal-weighted channels) — so a stereo re-encode
    of a mono clip fingerprints identically to its source and collides in the
    near-dup gate, which is the semantics a dedup fingerprint owes (r12;
    interleaved windowing would mix channel energies unpredictably for
    true stereo)."""
    import numpy as np

    if channels > 1:
        usable = (samples.size // channels) * channels
        samples = samples[:usable].reshape(-1, channels).mean(axis=1)
    if samples.size < 64:
        samples = np.pad(samples, (0, 64 - samples.size))
    usable = (samples.size // 64) * 64
    energy = (samples[:usable] ** 2).reshape(64, -1).mean(axis=1)
    return (energy > np.median(energy)).astype(np.uint8)


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate audio pairs via the shared quarter-blocked machinery
    over the energy-envelope fingerprint (volume-scaled or lightly-noised
    re-encodes of the same clip collide; different envelopes don't)."""
    hashes = narrow_checkpoint(
        audio_ahash(df, id_col=id_col, payload_col=payload_col), 500_000
    )
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming)


VIDEO_MAX_FRAMES = 9
"""Default bounded frame sample for the video fingerprint: ODD (a majority
vote over an odd count can't tie) and small enough that per-video decode cost
is a constant, not O(duration) — the r10 scale finding was that the per-frame
JPEG entropy decode is the heaviest per-row kernel in the repo, so an unbounded
per-frame walk is dishonest at video-lake scale. Sampling follows
``imaging.sample_frame_indices`` (deterministic, evenly spaced, pinned), and
videos with <= 9 frames hash ALL frames — identical to the unbounded
fingerprint, which keeps every existing oracle/index bit-for-bit unchanged.
Pass ``max_frames=None`` for the exact full-majority fingerprint."""


def video_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 1,
    max_frames: int | None = VIDEO_MAX_FRAMES,
) -> DataFrame:
    """(id, AVI payload) → (doc_id, ahash): a 64-bit video fingerprint — the
    MAJORITY of the sampled frames' canonical aHash bits (bit b set iff more
    than half the sampled frames set it). Majority voting makes the
    fingerprint robust to a minority of outlier frames (intro cards, corrupt
    frames, scene bumpers) while re-encodes/brightness shifts of the same
    footage collide exactly — the temporal analogue of the image mean
    threshold. Per-video cost is BOUNDED: only the ``max_frames`` sampled
    frame chunks are decoded (container walk stays cheap), so an hour of
    footage costs the same decode work as a clip. Pure RIFF/AVI decode;
    compressed codecs raise the honest NotImplementedError naming
    pyav/ffmpeg. Rides the shared quarter-blocked pair/gate machinery like
    every (doc_id, ahash) table."""
    if stride < 1:
        # fail at plan-construction time on the driver: stride=0 would die
        # deep inside the Arrow worker with an opaque 'slice step cannot be
        # zero', and a negative stride silently reverses frame order (advice)
        raise ValueError(f"stride must be >= 1, got {stride}")
    if max_frames is not None and max_frames < 1:
        raise ValueError(f"max_frames must be >= 1 or None, got {max_frames}")

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            bitmat = np.zeros((n, 64), dtype=np.uint8)
            for i, b in enumerate(pdf[payload_col]):
                bitmat[i] = video_hash_bits(bytes(b), stride=stride, max_frames=max_frames)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "ahash": pd.Series(pack_bits_i64(bitmat), dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def video_hash_bits(
    b: bytes, stride: int = 1, max_frames: int | None = VIDEO_MAX_FRAMES
) -> "np.ndarray":
    """One video payload → its uint8[64] temporal-majority fingerprint bits
    (decoding only the pinned bounded frame sample; routed through the
    backend dispatch, so H.264/MP4 footage fingerprints identically when the
    worker has pyav)."""
    from kda_flink_demo_spark.operators.llm.multimodal import _video_decode_sampled

    return video_bits_from_frames(
        _video_decode_sampled(b, stride=stride, max_frames=max_frames)[4]
    )


def video_bits_from_frames(frames: list) -> "np.ndarray":
    """Already-decoded RGB frames → fingerprint bits: per-frame canonical
    aHash bits, MAJORITY vote across frames (bit set iff more than half the
    frames set it). Split out so the fused ingest-profile kernel can decode
    ONCE and feed the same frames to geometry/duration + fingerprint."""
    import numpy as np

    votes = np.zeros(64, dtype=np.int64)
    for f in frames:
        votes += image_bits_from_pixels(f, 3)
    return (2 * votes > len(frames)).astype(np.uint8)


def video_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 1,
) -> DataFrame:
    """Near-duplicate video pairs via the shared quarter-blocked machinery
    over the temporal-majority fingerprint."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")  # mirrors video_ahash
    hashes = narrow_checkpoint(
        video_ahash(df, id_col=id_col, payload_col=payload_col, stride=stride), 500_000
    )
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming)
