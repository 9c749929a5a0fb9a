"""Perceptual image near-dup detection — the multimodal member of the dedup
family (text: minhash/simhash/ngram; embeddings: cosine; images: THIS).

Pipeline: decode payload → grayscale → 8×8 nearest resize → average hash
(bit i = pixel i > mean) packed into one BIGINT — then the pair stage is the
exact SimHash machinery: block on 16-bit quarters (two hashes within Hamming
distance ≤ 3 of a 64-bit code share at least one exact quarter; wider radii
still catch most real near-dups because perceptual perturbations cluster),
equi-join within blocks, verify with a JVM popcount. Decode runs once per
image in Arrow-batched mapInPandas (PIL when installed, else the pure
PPM/PGM/BMP codec in ``imaging.py``); everything after the 8-byte hash is
pure JVM.

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

AHASH_SCHEMA = "doc_id long, ahash long"


def image_ahash(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(id, payload) → (doc_id, ahash): the 64-bit average hash of the decoded
    image. Arrow-batched mapInPandas; unsupported formats raise the same
    honest NotImplementedError as ``multimodal.decode_image_features``."""

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io as _io

        import numpy as np
        import pandas as pd

        from kda_flink_demo_spark.operators.llm import imaging

        try:  # pragma: no cover - PIL absent here; pure codec is the tested path
            from PIL import Image

            has_pil = True
        except Exception:
            has_pil = False

        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                if has_pil:  # pragma: no cover
                    img = Image.open(_io.BytesIO(bytes(b))).convert("L").resize((8, 8))
                    small = np.asarray(img, dtype=np.int64)
                else:
                    _w, _h, c, px = imaging.decode_image(bytes(b))
                    px64 = px.astype(np.int64)
                    gray = (
                        px64[:, :, 0]
                        if c == 1
                        else (299 * px64[:, :, 0] + 587 * px64[:, :, 1] + 114 * px64[:, :, 2]) // 1000
                    )
                    small = imaging.resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]
                bits = (small > small.mean()).flatten()
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                # two's-complement into a signed 64-bit long for the JVM column
                if h >= 1 << 63:
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def _quartered(hashes: DataFrame, prefix: str) -> DataFrame:
    """(doc_id, ahash) → one row per 16-bit quarter: (q, qv, <prefix>id,
    <prefix>h) — map-side explode, no shuffle."""
    return hashes.select(
        F.col("doc_id").alias(f"{prefix}id"),
        F.col("ahash").alias(f"{prefix}h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright("ahash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("blk"),
    ).select(f"{prefix}id", f"{prefix}h", F.col("blk.q").alias("q"), F.col("blk.qv").alias("qv"))


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
    second time (r08 second-review finding)."""
    bh = (
        batch_hashes
        if batch_hashes is not None
        else image_ahash(incoming, id_col=id_col, payload_col=payload_col).localCheckpoint()
    )
    bq = _quartered(bh, "b_")
    ham_hits = None
    if index is not None:
        iq = _quartered(index, "i_")
        idx_matched = (
            iq.join(broadcast(bq), ["q", "qv"])
            .filter(F.bit_count(F.col("i_h").bitwiseXOR(F.col("b_h"))) <= max_hamming)
            .select(F.col("b_id").alias("_drop_id"))
            .distinct()
        )
        ham_hits = idx_matched
    within = (
        bq.join(
            bq.select(
                F.col("q"), F.col("qv"),
                F.col("b_id").alias("a_id"), F.col("b_h").alias("a_h"),
            ),
            ["q", "qv"],
        )
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.bit_count(F.col("a_h").bitwiseXOR(F.col("b_h"))) <= max_hamming)
        )
        .select(F.col("b_id").alias("_drop_id"))
        .distinct()
    )
    drops = within if ham_hits is None else ham_hits.unionByName(within).distinct()
    return incoming.join(
        broadcast(drops), F.col(id_col) == F.col("_drop_id"), "left_anti"
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
    hashes = image_ahash(df, id_col=id_col, payload_col=payload_col).localCheckpoint()
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming)


def hash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 5) -> DataFrame:
    """Quarter-blocked near-dup pairs over ANY (doc_id, ahash BIGINT) table —
    the shared back half of the perceptual dedup family (images via
    image_ahash, audio via audio_ahash). Rows: (id_a, id_b, hamming)."""
    a = _quartered(hashes, "a_").withColumnsRenamed({"a_id": "id_a", "a_h": "h_a"})
    b = _quartered(hashes, "b_").withColumnsRenamed({"b_id": "id_b", "b_h": "h_b"})
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["q", "qv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


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

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kda_flink_demo_spark.operators.llm import imaging

        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                _sr, _nf, _ch, samples = imaging.decode_wav(bytes(b))
                if samples.size < n_windows:
                    samples = np.pad(samples, (0, n_windows - samples.size))
                usable = (samples.size // n_windows) * n_windows
                energy = (samples[:usable] ** 2).reshape(n_windows, -1).mean(axis=1)
                bits = energy > np.median(energy)
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                if h >= 1 << 63:
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate audio pairs via the shared quarter-blocked machinery
    over the energy-envelope fingerprint (volume-scaled or lightly-noised
    re-encodes of the same clip collide; different envelopes don't)."""
    hashes = audio_ahash(df, id_col=id_col, payload_col=payload_col).localCheckpoint()
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming)
