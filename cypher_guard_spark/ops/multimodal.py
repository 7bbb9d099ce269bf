"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators. The decode kernels themselves are STUBS in this
container (no image/audio libraries installed): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
hash-derived feature vector stands in. The Spark-side plumbing — schema,
partition sizing, UDF signature, batch shape — is real and tested, so
swapping in PIL/librosa later only replaces the kernel body.

Scale note: binary payloads dominate bytes. The operators keep them out of
shuffles entirely — every transform here is map-only; derived features are
small and are what downstream joins/aggregations touch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        # double, not float: the fake kernel emits 6dp-rounded float64 and
        # narrowing to float32 would break exact cross-engine comparison
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWxC. STUB: real decoding needs an image
    library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; pass fake=True for "
            "the deterministic stand-in"
        )
    return _fake_pixels(payload)


def _fake_pixels(payload: bytes) -> np.ndarray:
    """Deterministic 4x4x3 'image' derived from the payload digest."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 2)[:48], dtype=np.uint8)
    return arr.reshape(4, 4, 3)


def _fake_feature(payload: bytes, dim: int = 8) -> list:
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: dim * 4], dtype=np.uint32).astype(np.float64)
    return [float(x) for x in np.round(raw / np.float64(2**32), 6)]


def extract_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature[dim]).

    mapInPandas keeps payload bytes in Arrow batches; the feature kernel is
    the only part to swap for a real decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if not fake:  # pragma: no cover - real decoder not available here
                raise NotImplementedError("real decode kernels not available")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # vectorized over the batch; only the decode kernel
                    # itself (the part a real decoder replaces) is per-row
                    "n_bytes": payloads.str.len().fillna(0).astype("int32"),
                    "feature": [_fake_feature(b, dim) for b in payloads],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixel_digest", StringType()),
    ]
)


def _fake_resize_digest(payload: bytes, w: int, h: int) -> str:
    """Nearest-neighbor resample of the deterministic fake pixels, digested
    — the stand-in for a real resize kernel (same swap point as decode)."""
    px = _fake_pixels(payload)
    src_h, src_w = px.shape[0], px.shape[1]
    ys = [min(y * src_h // h, src_h - 1) for y in range(h)]
    xs = [min(x * src_w // w, src_w - 1) for x in range(w)]
    out = px[np.ix_(ys, xs)]
    return hashlib.md5(out.tobytes()).hexdigest()


def resize_images(
    media: DataFrame, width: int = 2, height: int = 2, fake: bool = True
) -> DataFrame:
    """image rows → (media_id, out_w, out_h, pixel_digest).

    Same shape as extract_features: payload bytes stay inside Arrow
    batches, the transform is map-only (binary never shuffles), and only
    the per-row kernel body is the environment-limited stub — a real
    decoder+resampler replaces `_fake_resize_digest` without touching the
    Spark plumbing. The digest (not the resized pixels) is the output
    here; a production variant would emit the resized bytes as a binary
    column with identical plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:  # pragma: no cover - real kernels not available
                raise NotImplementedError("real resize kernels not available")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": width,
                    "out_h": height,
                    "pixel_digest": [
                        _fake_resize_digest(b, width, height) for b in pdf["payload"]
                    ],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(batches, RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) sampling plan for video rows — pure JVM
    sequence expansion; the actual frame grab is the stubbed decode."""
    vids = media.where(F.col("kind") == "video").where(F.col("duration_ms") > 0)
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated digest
    bytes; sizes/durations derived from the id)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 5)
        rows.append(
            (
                f"m-{i:05d}",
                kind,
                bytearray(payload),
                32 * (1 + i % 4) if kind == "image" else None,
                24 * (1 + i % 4) if kind == "image" else None,
                1000 * (1 + i % 7) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("phash", LongType()),
    ]
)


def _ahash64(payload: bytes) -> int:
    """64-bit average hash of the (stub-)decoded image: grayscale →
    nearest-neighbor 8×8 resample → threshold at the mean → row-major
    bits. Returns a SIGNED int64 (Spark/DuckDB BIGINT two's complement)."""
    px = _fake_pixels(payload).astype(np.float64)
    gray = px.mean(axis=2)
    src_h, src_w = gray.shape
    ys = [min(y * src_h // 8, src_h - 1) for y in range(8)]
    xs = [min(x * src_w // 8, src_w - 1) for x in range(8)]
    g = gray[np.ix_(ys, xs)]
    mean = float(g.mean())
    bits = 0
    for r in range(8):
        for c in range(8):
            if float(g[r, c]) > mean:
                bits |= 1 << (r * 8 + c)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def ahash_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, phash) — 64-bit perceptual average-hash per media
    row, the image-dedup analogue of the text MinHash signature. The
    decode step is the SAME stub swap point as `extract_features`: with a
    real decoder, `_fake_pixels` becomes PIL decode and nearby images get
    nearby hashes; under the deterministic stub, pixels are digest-derived
    (avalanche), so only payload-identical media collide — exactness holds
    either way, perceptual nearness arrives with the real kernel
    (documented stub contract, SURVEY §2.8 multimodal row).

    Map-only mapInPandas; payload bytes stay in the scan's Arrow batches
    and never reach a shuffle — the output is 16 bytes/row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:  # pragma: no cover - real decoder not available
                raise NotImplementedError("real decode kernels not available")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": pd.array(
                        [_ahash64(b) for b in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(batches, AHASH_SCHEMA)


def phash_near_duplicates(
    hashes: DataFrame, max_dist: int = 3, n_chunks: int = 4
) -> DataFrame:
    """(media_id_a, media_id_b, dist) — unordered media pairs within
    Hamming distance `max_dist` of their 64-bit perceptual hashes, found
    by PIGEONHOLE blocking instead of an all-pairs scan: the hash splits
    into `n_chunks` equal bit chunks, and any pair within distance
    `max_dist` < n_chunks leaves at least one chunk untouched, so the
    equi-join on (chunk_index, chunk_value) is a COMPLETE candidate
    scheme (the same argument as the SimHash 16-bit-chunk join in
    ops/dedup.py); candidates are verified with one integer
    bit_count(xor) per DISTINCT pair — no FP anywhere.

    Scale: the shuffle carries (chunk, id) rows — 4 rows of ~20 bytes per
    image, payloads long gone; pair volume is quadratic only inside a
    shared-chunk bucket (16-bit chunks ⇒ 65536-way spread per index), and
    a degenerate hot chunk (e.g. all-black thumbnails hashing to 0) is
    the AQE skew-split case, not a single-task sort."""
    if not 0 < n_chunks <= 8 or 64 % n_chunks:
        raise ValueError("n_chunks must divide 64 and be <= 8")
    if max_dist >= n_chunks:
        raise ValueError("pigeonhole needs max_dist < n_chunks")
    width = 64 // n_chunks
    mask = (1 << width) - 1
    h = hashes.select(F.col("media_id"), F.col("phash"))
    chunk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("c"),
                    F.shiftrightunsigned("phash", c * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("v"),
                )
                for c in range(n_chunks)
            ]
        )
    ).alias("ch")
    banded = h.select("media_id", "phash", chunk).select(
        "media_id", "phash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v")
    )
    a = banded.select(
        "c", "v", F.col("media_id").alias("media_id_a"), F.col("phash").alias("ha")
    )
    b = banded.select(
        "c", "v", F.col("media_id").alias("media_id_b"), F.col("phash").alias("hb")
    )
    cands = (
        a.join(b, ["c", "v"])
        .where(F.col("media_id_a") < F.col("media_id_b"))
        .select("media_id_a", "media_id_b", "ha", "hb")
        .distinct()
    )
    return cands.select(
        "media_id_a",
        "media_id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("dist"),
    ).where(F.col("dist") <= max_dist)
