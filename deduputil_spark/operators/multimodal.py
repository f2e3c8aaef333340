"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, mapInPandas batch shapes,
partition-size control for fat binary rows, content-hash dedup — while the
actual codec work is stubbed behind `_decode_*` (the sandbox ships no
image/audio libraries).  Each stub either raises NotImplementedError
(strict=True) or produces a DETERMINISTIC fake derived from the bytes, so the
distributed pipeline around decode is fully testable.

Dedup of media assets is exactly the reference's block model: content hash
(md5) + byte-length key, byte-verify by grouping on the bytes themselves for
small assets / on (md5, sha2, length) for large ones
(/root/reference/src/dedup.c:329-395 A1/A2 semantics).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def _decode_image(payload: bytes, strict: bool) -> tuple[int, int, np.ndarray]:
    """STUB: real impl would be PIL/opencv.  Deterministic fake: dimensions and
    a 16-dim feature derived from the byte content (so tests are stable)."""
    if strict:
        raise NotImplementedError("image decode requires PIL/opencv (not in sandbox)")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat = (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)
    return width, height, feat


def _sample_frames(payload: bytes, n_frames: int, strict: bool) -> list[bytes]:
    """STUB: real impl would be ffmpeg frame sampling.  Deterministic fake:
    n_frames content-derived byte slices."""
    if strict:
        raise NotImplementedError("video frame sampling requires ffmpeg (not in sandbox)")
    if not payload:
        return []
    step = max(len(payload) // max(n_frames, 1), 1)
    return [payload[i * step : i * step + 32] for i in range(min(n_frames, len(payload)))]


def image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Vectorized decode/feature-extract over image assets (mapInPandas).

    Arrow batches carry the binary payloads; the UDF shape (Iterator of
    DataFrames in/out) is the real production signature — swap `_decode_image`
    for a PIL/torch body on a cluster with the libs installed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, feat = _decode_image(bytes(payload), strict)
                rows.append((aid, w, h, feat.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "feature"])

    return (
        media.filter(F.col("media_type") == "image")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def sample_video_frames(media: DataFrame, n_frames: int = 4, strict: bool = False) -> DataFrame:
    """1 video row -> n frame rows (mapInPandas explode of sampled frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, fb in enumerate(_sample_frames(bytes(payload), n_frames, strict)):
                    rows.append((aid, i, fb))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_bytes"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


def media_exact_dedup(media: DataFrame, large_threshold: int = 1 << 20) -> DataFrame:
    """Content-hash dedup of media assets (A1/A2 semantics on binary columns).

    Small assets byte-verify by grouping on the payload itself; large assets
    group on (md5, sha2-256, length) — double-hash + length stands in for the
    byte compare so gigabyte payloads never become a grouping key.
    Returns (content_key, n_copies, keeper_asset, asset_ids)."""
    keyed = media.select(
        "asset_id",
        F.md5("payload").alias("md5"),
        F.sha2("payload", 256).alias("sha256"),
        F.length("payload").alias("nbytes"),
        F.when(F.length("payload") <= large_threshold, F.col("payload")).alias("small_payload"),
    )
    return (
        keyed.groupBy("md5", "sha256", "nbytes", "small_payload")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("asset_id").alias("keeper_asset"),
            F.sort_array(F.collect_list("asset_id")).alias("asset_ids"),
        )
        .select(
            F.concat_ws(":", "md5", "nbytes").alias("content_key"),
            "n_copies",
            "keeper_asset",
            "asset_ids",
        )
    )


def repartition_for_fat_rows(media: DataFrame, target_bytes_per_partition: int = 256 << 20) -> DataFrame:
    """Size partitions by PAYLOAD bytes, not row count — 1000 × 4 MB videos is
    4 GB in one Arrow batch if you let defaults ride.  Computes total bytes
    (cheap agg) and range-repartitions on asset_id into ceil(total/target)."""
    total = media.agg(F.sum(F.length("payload"))).collect()[0][0] or 0
    nparts = max(int(total // target_bytes_per_partition) + 1, 1)
    return media.repartitionByRange(nparts, "asset_id")


def synth_media(spark, n_assets: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (planted exact dups)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_assets):
        mt = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(200, 2000)), dtype=np.uint8).tobytes()
        rows.append((f"a{i:04d}", f"c{i % 20:06d}", mt, f"{mt}/fake", payload, {"src": "synth"}))
        if i % 7 == 0:  # planted exact duplicate asset
            rows.append((f"a{i:04d}_dup", f"c{(i + 1) % 20:06d}", mt, f"{mt}/fake", payload, {"src": "synth"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
