"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, flowing through
Arrow-batched ``mapInPandas`` stages. The container has no image/audio codecs, so
the decode kernels are STUBBED: ``decode=fake`` derives deterministic pseudo
features from the payload bytes (stable => testable plumbing), ``decode=real``
raises NotImplementedError at the first batch. Everything Spark-side -- schemas,
repartitioning, UDF signatures, Arrow batch shapes -- is real and tested; swapping
in a real codec is a one-function change inside the kernel.

Scale notes: media rows are wide (payload-dominated). Feature extraction maps
batch->batch with no shuffle; frame sampling explodes rows but projects the
payload away first where possible; ``repartition`` before the UDF controls batch
memory (payload_bytes x rows_per_batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_ref string, kind string, feat array<float>, mean_luma double, payload_bytes long"
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a pixel decode: stable features from bytes."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    a = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(a.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_image_features(
    df: DataFrame, decode: str = "fake", dim: int = 8, rows_per_batch_hint: int | None = None
) -> DataFrame:
    """media table -> feature rows, one mapInPandas stage (batch in, batch out).

    decode='real' is the integration point for an actual codec (PIL/ffmpeg) and
    raises NotImplementedError here; decode='fake' produces deterministic
    byte-derived features so the distributed plumbing is fully exercised.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires an image/audio codec, not present "
                    "in this environment; use decode='fake' or plug a codec here"
                )
            feats = [_fake_decode(p, dim) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": b["media_ref"],
                    "kind": b["kind"],
                    "feat": feats,
                    "mean_luma": [float(f.mean()) for f in feats],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in b["payload"]
                    ],
                }
            )

    src = df
    if rows_per_batch_hint:
        src = src.repartition(
            max(1, df.sparkSession.sparkContext.defaultParallelism)
        )
    return src.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp. The frame
    timestamps come from meta.duration_ms (pure exprs, exploded JVM-side); the
    per-frame decode is the stubbed kernel."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_ref",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode == "real":
                raise NotImplementedError("real frame decode: plug ffmpeg here")
            feats = [
                _fake_decode(
                    (p if p is not None else b"") + int(ts).to_bytes(4, "little"), 4
                )
                for p, ts in zip(b["payload"], b["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": b["media_ref"],
                    "frame_ts_ms": b["frame_ts_ms"],
                    "frame_feat": feats,
                }
            )

    return frames.mapInPandas(
        kernel, "media_ref string, frame_ts_ms long, frame_feat array<float>"
    )


RESIZED_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)


def resize_images(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """Image resize stage: same media schema out, payload replaced by the
    resized encoding and meta.width/height updated. The fake kernel emits a
    deterministic byte-mapped payload of size width*height//64 (stable across
    runs => the downstream plumbing -- schema, partitioning, re-validation --
    is fully testable); decode='real' is the PIL/libvips integration point."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image resize requires a codec (PIL/libvips); plug here"
                )
            out_len = max(width * height // 64, 1)
            payloads = []
            for p in b["payload"]:
                src = np.frombuffer(p if p else b"\x00", dtype=np.uint8)
                idx = (np.arange(out_len) * max(len(src), 1) // out_len) % max(
                    len(src), 1
                )
                payloads.append(src[idx].tobytes())
            meta = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": (m["duration_ms"] if m is not None else 0),
                    "codec": "fake-resized",
                }
                for m in b["meta"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": b["media_ref"],
                    "kind": b["kind"],
                    "payload": payloads,
                    "meta": meta,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(kernel, RESIZED_SCHEMA)


def fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + (i % 5) * 32)
        rows.append(
            (
                "media://%s/%010d" % (kind, i),
                kind,
                bytearray(payload),
                (64, 48, 5000 if kind == "video" else 0, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
