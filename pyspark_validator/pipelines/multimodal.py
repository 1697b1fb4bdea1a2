"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, flowing through
Arrow-batched ``mapInPandas`` stages. Decode modes:

  * ``decode='fake'``  -- deterministic pseudo features from the payload bytes
    (stable => the distributed plumbing is testable without any codec);
  * ``decode='real'``  -- a genuine dependency-free codec layer: binary PPM/PGM
    images (P6/P5 headers + raw pixels, numpy), PCM WAV audio (stdlib
    ``wave``), and uncompressed YUV4MPEG2 video (luma-plane frame decode +
    fps-indexed frame sampling). Compressed formats (JPEG/PNG/MP4/...) raise
    NotImplementedError with the format name -- those need PIL/ffmpeg, absent
    in this container; plugging them in is one branch inside ``_real_decode``.

Scale notes: media rows are wide (payload-dominated). Feature extraction maps
batch->batch with no shuffle; frame sampling explodes rows but projects the
payload away first where possible; ``repartition`` before the UDF controls batch
memory (payload_bytes x rows_per_batch).
"""

from __future__ import annotations

import io
import wave
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


# ---------------------------------------------------------------------------
# real codecs (dependency-free formats only)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> uint8 array (h, w, 3) or (h, w)."""
    if payload is None or payload[:2] not in (b"P6", b"P5"):
        raise NotImplementedError(
            f"not a binary PPM/PGM payload (magic {payload[:2]!r}); compressed "
            "image formats need PIL -- plug it into _real_decode"
        )
    # header: magic, width, height, maxval (whitespace/comment separated)
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6); (h, w) -> PGM (P5)."""
    h, w = arr.shape[:2]
    magic = b"P6" if arr.ndim == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_y4m(payload: bytes):
    """YUV4MPEG2 (.y4m) -> (frames as list of uint8 luma (h, w) arrays, fps).

    The one video container decodable without ffmpeg: an ASCII stream header
    (W<width> H<height> F<num>:<den> ...), then per-frame 'FRAME...\\n'
    markers followed by raw planar YUV. Only the luma plane is returned
    (features need brightness, not chroma); 4:2:0 / 4:2:2 / 4:4:4 supported.
    """
    if payload is None or not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            f"not a YUV4MPEG2 payload (magic {payload[:9]!r}); compressed "
            "video containers (mp4/webm) need ffmpeg"
        )
    nl = payload.index(b"\n")
    w = h = 0
    fps_num, fps_den = 25, 1
    subsampling = "420"
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fps_num, fps_den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            subsampling = val[:3].decode()
    if not w or not h:
        raise NotImplementedError("y4m header missing W/H")
    chroma_factor = {"420": 2, "422": 1, "444": 0}.get(subsampling)
    if chroma_factor is None:
        raise NotImplementedError(f"unsupported y4m chroma mode C{subsampling}")
    y_size = w * h
    c_size = {2: y_size // 4, 1: y_size // 2, 0: y_size}[chroma_factor]
    frames, pos = [], nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise NotImplementedError("corrupt y4m frame marker")
        pos = payload.index(b"\n", pos) + 1
        luma = np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=pos)
        frames.append(luma.reshape(h, w))
        pos += y_size + 2 * c_size
    return frames, fps_num / fps_den


def encode_y4m(frames, fps: int = 10) -> bytes:
    """uint8 luma (h, w) frames -> monochrome-stored 4:2:0 y4m (gray chroma)."""
    h, w = frames[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    for f in frames:
        out.append(b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma + chroma)
    return b"".join(out)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 mono samples in [-1, 1], framerate)."""
    try:
        with wave.open(io.BytesIO(payload)) as f:
            nch, sw, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
            raw = f.readframes(f.getnframes())
    except wave.Error as e:
        raise NotImplementedError(
            f"not a PCM WAV payload ({e}); compressed audio needs ffmpeg"
        ) from e
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    a = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        a = (a - 128.0) / 128.0
    else:
        a = a / float(1 << (8 * sw - 1))
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return a, rate


def _block_means(values: np.ndarray, dim: int) -> np.ndarray:
    chunks = np.array_split(values.astype(np.float64).ravel(), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def _real_decode(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Feature vector from a real decode: image -> luma block means / 255,
    audio -> per-chunk RMS. Unknown kinds/formats raise with the reason."""
    if kind == "image":
        px = decode_ppm(payload)
        luma = px.mean(axis=2) if px.ndim == 3 else px
        return _block_means(luma, dim) / np.float32(255.0)
    if kind == "audio":
        samples, _ = decode_wav(payload)
        chunks = np.array_split(samples, dim)
        return np.array(
            [np.sqrt((c**2).mean()) if len(c) else 0.0 for c in chunks],
            dtype=np.float32,
        )
    if kind == "video":
        frames, _ = decode_y4m(payload)  # first-frame luma features
        return _block_means(frames[0], dim) / np.float32(255.0)
    raise NotImplementedError(f"unknown media kind {kind!r}")


def extract_image_features(
    df: DataFrame, decode: str = "fake", dim: int = 8, rows_per_batch_hint: int | None = None
) -> DataFrame:
    """media table -> feature rows, one mapInPandas stage (batch in, batch out).

    decode='real' decodes binary PPM/PGM images and PCM WAV audio natively
    (see _real_decode; compressed formats raise with the missing codec named);
    decode='fake' produces deterministic byte-derived features so the
    distributed plumbing is exercised without any codec.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode == "real":
                feats = [
                    _real_decode(p, k, dim)
                    for p, k in zip(b["payload"], b["kind"])
                ]
            else:
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
                # real path: uncompressed YUV4MPEG2 (decode_y4m); each video's
                # frames decode ONCE per batch (rows for one media_ref arrive
                # exploded per timestamp). mp4/webm need ffmpeg and raise.
                cache: dict = {}
                feats = []
                for ref, p, ts in zip(
                    b["media_ref"], b["payload"], b["frame_ts_ms"]
                ):
                    if ref not in cache:
                        cache[ref] = decode_y4m(p)
                    frames, fps = cache[ref]
                    idx = min(int(int(ts) * fps / 1000.0), len(frames) - 1)
                    feats.append(
                        _block_means(frames[idx], 4) / np.float32(255.0)
                    )
            else:
                feats = [
                    _fake_decode(
                        (p if p is not None else b"")
                        + int(ts).to_bytes(4, "little"),
                        4,
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
    resized encoding and meta.width/height updated. decode='real' does a true
    nearest-neighbor resize of binary PPM/PGM payloads (decode_ppm -> index
    grid -> encode_ppm); the fake kernel emits a deterministic byte-mapped
    payload of size width*height//64 (stable across runs => the downstream
    plumbing -- schema, partitioning, re-validation -- is testable without a
    codec)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            if decode == "real":
                for p in b["payload"]:
                    px = decode_ppm(p)
                    ys = (np.arange(height) * px.shape[0]) // height
                    xs = (np.arange(width) * px.shape[1]) // width
                    payloads.append(encode_ppm(px[np.ix_(ys, xs)]))
                codec = "ppm"
            else:
                out_len = max(width * height // 64, 1)
                for p in b["payload"]:
                    src = np.frombuffer(p if p else b"\x00", dtype=np.uint8)
                    idx = (np.arange(out_len) * max(len(src), 1) // out_len) % max(
                        len(src), 1
                    )
                    payloads.append(src[idx].tobytes())
                codec = "fake-resized"
            meta = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": (m["duration_ms"] if m is not None else 0),
                    "codec": codec,
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


def real_media_table(spark, n: int = 24) -> DataFrame:
    """Deterministic media table with REAL payloads: P6 PPM gradient images
    (16x8), 8 kHz int16 PCM WAV sine bursts, and 10 fps YUV4MPEG2 clips with
    per-frame constant luma = 10*frame_index -- for exercising every
    decode='real' path end to end with no external codec."""
    rows = []
    for i in range(n):
        if i % 3 == 2:
            nframes, w, h = 5, 8, 6
            frames = [
                np.full((h, w), 10 * f, dtype=np.uint8) for f in range(nframes)
            ]
            rows.append(
                ("media://video/%06d" % i, "video",
                 bytearray(encode_y4m(frames, fps=10)),
                 (w, h, nframes * 100, "y4m")))
        elif i % 2 == 0:
            w, h = 16, 8
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [(x * 16 + i) % 256, (y * 32) % 256, np.full((h, w), i % 256)],
                axis=2,
            ).astype(np.uint8)
            rows.append(
                ("media://image/%06d" % i, "image", bytearray(encode_ppm(px)),
                 (w, h, 0, "ppm"))
            )
        else:
            rate, amp = 8000, 0.25 + 0.05 * (i % 5)
            t = np.arange(rate // 10) / rate  # 100 ms burst
            samples = (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(rate)
                f.writeframes(samples.tobytes())
            rows.append(
                ("media://audio/%06d" % i, "audio", bytearray(buf.getvalue()),
                 (0, 0, 100, "pcm_s16le"))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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


# ---------------------------------------------------------------------------
# media payload conformance: the validation-tier face of the codec layer

MEDIA_CONFORMANCE_SCHEMA = (
    "media_ref string, kind string, decode_ok boolean, meta_ok boolean, "
    "reason string"
)


def media_conformance_flags(
    df: DataFrame,
    decode: str = "real",
    duration_tol_ms: int = 1,
    rows_per_batch_hint: int | None = None,
) -> DataFrame:
    """Row-level conformance of media payloads against their typed metadata.

    For each (media_ref, kind, payload, meta) row: does the payload decode
    with the engine's codec for its kind, and do the decoded dimensions /
    duration agree with the declared meta? Runs as one Arrow-batched
    mapInPandas stage (payloads never leave the executor); emits only the
    tiny flag columns. ``decode='fake'`` validates plumbing only (payload
    present); unsupported compressed formats surface as
    ``undecodable: NotImplementedError(...)`` rows rather than failing the
    job -- a mixed-format lake degrades per row, not per run."""
    cols = df.select(
        "media_ref", "kind", "payload",
        F.col("meta.width").alias("w"), F.col("meta.height").alias("h"),
        F.col("meta.duration_ms").alias("dur"),
    )
    if rows_per_batch_hint:
        cols = cols.repartition(rows_per_batch_hint)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                decode_ok, meta_ok, reason = True, True, None
                payload = bytes(r.payload) if r.payload is not None else b""
                try:
                    if decode == "fake":
                        if not payload:
                            raise ValueError("empty payload")
                    elif r.kind == "image":
                        px = decode_ppm(payload)
                        hh, ww = px.shape[0], px.shape[1]
                        if (r.w, r.h) != (ww, hh):
                            meta_ok = False
                            reason = f"meta_mismatch: {ww}x{hh} != declared {r.w}x{r.h}"
                    elif r.kind == "audio":
                        samples, rate = decode_wav(payload)
                        dur = int(round(len(samples) / rate * 1000))
                        if abs(dur - int(r.dur)) > duration_tol_ms:
                            meta_ok = False
                            reason = f"meta_mismatch: {dur}ms != declared {r.dur}ms"
                    elif r.kind == "video":
                        frames, fps = decode_y4m(payload)
                        hh, ww = frames[0].shape
                        dur = int(round(len(frames) / fps * 1000))
                        if (r.w, r.h) != (ww, hh):
                            meta_ok = False
                            reason = f"meta_mismatch: {ww}x{hh} != declared {r.w}x{r.h}"
                        elif abs(dur - int(r.dur)) > duration_tol_ms:
                            meta_ok = False
                            reason = f"meta_mismatch: {dur}ms != declared {r.dur}ms"
                    else:
                        raise NotImplementedError(f"unknown media kind {r.kind!r}")
                except Exception as e:  # undecodable payload, per-row verdict
                    decode_ok, meta_ok = False, False
                    reason = f"undecodable: {type(e).__name__}: {e}"
                out.append(
                    {
                        "media_ref": r.media_ref,
                        "kind": r.kind,
                        "decode_ok": decode_ok,
                        "meta_ok": meta_ok,
                        "reason": reason,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, MEDIA_CONFORMANCE_SCHEMA)


def media_conformance_check(
    df: DataFrame,
    decode: str = "real",
    num_partitions: int = 64,
    duration_tol_ms: int = 1,
) -> DataFrame:
    """Per-partition media-conformance verdicts (north-rule shape):
    pmod(xxhash64(media_ref), P) partition ids, counts of undecodable and
    meta-mismatched payloads, holds iff both are zero. Violation rows come
    from ``media_conformance_flags(...).where(~decode_ok | ~meta_ok)``."""
    from pyspark_validator.canonical import partition_id_expr

    flags = media_conformance_flags(
        df, decode=decode, duration_tol_ms=duration_tol_ms
    )
    return (
        flags.withColumn(
            "partition_id", partition_id_expr("media_ref", num_partitions)
        )
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum((~F.col("decode_ok")).cast("long")).alias("n_undecodable"),
            F.sum(
                (F.col("decode_ok") & ~F.col("meta_ok")).cast("long")
            ).alias("n_meta_mismatch"),
        )
        .select(
            "partition_id",
            ((F.col("n_undecodable") == 0) & (F.col("n_meta_mismatch") == 0)).alias(
                "holds"
            ),
            "n_media",
            "n_undecodable",
            "n_meta_mismatch",
        )
    )
