"""Multimodal column plumbing (driver mandate).

Images/audio/video travel as opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, partitioning,
Arrow-batched UDF signatures, batch shapes — is real and tested; the
actual codec calls are stubbed behind ``DecodeUnavailable`` (no
image/audio libraries in this container) with a deterministic fake
decoder used by tests, clearly marked.

Design for 100 TB: media bytes stay in their own column so Parquet
column pruning skips them unless the UDF needs them; rows are
re-partitioned by size-bucket before decode so one 4 GB video doesn't
straggle a task that otherwise holds thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, n_bytes long, "
    "width int, height int, duration_ms int, payload binary"
)

FEATURE_DDL = "media_id long, kind string, feat array<float>, decode_ok boolean"


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libraries are not present
    in this environment. Tests use ``fake_decode`` instead."""


def real_decode(payload: bytes, mime: str):  # pragma: no cover - stub
    raise DecodeUnavailable(
        f"no codec for {mime}: install pillow/av/soundfile on the cluster image"
    )


def fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: derives a fixed-length feature
    from the payload bytes (stable across runs/partitions)."""
    arr = np.frombuffer(payload[:256].ljust(256, b"\x00"), dtype=np.uint8)
    return (arr.reshape(8, 32).mean(axis=1) / 255.0).astype(np.float32)


def extract_features(
    media: DataFrame, decode=fake_decode, batch_limit_bytes: int = 64 << 20
) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    The iterator form lets one task process many small Arrow batches
    without materializing all payloads at once (bounded memory per
    batch — the multimodal analog of maxRecordsPerBatch).
    """

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ok = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                try:
                    feats.append(decode(bytes(payload), mime).tolist())
                    ok.append(True)
                except DecodeUnavailable:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    # size-bucketed repartition: co-locate similar payload sizes so task
    # runtimes stay uniform (stragglers are the multimodal skew mode)
    bucketed = media.withColumn(
        "__size_bucket", (F.log2(F.col("n_bytes") + 1)).cast("int")
    ).repartition("__size_bucket")
    return bucketed.mapInPandas(_run, schema=FEATURE_DDL)


RESIZED_DDL = "media_id long, width int, height int, payload binary, decode_ok boolean"
FRAMES_DDL = "media_id long, frame_idx int, ts_ms int, frame binary, decode_ok boolean"


def fake_resize(payload: bytes, mime: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: derives a
    byte payload of the target raster size from the source bytes (stable
    across runs/partitions). The real path plugs in pillow."""
    src = np.frombuffer(payload[:4096].ljust(4096, b"\x00"), dtype=np.uint8)
    n = max(1, min(width * height * 3, 1 << 20))
    idx = (np.arange(n, dtype=np.int64) * 2654435761) % len(src)
    return src[idx].tobytes()


def resize_images(
    media: DataFrame, width: int, height: int, resize=fake_resize
) -> DataFrame:
    """Batch image resize over media rows (driver mandate): iterator
    mapInPandas so payload memory stays bounded per Arrow batch;
    size-bucketed repartition keeps task runtimes uniform. Non-image
    rows are dropped column-pruned at the scan (kind filter pushes
    down before the binary column is read)."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload, ok = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                try:
                    out_payload.append(resize(bytes(payload), mime, width, height))
                    ok.append(True)
                except DecodeUnavailable:
                    out_payload.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "payload": out_payload,
                    "decode_ok": ok,
                }
            )

    bucketed = (
        media.filter(F.col("kind") == "image")
        .withColumn("__size_bucket", (F.log2(F.col("n_bytes") + 1)).cast("int"))
        .repartition("__size_bucket")
    )
    return bucketed.mapInPandas(_run, schema=RESIZED_DDL)


def fake_extract_frame(payload: bytes, frame_idx: int) -> bytes:
    """Deterministic stand-in frame extraction (stable per
    (payload, frame_idx))."""
    src = np.frombuffer(payload[:1024].ljust(1024, b"\x00"), dtype=np.uint8)
    return np.roll(src, frame_idx * 17).tobytes()


def sample_frames(
    media: DataFrame, every_ms: int = 1000, extract=fake_extract_frame
) -> DataFrame:
    """Frame sampling over video rows (driver mandate): the frame GRID
    (frame_idx, ts_ms) is computed JVM-side with sequence+explode — so
    Catalyst knows the output cardinality and the shuffle key — and only
    the per-frame byte extraction crosses into Python, one Arrow batch
    at a time."""
    grid = (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .withColumn("frame_idx", (F.col("ts_ms") / every_ms).cast("int"))
        .select("media_id", "frame_idx", "ts_ms", "payload")
    )

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames, ok = [], []
            for payload, idx in zip(pdf["payload"], pdf["frame_idx"]):
                try:
                    frames.append(extract(bytes(payload), int(idx)))
                    ok.append(True)
                except DecodeUnavailable:
                    frames.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "ts_ms": pdf["ts_ms"].astype("int32"),
                    "frame": frames,
                    "decode_ok": ok,
                }
            )

    return grid.mapInPandas(_run, schema=FRAMES_DDL)


def media_fixture_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (i, kind, mime, size, 64 if kind == "image" else None,
             64 if kind == "image" else None,
             1000 if kind != "image" else None, payload)
        )
    return rows
