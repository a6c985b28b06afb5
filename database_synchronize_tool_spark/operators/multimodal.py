"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (north-star surface; absent from the reference, which moves
opaque objects only via GCS server-side copy, ``gcs_sync.py:50-62``).

Design for 100 TB of media:

- payloads are **opaque bytes + typed metadata columns** — Spark never
  interprets them except inside explicit decode/feature stages, so scans,
  joins and dedup (by ``content_hash``) stay columnar and codegen'd;
- decode / feature-extract / resize / frame-sample run as **mapInPandas**
  stages: Arrow-batched, partition-parallel, schema declared up front. The
  batch shape (iterator of pandas DataFrames) is the real contract a cluster
  executes; per-partition batching means a 1000-executor job decodes in
  parallel with zero driver involvement;
- the *actual* codec call is isolated in ``_decode_payload`` and STUBBED: the
  real image/audio libraries are not in this container, so decoding uses a
  clearly-marked deterministic fake (seeded by the payload hash). Swapping in
  PIL/ffmpeg touches only that one function — every schema, UDF signature,
  and partition contract around it is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table

# Typed metadata schema for a media table (payload + sidecar columns).
MEDIA_SCHEMA = (
    "media_id bigint, mime string, payload binary, width int, height int, "
    "duration_ms bigint"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = "media_id bigint, mime string, features array<double>"
RESIZE_SCHEMA = (
    "media_id bigint, mime string, out_width int, out_height int, "
    "content_hash string"
)
FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame_off_ms bigint"

MIMES = ("image/png", "audio/wav", "video/mp4")


def synth_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: the text bytes
    stand in for an encoded payload; metadata columns are integer functions
    of doc_id so every engine (and the DuckDB oracle) can re-derive them."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(m) for m in MIMES]), (F.col("doc_id") % 3 + 1).cast("int")).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 9000 + 1000).cast("bigint").alias("duration_ms"),
    )


def _decode_payload(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — deterministic fake in place of a real codec.

    A real deployment replaces this body with e.g.::

        from PIL import Image; return np.asarray(Image.open(io.BytesIO(payload)))

    The container ships no media libraries, so instead the payload's sha256
    seeds a PRNG that fills the declared (height, width, 3) shape — the
    downstream plumbing (shapes, batching, schema) is exercised for real.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _feature_vector(payload, width, height) -> list[float] | None:
    """Shared decode → channel-stat feature math for BOTH batch APIs
    (round-7 review: the block was copy-pasted between the pandas and
    arrow paths, so a feature change could silently break their tested
    equivalence). NULL payload or NULL dimensions yield a NULL feature
    row — a malformed media row must not kill the whole job inside the
    executor loop."""
    if payload is None or width is None or height is None:
        return None
    arr = _decode_payload(bytes(payload), int(width), int(height))
    flat = arr.reshape(-1, 3).astype(np.float64)
    return np.concatenate(
        [
            flat.mean(axis=0) / 255.0,
            flat.std(axis=0) / 255.0,
            [arr.shape[0] / 4096.0, arr.shape[1] / 4096.0],
        ]
    ).tolist()


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item FEATURE_DIM-vector via mapInPandas (Arrow batches, one
    decode per row, partition-parallel). Features here are channel/byte
    statistics of the decoded array — the shape a real embedding model
    would fill."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _feature_vector(payload, w, h)
                for payload, w, h in zip(
                    pdf["payload"], pdf["width"], pdf["height"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Resize stage: decode → (stub) resample to (out_height, out_width) →
    re-hash. Nearest-neighbor index math is real; only the pixel source is
    the stub decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if payload is None or w is None or h is None:
                    hashes.append(None)  # malformed row -> NULL, not a crash
                    continue
                arr = _decode_payload(bytes(payload), int(w), int(h))
                ys = (np.arange(out_height) * arr.shape[0] // out_height).clip(0, arr.shape[0] - 1)
                xs = (np.arange(out_width) * arr.shape[1] // out_width).clip(0, arr.shape[1] - 1)
                resized = arr[ys][:, xs]
                hashes.append(hashlib.sha256(resized.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "content_hash": hashes,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (mapInPandas emitting MORE rows than it receives — the expanding-batch
    contract). Offsets are evenly spaced integer math over duration_ms, so
    the result has an exact SQL oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["mime"] == "video/mp4"]
            if vids.empty:
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "frame_off_ms": []}
                ).astype({"media_id": "int64", "frame_idx": "int32", "frame_off_ms": "int64"})
                continue
            ids = np.repeat(vids["media_id"].to_numpy(), n_frames)
            idx = np.tile(np.arange(n_frames, dtype=np.int32), len(vids))
            dur = np.repeat(vids["duration_ms"].to_numpy(), n_frames)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idx,
                    "frame_off_ms": dur * idx // n_frames,
                }
            )

    return media.mapInPandas(batches, FRAMES_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of ``extract_features``: consumes/produces raw
    ``pyarrow.RecordBatch`` streams (no pandas materialization — the
    lowest-overhead batch API for wide binary columns, since payload bytes
    stay in Arrow buffers end to end). Feature math is identical; the
    equivalence is tested."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            ids = batch.column("media_id")
            mimes = batch.column("mime")
            payloads = batch.column("payload")
            widths = batch.column("width")
            heights = batch.column("height")
            feats = [
                _feature_vector(
                    payloads[i].as_py(), widths[i].as_py(), heights[i].as_py()
                )
                for i in range(batch.num_rows)
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, mimes, pa.array(feats, type=pa.list_(pa.float64()))],
                names=["media_id", "mime", "features"],
            )

    return media.mapInArrow(batches, FEATURES_SCHEMA)
