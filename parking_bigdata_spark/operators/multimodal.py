"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``
(SURVEY.md §2 B11).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are deterministic STUBS (clearly marked); everything
Spark-side — schema, batch iteration, partition sizing, UDF signatures —
is real and tested. Swapping a stub for a real decoder changes one
function body, not the pipeline.

Scale notes: binary payloads never shuffle here — `mapInPandas` is a
narrow transformation; repartition upstream by size class if payloads
are skewed. Metadata-only plans prune the binary column entirely
(columnar parquet), which is why payload and metadata live in separate
columns rather than one struct.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for a multimodal asset table: payload + typed metadata.
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("media_type", T.StringType(), True),  # e.g. image/png
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def _stub_decode_features(payload: bytes | None, modality: str) -> list[float]:
    """STUB decode: a real implementation would decode the media and
    extract features (resize+flatten / mel spectrogram / frame sample).
    Deterministic fake: 8 moments of the raw bytes, so tests are stable
    and the Arrow plumbing is exercised end-to-end."""
    if payload is None:
        return []
    b = payload[:4096]
    n = max(len(b), 1)
    return [
        float(len(payload)),
        sum(b) / n,
        float(max(b) if b else 0),
        float(min(b) if b else 0),
        float(b[0] if b else 0),
        float(b[-1] if b else 0),
        float(n % 251),
        1.0 if modality == "image" else 0.0,
    ]


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    Arrow-batched, streaming per partition (never materializes a whole
    partition of payloads in memory at once)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "feature": [
                    _stub_decode_features(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize kernel — STUB. Real impl: PIL decode → resize →
    re-encode inside the same mapInPandas shape as `extract_features`.
    Raises to make the missing dependency explicit rather than silent."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "see extract_features for the production mapInPandas shape")


def metadata_summary(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — demonstrates that plans touching only
    metadata columns prune the binary payload at the parquet scan."""
    return (df.groupBy("modality")
              .agg(F.count(F.lit(1)).alias("n_assets"),
                   F.sum(F.length("payload")).alias("total_bytes"),
                   F.avg("duration_s").alias("avg_duration_s")))
