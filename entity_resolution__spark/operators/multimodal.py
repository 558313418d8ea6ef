"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched
`mapInPandas` stages. The decode kernels themselves are STUBBED (this
container has no image/audio libraries): `deterministic_fake=True`
derives byte-level pseudo-features from the payload hash so the
Spark-side plumbing — schema, batching, partition flow — is fully real
and testable; `deterministic_fake=False` raises NotImplementedError at
the decode call site, which is where a real libjpeg/ffmpeg kernel plugs
in on a production image.
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
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature: seeded by payload digest. Stands in
    for a real decode+embed kernel; same payload → same feature."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, bounded memory.

    Real-deployment note: batch size is controlled by
    spark.sql.execution.arrow.maxRecordsPerBatch; payloads never
    round-trip through the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container — plug a decode kernel in here"
                )
            feats = [
                _fake_decode(p if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media_id, frame_ts).

    The timestamp lattice is pure Catalyst (sequence + explode); only the
    per-frame pixel decode is stubbed. This is the real partition shape a
    frame sampler has at scale: rows explode ~duration/every_ms per video.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
