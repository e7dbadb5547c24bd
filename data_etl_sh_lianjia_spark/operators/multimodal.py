"""Multimodal (binary) columns — SURVEY.md §2.9 L5 + the driver's multimodal
mandate: treat image/audio/video as opaque BINARY columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
two ways (both clearly marked): ``decode="fake"`` produces a deterministic
feature vector from the bytes (so the full Spark plumbing — schema,
batching, partitioning, UDF signature — is real and tested), and
``decode="real"`` raises NotImplementedError at the exact seam where a
codec (PIL/ffmpeg) would plug in.

Scale: blobs ride the columnar path (Parquet BINARY + Arrow); the decode
stage is an embarrassingly parallel mapInPandas over row batches, so
partition count controls codec parallelism. Frame sampling is pure column
algebra (substring on binary) and stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import ensure_package_shipped, load_tables

_FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture: an opaque-blob media table derived deterministically from the
    documents corpus (text bytes stand in for image bytes; at 100 TB this
    is `spark.read.parquet` over BINARY columns written by the ingest job)."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.col("lang").alias("source_lang"),
            F.col("n_chars").alias("declared_bytes"),
        ).alias("meta"),
    )


@register(
    "multimodal_blob_stats",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
    survey_ref="L5",
    doc="binary-column metadata scan: byte length + content hash (JVM-side)",
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select(
        "media_id",
        F.length("media").cast("bigint").alias("n_bytes"),
        F.md5("media").alias("content_md5"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
-- DuckDB cannot substring BLOBs, so the oracle derives each frame's length
-- arithmetically; the Spark side performs the actual binary slicing.
SELECT media_id, frame_idx,
       least(64, n_bytes - (frame_idx - 1) * 64) AS frame_len
FROM (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         unnest(generate_series(
           1, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS frame_idx
  FROM documents
)
WHERE frame_idx <= 4
""",
    survey_ref="L5,P1",
    doc="frame sampling: fixed-size binary chunks via substring + explode, first 4 frames",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling as pure column algebra: chunk the blob into
    64-byte 'frames' (explode) and keep the first 4 per media item."""
    media = media_table(spark, sf_dir)
    n_frames = F.ceil(F.length("media") / F.lit(64.0)).cast("bigint")
    return (
        media.select(
            "media_id",
            F.explode(F.sequence(F.lit(1), n_frames)).alias("frame_idx"),
            F.col("media"),
        )
        .filter(F.col("frame_idx") <= 4)
        .select(
            "media_id",
            "frame_idx",
            F.length(
                F.expr("substring(media, 1 + (frame_idx - 1) * 64, 64)")
            ).cast("bigint").alias("frame_len"),
        )
    )


def extract_features(
    media: DataFrame, decode: str = "fake", dim: int = _FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    ``decode="real"`` is the seam where an actual codec goes — it raises
    NotImplementedError per the no-codec container contract. ``"fake"``
    derives a deterministic unit vector from the first ``dim`` bytes so the
    batch shapes, schema, and downstream consumers are fully exercised.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "container; plug the real decoder in here"
                )
            feats = []
            for blob in pdf["media"]:
                raw = np.frombuffer(bytes(blob)[:dim], dtype=np.uint8)
                v = np.zeros(dim, dtype=np.float64)
                v[: len(raw)] = raw
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(fn, "media_id long, feature array<double>")


@register(
    "multimodal_resize",
    oracle=None,  # pandas-UDF byte-domain transform: tests/test_multimodal.py
    # re-derives the subsampled bytes driver-side and matches the digests
    survey_ref="L5",
    doc="stubbed resize: 2x byte-domain downsample via mapInPandas, digest-audited",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style resize at the Spark plumbing level: a real pipeline
    decodes, resamples pixels, re-encodes inside this exact mapInPandas
    seam; the no-codec stand-in keeps the byte domain (every 2nd byte —
    deterministic, shape-preserving for the plumbing) and emits the
    digest + lengths so correctness is auditable without a codec. Scale:
    identical to decode — embarrassingly parallel over Arrow batches,
    output blob rides the columnar path back."""
    ensure_package_shipped(spark)
    media = media_table(spark, sf_dir).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_len, digest = [], []
            for blob in pdf["media"]:
                resized = bytes(blob)[::2]
                out_len.append(len(resized))
                digest.append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_len": pdf["media"].map(len),
                    "resized_len": out_len,
                    "resized_md5": digest,
                }
            )

    return media.mapInPandas(
        fn, "media_id long, orig_len long, resized_len long, resized_md5 string"
    )


@register(
    "multimodal_waveform_stats",
    oracle=None,  # pandas-UDF numeric reinterpretation: tests/test_multimodal.py
    # recomputes rms/peak driver-side with numpy and compares exactly
    survey_ref="L5",
    doc="audio-style stats: bytes as int8 PCM -> rms/peak/dc via mapInPandas",
)
def multimodal_waveform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-analysis plumbing: reinterpret the blob as int8 PCM samples and
    compute RMS / peak / DC offset per clip in one vectorized numpy pass
    per Arrow batch. A real pipeline swaps the reinterpretation for an
    audio decoder at this seam; everything downstream (schema, batch
    shape, rounded float outputs) is the production path."""
    ensure_package_shipped(spark)
    media = media_table(spark, sf_dir).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, peak, dc = [], [], []
            for blob in pdf["media"]:
                s = np.frombuffer(bytes(blob), dtype=np.int8).astype(np.float64)
                if s.size == 0:
                    rms.append(0.0); peak.append(0.0); dc.append(0.0)
                    continue
                rms.append(round(float(np.sqrt(np.mean(s * s))), 6))
                peak.append(float(np.max(np.abs(s))))
                dc.append(round(float(np.mean(s)), 6))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rms": rms,
                    "peak": peak,
                    "dc_offset": dc,
                }
            )

    return media.mapInPandas(
        fn, "media_id long, rms double, peak double, dc_offset double"
    )


@register(
    "multimodal_features",
    oracle=None,  # pandas-UDF decode path: checked by tests/test_multimodal.py
    survey_ref="L5",
    doc="stubbed decode -> deterministic 8-dim feature vector via mapInPandas",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    media = media_table(spark, sf_dir).select("media_id", "media")
    feats = extract_features(media, decode="fake")
    return feats.select(
        "media_id",
        F.round(F.element_at("feature", 1), 6).alias("f1"),
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x), 6).alias(
            "norm2"
        ),
    )
