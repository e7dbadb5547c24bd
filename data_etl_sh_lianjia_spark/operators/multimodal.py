"""Multimodal (binary) columns — SURVEY.md §2.9 L5 + the driver's multimodal
mandate: treat image/audio/video as opaque BINARY columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``.

Decode comes in three tiers:

- **Real decode for codec-free formats**: 24-bit BMP images and RIFF/WAVE
  PCM16 audio parse with pure struct+numpy — `multimodal_bmp_decode`,
  `multimodal_bmp_resize` (decode → nearest-neighbor downsample →
  re-encode, md5-matched), `multimodal_wav_decode`. Their fixtures carry
  generation-time ground truth, so the driver hash gate verifies the
  decoders end-to-end.
- ``decode="fake"`` produces a deterministic feature vector from the raw
  bytes (full Spark plumbing — schema, batching, partitioning, UDF
  signature — exercised without any codec).
- ``decode="real"`` in :func:`extract_features` raises NotImplementedError
  at the exact seam where a compressed-format codec (PIL/ffmpeg for
  JPEG/PNG/MP4) would plug in — those libraries are absent from this
  container.

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
    # The media blob is encode(text, 'UTF-8') of an all-ASCII corpus
    # (max codepoint 121 across every test SF), so byte k == character k
    # and DuckDB can re-derive the subsampled payload and its md5 from
    # first principles — a full differential check of the binary path
    # (encode -> Arrow -> numpy slice -> digest), not just row counts.
    oracle="""
SELECT doc_id AS media_id,
       length(text) AS orig_len,
       CAST(ceil(length(text) / 2.0) AS BIGINT) AS resized_len,
       md5(array_to_string(
             list_transform(range(1, length(text) + 1, 2), i -> text[i]),
             '')) AS resized_md5
FROM documents
""",
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
    # ASCII corpus: int8 reinterpretation == code points, and every sum
    # below is a sum of small integers — exact in float64 regardless of
    # accumulation order, so sqrt/divide/round are bit-identical across
    # numpy and DuckDB.
    # Quantization is floor(x*1e6 + 0.5)/1e6 SPELLED THE SAME in both
    # engines: Python round() is half-even, DuckDB round() half-away, and
    # rms values land on exact 6-decimal ties often enough (6 rows at
    # sf0.1) that the formulas must match operation-for-operation.
    oracle="""
WITH cp AS (
  SELECT doc_id, length(text) AS n,
         list_transform(string_split(text, ''), c -> unicode(c)) AS cps
  FROM documents
)
SELECT doc_id AS media_id,
       floor(sqrt(CAST(list_sum(list_transform(cps, x -> x * x)) AS DOUBLE) / n)
             * 1000000 + 0.5) / 1000000 AS rms,
       CAST(list_max(cps) AS DOUBLE) AS peak,
       floor(CAST(list_sum(cps) AS DOUBLE) / n * 1000000 + 0.5) / 1000000
         AS dc_offset
FROM cp
""",
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
                # floor(x*1e6+0.5)/1e6, not round(): matches the oracle's
                # quantization op-for-op (Python round is half-even)
                rms.append(
                    float(np.floor(np.sqrt(np.mean(s * s)) * 1e6 + 0.5) / 1e6)
                )
                peak.append(float(np.max(np.abs(s))))
                dc.append(float(np.floor(np.mean(s) * 1e6 + 0.5) / 1e6))
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
    # First-8-bytes unit vector re-derived from code points: the L2 norm is
    # sqrt of an exact integer sum, each component divide/square is one IEEE
    # op, and the norm2 fold runs left-to-right in both engines (Spark
    # F.aggregate == DuckDB list_reduce), so round(.,6) hash-matches.
    oracle="""
WITH v AS (
  SELECT doc_id,
         list_transform(range(1, least(8, length(text)) + 1),
                        i -> unicode(text[i])) AS raw
  FROM documents
), n AS (
  SELECT doc_id, raw,
         sqrt(CAST(list_sum(list_transform(raw, x -> x * x)) AS DOUBLE)) AS nrm
  FROM v
)
SELECT doc_id AS media_id,
       round(raw[1] / nrm, 6) AS f1,
       round(list_reduce(
               list_transform(raw, x -> (x / nrm) * (x / nrm)),
               (a, b) -> a + b), 6) AS norm2
FROM n
""",
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


# ---------------------------------------------------------------------------
# REAL decode: BMP images and WAV PCM audio (formats decodable with pure
# numpy + struct — no external codec needed, so the no-codec container can
# still exercise a genuine decode -> transform -> encode path; JPEG/MP4 etc.
# remain behind the NotImplementedError seam above).
#
# The fixture stores generation-time GROUND-TRUTH columns next to the blob:
# the DuckDB oracle reads the truth, the Spark query decodes the bytes —
# so the driver's hash gate verifies the decoder end-to-end.
# ---------------------------------------------------------------------------

# Versioned dir: generation is skip-if-exists — bump the suffix whenever the
# generators/truth columns change, or a stale corpus silently survives.
# v3: + 60 PNG rows (zlib IDAT, all five row filters) next to BMP/WAV.
_MEDIA_FIXTURE_DIR = "/tmp/spark-graft-media-fixtures-v3"


def _encode_bmp(rgb: "np.ndarray") -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding). ``rgb`` is uint8 (h, w, 3) top-down RGB."""
    import struct

    h, w, _ = rgb.shape
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(rgb[y][:, ::-1].tobytes() + b"\x00" * pad)  # RGB -> BGR
    return header + info + b"".join(rows)


def _decode_bmp(buf: bytes) -> "np.ndarray":
    """Decode the subset written by _encode_bmp back to (h, w, 3) RGB."""
    import struct

    offset = struct.unpack_from("<I", buf, 10)[0]
    w = struct.unpack_from("<i", buf, 18)[0]
    h = struct.unpack_from("<i", buf, 22)[0]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    if bpp != 24 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, h={h})")
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    px = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


def _encode_wav(samples: "np.ndarray", rate: int) -> bytes:
    """Minimal RIFF/WAVE, PCM16 mono."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode_wav(buf: bytes) -> tuple["np.ndarray", int]:
    """Decode the subset written by _encode_wav -> (int16 samples, rate)."""
    import struct

    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a WAV"
    pos = 12
    rate, data = None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", buf, pos + 8)
            if fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=pos + 8)
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _encode_png(rgb: "np.ndarray") -> bytes:
    """Minimal 8-bit RGB (color type 2) PNG from first principles: stdlib
    zlib for the IDAT deflate stream + CRC32, no codec library. Rows cycle
    through ALL five filter types (None/Sub/Up/Average/Paeth) so a decoder
    must implement real un-filtering, not just inflate."""
    import struct
    import zlib

    h, w, _ = rgb.shape
    bpp = 3

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prior = bytes(w * bpp)
    for y in range(h):
        row = rgb[y].tobytes()
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(len(row))
            )
        elif ft == 2:  # Up
            filt = bytes((row[x] - prior[x]) & 0xFF for x in range(len(row)))
        elif ft == 3:  # Average
            filt = bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prior[x]) >> 1))
                & 0xFF
                for x in range(len(row))
            )
        else:  # Paeth
            filt = bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prior[x],
                        prior[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(len(row))
            )
        raw += bytes([ft]) + filt
        prior = row
    idat = zlib.compress(bytes(raw), 9)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _decode_png(buf: bytes) -> "np.ndarray":
    """Decode 8-bit RGB non-interlaced PNG -> (h, w, 3) uint8: chunk walk,
    zlib inflate, per-row un-filtering of all five PNG filter types."""
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", None, None
    while pos + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={ctype},"
                    f" interlace={inter})"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    bpp, stride = 3, w * 3
    out = bytearray()
    prior = bytes(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        cur = bytearray(stride)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            up = prior[x]
            upleft = prior[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + left
            elif ft == 2:
                v = line[x] + up
            elif ft == 3:
                v = line[x] + ((left + up) >> 1)
            elif ft == 4:
                v = line[x] + _paeth(left, up, upleft)
            else:
                raise ValueError(f"bad filter type {ft}")
            cur[x] = v & 0xFF
        out += cur
        prior = bytes(cur)
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)


def _round6(x: float) -> float:
    return float(np.round(x, 6))


def synthesize_media_fixtures(out_dir: str = _MEDIA_FIXTURE_DIR) -> str:
    """Deterministic real-format media corpus: 60 BMP images (structured
    pixel gradients) + 60 WAV clips (integer sinusoids), each row carrying
    the blob AND its generation-time ground truth (dimensions, channel
    means, rms/peak, resized-file md5). pyarrow-written at import, atomic
    publish — same contract as the lianjia/html fixtures."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(60):
        w, h = 8 + (i * 7) % 33, 6 + (i * 5) % 25
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        rgb = np.stack(
            [
                (x + y * 11 + 3 * i) % 256,
                (x * 7 + y * 2 + 2 * i) % 256,
                (x * 3 + y * 5 + i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        blob = _encode_bmp(rgb)
        small = rgb[::2, ::2]
        rows.append(
            {
                "media_id": i,
                "kind": "bmp",
                "media": blob,
                "t_width": w,
                "t_height": h,
                "t_mean_r": _round6(rgb[:, :, 0].astype(np.float64).mean()),
                "t_mean_g": _round6(rgb[:, :, 1].astype(np.float64).mean()),
                "t_mean_b": _round6(rgb[:, :, 2].astype(np.float64).mean()),
                "t_resized_w": small.shape[1],
                "t_resized_h": small.shape[0],
                "t_resized_md5": hashlib.md5(_encode_bmp(small)).hexdigest(),
                "t_rate": None,
                "t_n_samples": None,
                "t_rms": None,
                "t_peak": None,
            }
        )
    for i in range(60):
        # PNG twins of the BMP corpus: different pixel functions + sizes so
        # the two decoders can't accidentally share ground truth. The
        # encoder cycles all five PNG row filters, so decode means are only
        # right if un-filtering is right.
        w, h = 9 + (i * 11) % 37, 7 + (i * 3) % 21
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        rgb = np.stack(
            [
                (x * 13 + y * 4 + 5 * i) % 256,
                (x * 2 + y * 9 + 7 * i) % 256,
                (x * 6 + y * 6 + 11 * i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        small = rgb[::2, ::2]
        rows.append(
            {
                "media_id": 2000 + i,
                "kind": "png",
                "media": _encode_png(rgb),
                "t_width": w,
                "t_height": h,
                "t_mean_r": _round6(rgb[:, :, 0].astype(np.float64).mean()),
                "t_mean_g": _round6(rgb[:, :, 1].astype(np.float64).mean()),
                "t_mean_b": _round6(rgb[:, :, 2].astype(np.float64).mean()),
                "t_resized_w": small.shape[1],
                "t_resized_h": small.shape[0],
                "t_resized_md5": hashlib.md5(_encode_png(small)).hexdigest(),
                "t_rate": None,
                "t_n_samples": None,
                "t_rms": None,
                "t_peak": None,
            }
        )
    for i in range(60):
        rate = 8000 if i % 2 == 0 else 16000
        n = 500 + (i * 37) % 1500
        t = np.arange(n, dtype=np.float64)
        freq = 100.0 + 25.0 * (i % 8)
        samples = np.round(9000.0 * np.sin(2 * np.pi * freq * t / rate)).astype(
            np.int16
        )
        s = samples.astype(np.float64)
        rows.append(
            {
                "media_id": 1000 + i,
                "kind": "wav",
                "media": _encode_wav(samples, rate),
                "t_width": None,
                "t_height": None,
                "t_mean_r": None,
                "t_mean_g": None,
                "t_mean_b": None,
                "t_resized_w": None,
                "t_resized_h": None,
                "t_resized_md5": None,
                "t_rate": rate,
                "t_n_samples": n,
                "t_rms": _round6(float(np.sqrt(np.mean(s * s)))),
                "t_peak": float(np.max(np.abs(s))),
            }
        )
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("media", pa.binary()),
            ("t_width", pa.int64()),
            ("t_height", pa.int64()),
            ("t_mean_r", pa.float64()),
            ("t_mean_g", pa.float64()),
            ("t_mean_b", pa.float64()),
            ("t_resized_w", pa.int64()),
            ("t_resized_h", pa.int64()),
            ("t_resized_md5", pa.string()),
            ("t_rate", pa.int64()),
            ("t_n_samples", pa.int64()),
            ("t_rms", pa.float64()),
            ("t_peak", pa.float64()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


_MEDIA_FIXTURE_PATH = synthesize_media_fixtures()


@register(
    "multimodal_bmp_decode",
    # The oracle reads generation-time ground truth; the Spark side decodes
    # the actual BMP bytes — the hash gate verifies the decoder end-to-end.
    oracle=f"""
SELECT media_id,
       t_width AS width, t_height AS height,
       t_mean_r AS mean_r, t_mean_g AS mean_g, t_mean_b AS mean_b
FROM read_parquet('{_MEDIA_FIXTURE_PATH}')
WHERE kind = 'bmp'
""",
    survey_ref="L5",
    doc="REAL image decode: 24-bit BMP -> pixels -> per-channel means (pure numpy)",
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actual image decoding on the multimodal path (no codec library —
    24-bit BMP parses with struct + numpy): header fields, bottom-up padded
    pixel rows, BGR→RGB, per-channel means. Embarrassingly parallel
    mapInPandas over Arrow batches, exactly like a PIL/ffmpeg decode stage
    would run at 100 TB."""
    ensure_package_shipped(spark)
    media = spark.read.parquet(_MEDIA_FIXTURE_PATH).filter(
        F.col("kind") == "bmp"
    ).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: F401  (decoder helpers inline below)

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                buf = bytes(blob)
                offset = struct.unpack_from("<I", buf, 10)[0]
                w = struct.unpack_from("<i", buf, 18)[0]
                h = struct.unpack_from("<i", buf, 22)[0]
                pad = (4 - (w * 3) % 4) % 4
                stride = w * 3 + pad
                px = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
                rgb = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(float(np.round(rgb[:, :, 0].astype(np.float64).mean(), 6)))
                out["mean_g"].append(float(np.round(rgb[:, :, 1].astype(np.float64).mean(), 6)))
                out["mean_b"].append(float(np.round(rgb[:, :, 2].astype(np.float64).mean(), 6)))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "media_id long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


@register(
    "multimodal_bmp_resize",
    # Hash-verified decode -> transform -> encode round trip: the oracle's
    # md5 was computed at generation by the same nearest-neighbor downsample
    # + re-encode, so any decoder/encoder bit-slip fails the gate.
    oracle=f"""
SELECT media_id, t_resized_w AS width, t_resized_h AS height,
       t_resized_md5 AS resized_md5
FROM read_parquet('{_MEDIA_FIXTURE_PATH}')
WHERE kind = 'bmp'
""",
    survey_ref="L5",
    doc="REAL image resize: BMP decode -> 2x nearest-neighbor downsample -> re-encode, md5-matched",
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    media = spark.read.parquet(_MEDIA_FIXTURE_PATH).filter(
        F.col("kind") == "bmp"
    ).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def decode(buf):
            offset = struct.unpack_from("<I", buf, 10)[0]
            w = struct.unpack_from("<i", buf, 18)[0]
            h = struct.unpack_from("<i", buf, 22)[0]
            pad = (4 - (w * 3) % 4) % 4
            stride = w * 3 + pad
            px = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
            return px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]

        def encode(rgb):
            h, w, _ = rgb.shape
            pad = (4 - (w * 3) % 4) % 4
            stride = w * 3 + pad
            header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
            )
            rows = [
                rgb[y][:, ::-1].tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            ]
            return header + info + b"".join(rows)

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "resized_md5": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                small = decode(bytes(blob))[::2, ::2]
                out["media_id"].append(mid)
                out["height"].append(small.shape[0])
                out["width"].append(small.shape[1])
                out["resized_md5"].append(hashlib.md5(encode(small)).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn, "media_id long, width long, height long, resized_md5 string"
    )


@register(
    "multimodal_wav_decode",
    oracle=f"""
SELECT media_id, t_rate AS sample_rate, t_n_samples AS n_samples,
       t_n_samples * 1000000 // t_rate AS duration_us,
       t_rms AS rms, t_peak AS peak
FROM read_parquet('{_MEDIA_FIXTURE_PATH}')
WHERE kind = 'wav'
""",
    survey_ref="L5",
    doc="REAL audio decode: RIFF/WAVE PCM16 -> samples -> rate/duration/rms/peak",
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actual audio decoding (RIFF chunk walk, PCM16 samples via numpy):
    sample rate and duration (exact integer microseconds — float
    rounding at .5 ties differs between numpy banker's and SQL half-up)
    from the fmt/data chunks, RMS and peak from the real samples —
    ground-truth-matched through the driver hash gate."""
    ensure_package_shipped(spark)
    media = spark.read.parquet(_MEDIA_FIXTURE_PATH).filter(
        F.col("kind") == "wav"
    ).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [],
                   "duration_us": [], "rms": [], "peak": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                buf = bytes(blob)
                pos, rate, data = 12, None, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    size = struct.unpack_from("<I", buf, pos + 4)[0]
                    if cid == b"fmt ":
                        _fmt, _ch, rate = struct.unpack_from("<HHI", buf, pos + 8)
                    elif cid == b"data":
                        data = np.frombuffer(buf, dtype="<i2", count=size // 2,
                                             offset=pos + 8)
                    pos += 8 + size + (size % 2)
                s = data.astype(np.float64)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["duration_us"].append(len(s) * 1_000_000 // rate)
                out["rms"].append(float(np.round(np.sqrt(np.mean(s * s)), 6)))
                out["peak"].append(float(np.max(np.abs(s))))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "media_id long, sample_rate long, n_samples long,"
        " duration_us long, rms double, peak double",
    )


@register(
    "multimodal_png_decode",
    # Ground truth recorded at generation; the Spark side walks the PNG
    # chunks, inflates IDAT with stdlib zlib, and un-filters every row (the
    # encoder cycles all five PNG filter types), so the hash gate verifies
    # a REAL compressed-format decode end-to-end — no codec library.
    oracle=f"""
SELECT media_id,
       t_width AS width, t_height AS height,
       t_mean_r AS mean_r, t_mean_g AS mean_g, t_mean_b AS mean_b
FROM read_parquet('{_MEDIA_FIXTURE_PATH}')
WHERE kind = 'png'
""",
    survey_ref="L5",
    doc="REAL compressed-image decode: PNG (zlib inflate + un-filtering) -> per-channel means",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First compressed codec decoded from first principles (stdlib zlib +
    numpy): shrinks the NotImplementedError seam to formats whose reference
    codecs genuinely aren't in the container (JPEG/MP3/MP4). Same
    embarrassingly-parallel mapInPandas shape as the BMP/WAV decoders."""
    ensure_package_shipped(spark)
    media = spark.read.parquet(_MEDIA_FIXTURE_PATH).filter(
        F.col("kind") == "png"
    ).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolvable on workers via ensure_package_shipped's zip
        from data_etl_sh_lianjia_spark.operators.multimodal import _decode_png

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                rgb = _decode_png(bytes(blob))
                out["media_id"].append(mid)
                out["height"].append(rgb.shape[0])
                out["width"].append(rgb.shape[1])
                for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[name].append(
                        float(np.round(rgb[:, :, ch].astype(np.float64).mean(), 6))
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "media_id long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


@register(
    "multimodal_png_resize",
    # md5-matched decode -> downsample -> re-encode round trip: the re-encode
    # must reproduce the generation-time deflate stream bit-for-bit (fixed
    # zlib level 9 + the same filter cycle), so encoder AND decoder are both
    # pinned by the hash gate.
    oracle=f"""
SELECT media_id, t_resized_w AS width, t_resized_h AS height,
       t_resized_md5 AS resized_md5
FROM read_parquet('{_MEDIA_FIXTURE_PATH}')
WHERE kind = 'png'
""",
    survey_ref="L5",
    doc="REAL compressed-image resize: PNG decode -> 2x downsample -> re-encode, md5-matched",
)
def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    media = spark.read.parquet(_MEDIA_FIXTURE_PATH).filter(
        F.col("kind") == "png"
    ).select("media_id", "media")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from data_etl_sh_lianjia_spark.operators.multimodal import (
            _decode_png,
            _encode_png,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "resized_md5": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                small = _decode_png(bytes(blob))[::2, ::2]
                out["media_id"].append(mid)
                out["height"].append(small.shape[0])
                out["width"].append(small.shape[1])
                out["resized_md5"].append(
                    hashlib.md5(_encode_png(np.ascontiguousarray(small))).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn, "media_id long, width long, height long, resized_md5 string"
    )
