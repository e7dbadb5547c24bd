"""Multimodal plumbing tests: blob fixtures, stubbed decode, batch shapes."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.operators import multimodal as M


def test_media_table_schema(spark, sf_dir):
    media = M.media_table(spark, sf_dir)
    dtypes = dict(media.dtypes)
    assert dtypes["media"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<")
    row = media.first()
    assert isinstance(row["media"], (bytes, bytearray)) and len(row["media"]) > 0


def test_fake_decode_features_are_deterministic_unit_vectors(spark, sf_dir):
    media = M.media_table(spark, sf_dir).select("media_id", "media").limit(50)
    feats = M.extract_features(media, decode="fake")
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        v = np.array(r["feature"])
        assert v.shape == (M._FEATURE_DIM,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    again = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)  # deterministic


def test_real_decode_raises_at_the_codec_seam(spark, sf_dir):
    media = M.media_table(spark, sf_dir).select("media_id", "media").limit(2)
    with pytest.raises(Exception) as exc:
        M.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_feature_vector_matches_manual_computation(spark, sf_dir):
    media = M.media_table(spark, sf_dir).select("media_id", "media").limit(5)
    feats = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    for row in media.collect():
        raw = np.frombuffer(bytes(row["media"])[: M._FEATURE_DIM], dtype=np.uint8)
        v = np.zeros(M._FEATURE_DIM)
        v[: len(raw)] = raw
        v = v / np.linalg.norm(v)
        assert np.allclose(feats[row["media_id"]], v)
