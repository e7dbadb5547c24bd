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


def test_real_decode_raises_only_for_codec_needing_containers(spark, sf_dir):
    """The seam is now per-container: an MP4 blob (no in-repo codec) raises;
    decodable containers are covered by test_real_decode_features below."""
    mp4_magic = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    media = spark.createDataFrame(
        [(1, bytearray(mp4_magic))], "media_id long, media binary"
    )
    with pytest.raises(Exception) as exc:
        M.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_real_decode_features_match_ground_truth(spark, sf_dir):
    """extract_features(decode='real') must reproduce the fixture's
    generation-time truth for every container format it owns a codec for."""
    fixture = spark.read.parquet(M._MEDIA_FIXTURE_PATH)
    media = fixture.select("media_id", "media")
    feats = {
        r["media_id"]: (r["modality"], r["feature"])
        for r in M.extract_features(media, decode="real").collect()
    }
    assert len(feats) == fixture.count()
    for t in fixture.collect():
        modality, v = feats[t["media_id"]]
        assert len(v) == M._FEATURE_DIM
        if t["kind"] == "wav":
            assert modality == "audio"
            assert v[:4] == [
                float(t["t_rate"]),
                float(t["t_n_samples"]),
                t["t_rms"],
                t["t_peak"],
            ]
        else:
            assert modality == "image"
            assert v[:5] == [
                float(t["t_width"]),
                float(t["t_height"]),
                t["t_mean_r"],
                t["t_mean_g"],
                t["t_mean_b"],
            ]


def test_feature_vector_matches_manual_computation(spark, sf_dir):
    media = M.media_table(spark, sf_dir).select("media_id", "media").limit(5)
    feats = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    for row in media.collect():
        raw = np.frombuffer(bytes(row["media"])[: M._FEATURE_DIM], dtype=np.uint8)
        v = np.zeros(M._FEATURE_DIM)
        v[: len(raw)] = raw
        v = v / np.linalg.norm(v)
        assert np.allclose(feats[row["media_id"]], v)


def test_resize_digests_match_driver_side_recompute(spark, sf_dir):
    """The 2x byte-domain downsample must equal the same transform applied
    driver-side to the source text bytes (audits the UDF path end-to-end)."""
    import hashlib

    from data_etl_sh_lianjia_spark.plans.registry import all_queries
    from data_etl_sh_lianjia_spark.session import load_tables

    rows = {
        r["media_id"]: r
        for r in all_queries()["multimodal_resize"].spark_fn(spark, sf_dir).collect()
    }
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    for d in docs.limit(50).collect():
        raw = d["text"].encode("utf-8")
        resized = raw[::2]
        r = rows[d["doc_id"]]
        assert r["orig_len"] == len(raw)
        assert r["resized_len"] == len(resized)
        assert r["resized_md5"] == hashlib.md5(resized).hexdigest()


def test_waveform_stats_match_numpy_recompute(spark, sf_dir):
    import numpy as np

    from data_etl_sh_lianjia_spark.plans.registry import all_queries
    from data_etl_sh_lianjia_spark.session import load_tables

    rows = {
        r["media_id"]: r
        for r in all_queries()["multimodal_waveform_stats"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    for d in docs.limit(50).collect():
        s = np.frombuffer(d["text"].encode("utf-8"), dtype=np.int8).astype(np.float64)
        r = rows[d["doc_id"]]
        assert r["rms"] == float(np.floor(np.sqrt(np.mean(s * s)) * 1e6 + 0.5) / 1e6)
        assert r["peak"] == float(np.max(np.abs(s)))
        assert r["dc_offset"] == float(np.floor(np.mean(s) * 1e6 + 0.5) / 1e6)


def test_bmp_roundtrip_property():
    """encode->decode is the identity for arbitrary small RGB images
    (padding widths 0-3 all exercised)."""
    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_bmp,
        _encode_bmp,
    )

    rng = np.random.RandomState(11)
    for w in (1, 2, 3, 4, 5, 8, 17, 33):
        for h in (1, 2, 7, 19):
            rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = _decode_bmp(_encode_bmp(rgb))
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, rgb), (w, h)


def test_wav_roundtrip_property():
    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    rng = np.random.RandomState(13)
    for n in (1, 2, 33, 501, 2048):
        for rate in (8000, 16000, 44100):
            s = rng.randint(-32768, 32768, size=n).astype(np.int16)
            out, r = _decode_wav(_encode_wav(s, rate))
            assert r == rate and np.array_equal(out, s)


def test_png_codec_roundtrip_all_filters():
    """The first-principles PNG codec must round-trip arbitrary RGB data.
    The encoder cycles all five PNG row filters (None/Sub/Up/Average/Paeth),
    so a >=5-row image exercises every un-filter path in the decoder."""
    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (5, 3), (23, 31), (64, 7)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = _encode_png(rgb)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(_decode_png(blob), rgb), (h, w)


def test_png_decoder_rejects_unsupported_variants():
    import struct
    import zlib

    import pytest

    from data_etl_sh_lianjia_spark.operators.multimodal import _decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"BM" + b"\x00" * 40)
    # 16-bit depth header must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        _decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_jpeg_flat_block_roundtrip_is_bit_exact():
    """With all-ones quant tables, flat 8x8 blocks survive the full T.81
    pipeline exactly: decode == YCbCr round trip of the source. This is the
    contract the hash-gated fixtures rely on."""
    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
    )

    rng = np.random.RandomState(42)
    ones = np.ones((8, 8), dtype=np.int64)
    saw_stuffing = False
    for _ in range(6):
        bh, bw = rng.randint(2, 7), rng.randint(2, 7)
        h, w = bh * 8 - rng.randint(0, 8), bw * 8 - rng.randint(0, 8)
        blocks = rng.randint(0, 256, size=(bh, bw, 3)).astype(np.uint8)
        rgb = np.kron(blocks, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w]
        buf = _encode_jpeg(rgb, ones, ones)
        saw_stuffing = saw_stuffing or b"\xff\x00" in buf
        out = _decode_jpeg(buf)
        want = _ycbcr_to_rgb(_rgb_to_ycbcr(rgb))
        assert out.shape == want.shape
        assert (out == want).all(), "flat-block decode not bit-exact"
    assert saw_stuffing, (
        "no encoded stream exercised 0xFF byte stuffing — weak coverage"
    )


def test_jpeg_lossy_roundtrip_bounded_on_smooth_content():
    """Real Annex K quant tables on smooth gradients: decode must stay
    within normal JPEG loss (PSNR > 30 dB) — pins the DCT/quant path on
    multi-coefficient content the exactness contract doesn't cover."""
    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    rng = np.random.RandomState(7)
    for _ in range(3):
        h, w = rng.randint(17, 49), rng.randint(17, 49)
        x = np.linspace(0, 200, w)[None, :]
        y = np.linspace(0, 180, h)[:, None]
        rgb = np.clip(
            np.stack(
                [x + y * 0.3, 30 + x * 0.5 + y * 0.5, 200 - x * 0.7 + y * 0.1],
                axis=2,
            ),
            0,
            255,
        ).astype(np.uint8)
        out = _decode_jpeg(_encode_jpeg(rgb))
        assert out.shape == rgb.shape
        err = (out.astype(np.float64) - rgb.astype(np.float64)) ** 2
        psnr = 10 * np.log10(255.0**2 / max(err.mean(), 1e-12))
        assert psnr > 30.0, f"JPEG round trip degraded: PSNR {psnr:.1f} dB"


def test_jpeg_decoder_rejects_unsupported_variants():
    import struct

    import numpy as np
    import pytest

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    rgb = np.full((8, 8, 3), 100, dtype=np.uint8)
    buf = bytearray(_encode_jpeg(rgb))
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x00\x01" + bytes(buf[2:]))
    # flip SOF0 -> SOF2 (progressive)
    sof = bytes(buf).find(b"\xff\xc0")
    prog = bytes(buf[:sof]) + b"\xff\xc2" + bytes(buf[sof + 2:])
    with pytest.raises(ValueError, match="non-baseline"):
        _decode_jpeg(prog)
    # declare 2x2 luma subsampling in SOF
    sub = bytearray(buf)
    sub[sof + 11] = 0x22  # component 1 sampling byte
    with pytest.raises(ValueError, match="subsampling"):
        _decode_jpeg(bytes(sub))


def test_avi_mjpeg_mux_demux_roundtrip():
    """RIFF/AVI container grammar: frames (including ODD-length JPEG
    payloads, exercising word-alignment padding) round-trip bit-exactly,
    fps survives strh, and non-AVI input raises cleanly."""
    ones = np.ones((8, 8), dtype=np.int64)
    frames = [
        M._encode_jpeg(np.full((16, 24, 3), c, dtype=np.uint8), ones, ones)
        for c in (5, 77, 200, 254)
    ]
    avi = M._encode_avi_mjpeg(frames, 24, 16, 15)
    fps, out = M._demux_avi_mjpeg(avi)
    assert fps == 15
    assert [bytes(f) for f in out] == [bytes(f) for f in frames]

    # word-alignment: odd- and even-length payloads both round-trip (the
    # demuxer walks sizes, so a missing pad byte would desync every
    # following chunk)
    raw = [b"\xff\xd8odd", b"\xff\xd8even!", b"x"]
    fps2, out2 = M._demux_avi_mjpeg(M._encode_avi_mjpeg(raw, 4, 4, 10))
    assert fps2 == 10 and out2 == raw

    with pytest.raises(ValueError):
        M._demux_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        M._demux_avi_mjpeg(b"not a riff at all")


def test_avi_frame_extract_matches_ground_truth(spark, sf_dir):
    """The registered query end-to-end: demux + JPEG decode must equal the
    generation-time predicted decode for every sampled frame."""
    import pyarrow.parquet as pq

    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in M.multimodal_avi_frame_extract(spark, sf_dir).collect()
    }
    truth = pq.read_table(M._VIDEO_TRUTH_PATH).to_pylist()
    assert len(got) == len(truth) > 0
    for t in truth:
        r = got[(t["media_id"], t["frame_idx"])]
        for k in ("n_frames", "fps", "width", "height"):
            assert r[k] == t[k], (t["media_id"], t["frame_idx"], k)
        for k in ("mean_r", "mean_g", "mean_b"):
            assert abs(r[k] - t[k]) < 1e-9, (t["media_id"], k)


def test_extract_features_handles_avi_video_modality(spark):
    """extract_features(decode='real') sniffs RIFF/AVI and yields a video
    feature vector [n_frames, fps, first-frame channel means]."""
    ones = np.ones((8, 8), dtype=np.int64)
    frames = [
        M._encode_jpeg(np.full((8, 8, 3), c, dtype=np.uint8), ones, ones)
        for c in (10, 20)
    ]
    avi = M._encode_avi_mjpeg(frames, 8, 8, 30)
    media = spark.createDataFrame([(1, bytearray(avi))], "media_id long, media binary")
    row = M.extract_features(media, decode="real").collect()[0]
    assert row["modality"] == "video"
    assert row["feature"][0] == 2.0 and row["feature"][1] == 30.0


def test_gif_roundtrip_and_giflib_conformance():
    """The GIF codec round-trips bit-exactly across LZW width growth and
    dictionary resets — and, where the system giflib is present, the
    encoder's streams are decoded bit-identically by that INDEPENDENT
    reference implementation, pinning the in-repo codec to standard GIF
    rather than to its own mirror image."""
    import ctypes.util

    import numpy as np

    from data_etl_sh_lianjia_spark.operators.multimodal import (
        _decode_gif,
        _encode_gif,
    )

    rng = np.random.RandomState(7)
    blobs = []
    for trial in range(40):
        n_colors = rng.randint(2, 257)
        w, h = rng.randint(1, 64), rng.randint(1, 64)
        palette = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
        if trial % 3 == 0:
            idx = (np.add.outer(np.arange(h), np.arange(w)) % n_colors)
        elif trial % 3 == 1:
            idx = rng.randint(0, n_colors, size=(h, w))
        else:
            idx = np.tile(rng.randint(0, n_colors, size=(1, w)), (h, 1))
        idx = idx.astype(np.uint8)
        blob = _encode_gif(palette, idx)
        rgb = _decode_gif(blob)
        assert rgb.shape == (h, w, 3)
        assert np.array_equal(rgb, palette[idx]), f"trial {trial}"
        blobs.append((blob, idx))
    # >4096-entry stream: forces the 12-bit cap + clear/reset path
    big = np.zeros((200, 300), dtype=np.uint8)
    big[::2, :] = np.arange(300) % 7
    pal7 = np.arange(21, dtype=np.uint8).reshape(7, 3)
    assert np.array_equal(
        _decode_gif(_encode_gif(pal7, big)), pal7[big]
    )

    libname = ctypes.util.find_library("gif")
    if not libname:
        import pytest

        pytest.skip("system giflib not present: conformance leg skipped")
    import ctypes
    import tempfile

    lib = ctypes.CDLL(libname)

    class GifColorType(ctypes.Structure):
        _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                    ("Blue", ctypes.c_ubyte)]

    class ColorMapObject(ctypes.Structure):
        _fields_ = [("ColorCount", ctypes.c_int),
                    ("BitsPerPixel", ctypes.c_int),
                    ("SortFlag", ctypes.c_bool),
                    ("Colors", ctypes.POINTER(GifColorType))]

    class GifImageDesc(ctypes.Structure):
        _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                    ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                    ("Interlace", ctypes.c_bool),
                    ("ColorMap", ctypes.POINTER(ColorMapObject))]

    class SavedImage(ctypes.Structure):
        _fields_ = [("ImageDesc", GifImageDesc),
                    ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.c_void_p)]

    class GifFileType(ctypes.Structure):
        _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                    ("SColorResolution", ctypes.c_int),
                    ("SBackGroundColor", ctypes.c_int),
                    ("AspectByte", ctypes.c_ubyte),
                    ("SColorMap", ctypes.POINTER(ColorMapObject)),
                    ("ImageCount", ctypes.c_int), ("Image", GifImageDesc),
                    ("SavedImages", ctypes.POINTER(SavedImage)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.c_void_p),
                    ("Error", ctypes.c_int), ("UserData", ctypes.c_void_p),
                    ("Private", ctypes.c_void_p)]

    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    for blob, idx in blobs[:12]:
        with tempfile.NamedTemporaryFile(suffix=".gif") as fh:
            fh.write(blob)
            fh.flush()
            err = ctypes.c_int(0)
            gf = lib.DGifOpenFileName(fh.name.encode(), ctypes.byref(err))
            assert gf, f"giflib refused our stream (err={err.value})"
            assert lib.DGifSlurp(gf) == 1, (
                f"giflib slurp failed (Error={gf.contents.Error})"
            )
            img = gf.contents.SavedImages[0]
            ih, iw = img.ImageDesc.Height, img.ImageDesc.Width
            raster = np.ctypeslib.as_array(
                img.RasterBits, shape=(ih * iw,)
            ).reshape(ih, iw)
            assert np.array_equal(raster, idx), (
                "giflib decoded different pixel indices than encoded"
            )
