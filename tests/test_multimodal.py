"""Multimodal plumbing tests: schema contracts, Arrow batch shapes,
determinism of the stubbed decode seam, and the expanding-row frame sampler."""

from __future__ import annotations

import numpy as np

from database_synchronize_tool_spark.operators import multimodal as MM


def test_media_table_schema(spark, sf_dir):
    m = MM.synth_media_table(spark, sf_dir)
    assert [f.name for f in m.schema.fields] == [
        "media_id", "mime", "payload", "width", "height", "duration_ms",
    ]
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.orderBy("media_id").first()
    assert row["mime"] in MM.MIMES
    assert bytes(row["payload"])  # non-empty opaque bytes


def test_bmp_codec_round_trips_exactly():
    # the REAL codec (r11): encode->decode must reproduce every pixel for
    # arbitrary dims including stride-padding cases (w*3 % 4 != 0)
    for mid, w, h in [(0, 8, 8), (3, 9, 11), (123, 31, 23), (7, 10, 15)]:
        a = MM._rule_pixels(mid, w, h)
        b = MM._decode_payload(MM._encode_bmp(a))
        assert b is not None and b.dtype == np.uint8
        assert b.shape == (h, w, 3)
        assert (a == b).all(), (mid, w, h)


def test_decode_rejects_malformed_payloads():
    assert MM._decode_payload(b"not a bmp") is None
    assert MM._decode_payload(b"BM" + b"\x00" * 60) is None  # bad header
    good = MM._encode_bmp(MM._rule_pixels(1, 8, 8))
    assert MM._decode_payload(good[:40]) is None  # truncated pixels
    assert MM._decode_payload(good) is not None


def test_extract_features_shape_and_determinism(spark, sf_dir):
    m = MM.synth_image_table(spark, sf_dir).limit(20)
    f1 = MM.extract_features(m).orderBy("media_id").collect()
    f2 = MM.extract_features(m).orderBy("media_id").collect()
    assert len(f1) == 20
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in f1)
    assert [r["features"] for r in f1] == [r["features"] for r in f2]
    # channel means/stds are normalized into [0, 1]
    assert all(0.0 <= v <= 1.0 for r in f1 for v in r["features"][:6])
    # real pixel math: features equal the rule array's channel stats
    row = f1[0]
    arr = MM._rule_pixels(
        int(row["media_id"]),
        int(row["media_id"]) % MM.IMG_W_MOD + MM.IMG_W_MIN,
        int(row["media_id"]) % MM.IMG_H_MOD + MM.IMG_H_MIN,
    ).reshape(-1, 3)
    want_means = [
        float(arr[:, c].astype(np.float64).mean()) * (1.0 / 255.0)
        for c in range(3)
    ]
    assert row["features"][:3] == want_means


def test_resize_rehash_changes_with_target(spark, sf_dir):
    m = MM.synth_image_table(spark, sf_dir).limit(5)
    r32 = {r["media_id"]: r["content_hash"] for r in MM.resize_images(m, 32, 32).collect()}
    r64 = {r["media_id"]: r["content_hash"] for r in MM.resize_images(m, 64, 64).collect()}
    again = {r["media_id"]: r["content_hash"] for r in MM.resize_images(m, 32, 32).collect()}
    assert r32 == again  # deterministic
    assert all(r32[k] != r64[k] for k in r32)  # target size reaches the hash
    out = MM.resize_images(m, 32, 32).first()
    assert (out["out_width"], out["out_height"]) == (32, 32)


def test_sample_frames_expands_video_rows_only(spark, sf_dir):
    m = MM.synth_media_table(spark, sf_dir)
    n_videos = m.filter("mime = 'video/mp4'").count()
    frames = MM.sample_frames(m, n_frames=3)
    rows = frames.collect()
    assert len(rows) == 3 * n_videos  # one row per sampled frame, videos only
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    sample = by_id[next(iter(by_id))]
    assert sorted(r["frame_idx"] for r in sample) == [0, 1, 2]
    # evenly spaced offsets: off = duration * idx // n
    for r in rows:
        assert r["frame_off_ms"] >= 0
        if r["frame_idx"] == 0:
            assert r["frame_off_ms"] == 0


def test_map_in_arrow_equals_pandas_path(spark, sf_dir):
    """The mapInArrow and mapInPandas feature extractors must agree exactly
    (same decode, same math, different batch transports)."""
    m = MM.synth_image_table(spark, sf_dir).limit(25)
    via_pandas = {
        r["media_id"]: r["features"]
        for r in MM.extract_features(m).collect()
    }
    via_arrow = {
        r["media_id"]: r["features"]
        for r in MM.extract_features_arrow(m).collect()
    }
    assert via_pandas == via_arrow


def test_feature_and_resize_null_rows_become_null_not_crash(spark):
    # a malformed media row (NULL payload/dims) must yield NULL outputs,
    # not kill the executor task (round-7 review)
    from database_synchronize_tool_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    good = bytearray(MM._encode_bmp(MM._rule_pixels(2, 16, 16)))
    media = spark.createDataFrame(
        [
            (1, "image/bmp", None, None, None, None),
            (2, "image/bmp", good, 16, 16, None),
            (3, "image/bmp", bytearray(b"not a bmp"), 16, 16, None),
            (4, "image/bmp", good, 99, 16, None),  # metadata/header mismatch
        ],
        "media_id long, mime string, payload binary, width int, height int,"
        " duration_ms long",
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert feats[1] is None and feats[2] is not None
    assert feats[3] is None and feats[4] is None
    hashes = {
        r["media_id"]: r["content_hash"]
        for r in resize_images(media, 8, 8).collect()
    }
    assert hashes[1] is None and hashes[2] is not None and hashes[3] is None


def test_payload_dedup_rate_consistent_with_distinct_hashes(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import (
        _ahash_words,
        multimodal_payload_dedup_rate,
    )
    from database_synchronize_tool_spark.catalog import load_table

    rows = {r["lang"]: r for r in multimodal_payload_dedup_rate(spark, sf_dir).collect()}
    words = _ahash_words(load_table(spark, sf_dir, "documents")).toPandas()
    for lang, grp in words.groupby("lang"):
        r = rows[lang]
        assert r["n_payloads"] == len(grp)
        assert r["n_distinct_hashes"] == len(grp[["w0", "w1"]].drop_duplicates())
        assert 0.0 <= r["dup_rate"] < 1.0


def test_wav_codec_round_trips_exactly():
    # the REAL audio codec (r15): encode->decode must reproduce every
    # sample, including odd sample counts and the full int16 range
    for mid, n in [(0, 64), (3, 65), (12345, 121), (65535, 319)]:
        s = MM._rule_samples(mid, n)
        dec = MM._decode_wav(MM._encode_wav(s))
        assert dec is not None
        got, rate = dec
        assert rate == MM.AUD_RATE
        assert np.array_equal(got, s), (mid, n)


def test_wav_decode_rejects_malformed_payloads():
    good = MM._encode_wav(MM._rule_samples(7, 100))
    assert MM._decode_wav(b"not a wav") is None
    assert MM._decode_wav(good[:20]) is None  # truncated header
    assert MM._decode_wav(good[:60]) is None  # truncated data chunk
    stereo = bytearray(good)
    stereo[22] = 2  # channels = 2
    assert MM._decode_wav(bytes(stereo)) is None
    nonpcm = bytearray(good)
    nonpcm[20] = 3  # format = IEEE float
    assert MM._decode_wav(bytes(nonpcm)) is None
    assert MM._decode_wav(good) is not None
    # extra RIFF chunks before data must not break the walk
    import struct

    extra = (
        good[:36]
        + struct.pack("<4sI", b"LIST", 4)
        + b"INFO"
        + good[36:]
    )
    fixed = bytearray(extra)
    struct.pack_into("<I", fixed, 4, len(extra) - 8)
    dec = MM._decode_wav(bytes(fixed))
    assert dec is not None and np.array_equal(
        dec[0], MM._rule_samples(7, 100)
    )


def test_audio_features_null_rows_and_metadata_contract(spark):
    good = bytearray(MM._encode_wav(MM._rule_samples(2, 160)))
    media = spark.createDataFrame(
        [
            (1, "audio/wav", None, 0, 0, None),
            (2, "audio/wav", good, 0, 0, 160 * 1000 // MM.AUD_RATE),
            (3, "audio/wav", bytearray(b"not a wav"), 0, 0, 20),
            (4, "audio/wav", good, 0, 0, 999),  # metadata/data mismatch
        ],
        "media_id long, mime string, payload binary, width int, height int,"
        " duration_ms long",
    )
    rows = {
        r["media_id"]: r
        for r in MM.extract_audio_features(media).collect()
    }
    assert rows[1]["rms"] is None and rows[3]["rms"] is None
    assert rows[4]["rms"] is None  # duration_ms disagrees with data chunk
    assert rows[2]["n_samples"] == 160 and rows[2]["rms"] is not None
    assert rows[2]["zero_crossings"] is not None and rows[2]["peak"] >= 0
