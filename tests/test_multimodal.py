"""Unit tests for multimodal binary-column operators: schema/typing of
the media table, mapInPandas feature extraction, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from datamodel_clinicaldata_spark.operators.multimodal import (
    audio_rms_windows,
    byte_histogram,
    decode_image,
    frame_sample,
    media_from_documents,
)


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="abcd" * 100),  # 400 bytes
            Row(doc_id=2, text="z"),  # 1 byte
        ]
    )
    return media_from_documents(docs)


def test_media_schema_and_meta(media_df):
    schema = dict(media_df.dtypes)
    assert schema["content"] == "binary"
    assert schema["media_meta"].startswith("struct<width:int,height:int")
    r = {row["media_id"]: row for row in media_df.collect()}
    assert bytes(r[1]["content"]) == b"abcd" * 100
    assert r[1]["media_meta"]["width"] == 400 % 640
    assert r[1]["media_meta"]["duration_ms"] == 4000


def test_byte_histogram_exact(media_df):
    rows = {
        (r["media_id"], r["bin"]): r["n"]
        for r in byte_histogram(media_df, bins=64).collect()
    }
    # 'a'=97,'b'=98,'c'=99 → bin 24; 'd'=100 → bin 25
    assert rows[(1, 24)] == 300
    assert rows[(1, 25)] == 100
    assert rows[(2, ord("z") // 4)] == 1


def test_frame_sample_cardinality_and_digests(media_df):
    rows = [r for r in frame_sample(media_df).collect() if r["media_id"] == 1]
    # 400 bytes, stride 128 → frames at 0,128,256,384 → 4 frames
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    blob = b"abcd" * 100
    first = next(r for r in rows if r["frame_idx"] == 0)
    assert first["frame_md5"] == hashlib.md5(blob[:64]).hexdigest()
    last = next(r for r in rows if r["frame_idx"] == 3)
    assert last["frame_len"] == 400 - 384


def test_audio_rms_windows_exact(media_df):
    rows = [r for r in audio_rms_windows(media_df, window=256).collect() if r["media_id"] == 1]
    assert sorted(r["window_idx"] for r in rows) == [0, 1]
    w0 = next(r for r in rows if r["window_idx"] == 0)
    assert w0["n_samples"] == 256
    expected = sum(b * b for b in (b"abcd" * 100)[:256])
    assert w0["sum_sq"] == expected


def test_decode_image_is_gated(media_df):
    with pytest.raises(NotImplementedError):
        decode_image(media_df)
