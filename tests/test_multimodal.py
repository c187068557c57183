"""Multimodal plumbing: schema contract, Arrow batch path, decode stub."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table


def test_attach_media_schema(spark, sf_small):
    media = attach_media(load_table(spark, sf_small, "documents"))
    assert dict(media.dtypes)["media"] == "binary"
    meta_type = media.schema["meta"].dataType.simpleString()
    assert meta_type == "struct<format:string,width:int,height:int,n_frames:int>"


def test_extract_features_matches_python(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    feats = {r["doc_id"]: r for r in extract_features(attach_media(docs)).collect()}
    assert extract_features(attach_media(docs)).schema == FEATURE_SCHEMA
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode()
        f = feats[r["doc_id"]]
        assert f["byte_len"] == len(b)
        assert f["head_hex"] == b[:8].hex().upper()
        assert f["content_md5"] == hashlib.md5(b).hexdigest()


def test_sample_frames_fanout(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(30)
    media = attach_media(docs)
    frames = sample_frames(media, stride=2)
    assert frames.schema == FRAME_SCHEMA
    got = {}
    for r in frames.collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for r in media.select("doc_id", "meta.n_frames").collect():
        expect = list(range(0, r["n_frames"], 2))
        assert sorted(got[r["doc_id"]]) == expect


def test_decode_stub_raises_for_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "png", 4, 4)
    raster = decode_media(b"ab", "fake", 2, 2)
    assert raster == [ord("a"), ord("b"), ord("a"), ord("b")]


def test_null_and_empty_payloads(spark):
    df = spark.createDataFrame(
        [(1, b"", ("fake", 4, 4, 3)), (2, None, ("fake", 4, 4, 1))],
        "doc_id long, media binary, meta struct<format:string,width:int,height:int,n_frames:int>",
    )
    feats = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert feats[1]["byte_len"] == 0 and feats[1]["head_hex"] == ""
    # NULL payload -> NULL features (SQL NULL propagation), not empty-bytes
    assert feats[2]["byte_len"] is None and feats[2]["content_md5"] is None
    frames = sample_frames(df, stride=2).collect()
    assert {(r["doc_id"], r["frame_idx"]) for r in frames} == {(1, 0), (1, 2), (2, 0)}


def test_audio_chunks_ragged_tail(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.multimodal import attach_audio, chunk_audio

    docs = spark.createDataFrame(
        [(1, "x" * 100, 100), (2, "", 0)], "doc_id long, text string, n_chars int"
    )
    # doc 1: 10000 samples -> chunks [0:8000], [8000:2000]; doc 2: none
    chunks = chunk_audio(attach_audio(docs), chunk_samples=8000).collect()
    got = sorted((r["doc_id"], r["chunk_idx"], r["start_sample"], r["n_samples"]) for r in chunks)
    assert got == [(1, 0, 0, 8000), (1, 1, 8000, 2000)]
