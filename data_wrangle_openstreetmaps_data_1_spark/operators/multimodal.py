"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched Pandas functions over
``mapInPandas`` (BASELINE.json north star — multimodal training-data
pipelines).

Container constraint: no image/audio codec libraries exist here, so the
*decode* step is stubbed — :func:`decode_media` raises
``NotImplementedError`` for real codecs and produces a deterministic fake
raster for the ``fake`` format. Everything around the stub is real and
tested: the schema contract, the Arrow batch shape, binary-safe byte
handling, multi-row-per-input emission (frame sampling), and the
feature-extraction path (hashes/lengths computed from the actual bytes in
Python).

Scale notes: media bytes never leave executors (no collect); mapInPandas
streams Arrow batches, so peak memory is one batch of binaries per task —
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it. Feature
extraction is embarrassingly parallel; frame sampling fans out rows
without a shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("head_hex", StringType()),
        StructField("content_md5", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("chunk_md5", StringType()),
    ]
)


def attach_audio(documents: DataFrame) -> DataFrame:
    """Audio flavor of :func:`attach_media`: payload bytes stand in for PCM;
    metadata carries (sample_rate, n_samples) like a decoded WAV header."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("audio"),
        F.struct(
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars").cast("long") * 100).alias("n_samples"),
        ).alias("meta"),
    )


def chunk_audio(audio: DataFrame, chunk_samples: int = 8000) -> DataFrame:
    """Fixed-length audio chunking (the resample/segment shape of a speech
    pipeline): one row per ``chunk_samples`` window, last chunk ragged.
    Multi-row mapInPandas emission; the per-chunk md5 is a codec-free stand-
    in for the resampled-waveform fingerprint.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, int, int, str]] = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["audio"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                if meta is None or meta["n_samples"] is None:
                    continue  # no metadata -> no chunks (SQL: range over NULL is empty)
                total = int(meta["n_samples"])
                idx = 0
                for start in range(0, total, chunk_samples):  # 0 samples -> 0 chunks
                    n = min(chunk_samples, total - start)
                    fp = hashlib.md5(raw + str(idx).encode()).hexdigest()
                    out.append((int(doc_id), idx, start, n, fp))
                    idx += 1
            yield pd.DataFrame(
                out, columns=["doc_id", "chunk_idx", "start_sample", "n_samples", "chunk_md5"]
            )

    return audio.mapInPandas(batches, schema=CHUNK_SCHEMA)


def attach_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media column from the documents table: the
    UTF-8 bytes of ``text`` stand in for an encoded payload; metadata is a
    typed struct derived from stable columns (same formulas as the oracle)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.element_at(F.array(F.lit("png"), F.lit("jpeg"), F.lit("fake")), (F.col("doc_id") % 3 + 1).cast("int")).alias("format"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 7 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str, width: int, height: int) -> list[int]:
    """Decode stub. Real codecs are unavailable in this container; the
    ``fake`` format decodes to a deterministic byte raster so downstream
    plumbing is exercisable."""
    if fmt != "fake":
        raise NotImplementedError(
            f"no codec for format={fmt!r} in this environment; "
            "only the deterministic 'fake' raster decodes"
        )
    n = max(1, min(width * height, 64))
    return [payload[i % len(payload)] if payload else 0 for i in range(n)]


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level features via mapInPandas: length, first-8-bytes hex, md5.

    Computed in Python from the raw bytes (the real multimodal path —
    swap the body for PIL/ffmpeg calls where codecs exist); each output
    value is independently recomputable in SQL, which the oracle uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload -> NULL features (matching SQL NULL propagation:
            # octet_length(NULL)=NULL etc.), NOT coerced to empty bytes
            payloads = [bytes(b) if b is not None else None for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(b) if b is not None else None for b in payloads],
                    "head_hex": [b[:8].hex().upper() if b is not None else None for b in payloads],
                    "content_md5": [hashlib.md5(b).hexdigest() if b is not None else None for b in payloads],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: emit every ``stride``-th frame index per media row
    (multi-row-per-input mapInPandas — the video path's fan-out shape).
    ``frame_md5`` stands in for a decoded-frame fingerprint: md5 of the
    payload with the frame index appended (deterministic, codec-free)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, str]] = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["media"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                # no metadata -> no frames (the chunk_audio convention;
                # review r9: this path previously crashed the task on a
                # NULL meta struct instead of emitting zero rows)
                if meta is None or meta["n_frames"] is None:
                    continue
                n_frames = int(meta["n_frames"])
                for idx in range(0, n_frames, stride):
                    fp = hashlib.md5(raw + str(idx).encode()).hexdigest()
                    out.append((int(doc_id), idx, fp))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_md5"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
