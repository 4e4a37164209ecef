"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched mapInPandas stages.

A 100 TB training-data pipeline carries image/audio/video alongside text. The
Spark-side contract (schema, partition sizing, UDF batch shape) is real and
tested; the actual media decoding is NOT — the sandbox has no image/audio
libraries, so `decode_image` raises NotImplementedError unless the
deterministic fake decoder is requested (fake=True), which produces a stable
feature vector from the bytes themselves (byte histogram). Swap `_fake_decode`
for a PIL/ffmpeg call in production; nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary, width int, height int"
FEATURE_DIM = 16


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Testing helper: derive a deterministic binary payload column from text
    (stands in for real image bytes; real pipelines read them from object
    storage as a BinaryType column)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.length(text_col) % 640).cast("int").alias("width"),
        (F.length(text_col) % 480).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes, normalize: bool = True) -> np.ndarray:
    """Deterministic stand-in feature: 16-bin byte-value histogram, L1-normed
    (normalize=False returns the raw integer counts as doubles — the exactly
    SQL-replayable form the driver oracle checks)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
    total = hist.sum()
    return hist / total if normalize and total else hist


def decode_image(payload: bytes) -> np.ndarray:
    """Real decoder stub — no image libraries in this environment."""
    raise NotImplementedError(
        "media decoding requires an image library (e.g. PIL) not present in "
        "this environment; use extract_features(..., fake=True) for plumbing tests"
    )


def extract_features(media: DataFrame, fake: bool = False, batch_rows: int = 256,
                     normalize: bool = True) -> DataFrame:
    """media (doc_id, media_type, payload, w, h) → (doc_id, feature array).

    mapInPandas so each task processes Arrow batches of payloads (the batch
    shape a GPU/codec stage wants); partition sizing stays the caller's knob
    via repartition before this stage.
    """
    if fake:
        def decode(p: bytes) -> np.ndarray:
            return _fake_decode(p, normalize=normalize)
    else:
        decode = decode_image

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(run, schema="doc_id long, feature array<double>")


def resize_media(media: DataFrame, width: int, height: int,
                 fake: bool = False) -> DataFrame:
    """The standard pre-training resize stage: payload → (payload', width',
    height'), Arrow-batched. Real resampling needs an image library (stub,
    like decode_image); the deterministic fake crops the byte buffer to
    width*height bytes — the schema, batch shape, and metadata update are
    the real Spark-side contract and are what a PIL `Image.resize` swap
    would inherit unchanged. Exactly SQL-replayable (a blob substring), so
    the plumbing is oracle-checkable."""
    target = int(width) * int(height)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                payloads = [bytes(p)[:target] for p in pdf["payload"]]
            else:
                raise NotImplementedError(
                    "media resizing requires an image library (e.g. PIL) not "
                    "present in this environment; use fake=True for plumbing tests"
                )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": payloads,
                "width": np.full(len(pdf), width, dtype=np.int32),
                "height": np.full(len(pdf), height, dtype=np.int32),
            })

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def attach_fake_video(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Testing helper: a deterministic fake video container per doc — payload
    from the text bytes, frame count derived from its length (always ≥ 2)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        ((F.length(text_col) % 7) + 2).cast("int").alias("n_frames"),
    )


def sample_frames(video: DataFrame, every: int = 2, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: (doc_id, payload, n_frames) →
    (doc_id, frame_no, frame), keeping every `every`-th frame — the stage a
    vision pipeline runs before per-frame feature extraction. The real
    demuxer (ffmpeg) is a stub like decode_image; the deterministic fake
    treats the container as n_frames equal byte spans with EXACT integer
    boundaries (start_i = i*len // n), so the fan-out, ordering, and batch
    shape are SQL-replayable and oracle-checked (`frame_sample`). One input
    row yields multiple output rows inside the same Arrow batch — no
    explode/join, no shuffle."""
    if not fake:
        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "frame demuxing requires ffmpeg, not present in this "
                "environment; use fake=True for plumbing tests"
            )
            yield  # pragma: no cover - generator shape
    else:
        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                ids, frame_nos, frames = [], [], []
                for doc_id, payload, n in zip(pdf["doc_id"], pdf["payload"],
                                              pdf["n_frames"]):
                    buf = bytes(payload)
                    n = int(n)
                    for i in range(0, n, every):
                        lo = i * len(buf) // n
                        hi = (i + 1) * len(buf) // n
                        ids.append(doc_id)
                        frame_nos.append(i)
                        frames.append(buf[lo:hi])
                yield pd.DataFrame({
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "frame_no": np.asarray(frame_nos, dtype=np.int32),
                    "frame": frames,
                })

    return video.mapInPandas(run, schema="doc_id long, frame_no int, frame binary")
