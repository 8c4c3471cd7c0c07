"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators
(``mapInPandas``) — the Spark-native pattern for media pipelines.

The decode step itself is STUBBED (``decode_image`` raises
``NotImplementedError`` unless given the deterministic fake codec): the
container has no image/audio libraries. Everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested, so
swapping a real decoder in is a one-function change.
"""

from __future__ import annotations

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

# The contract of with_binary_payload's output (kept in lockstep with
# that function — a consumer can validate or createDataFrame against it).
PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("media_type", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def decode_image(payload: bytes, codec: str = "real") -> bytes:
    """Decode an image payload to raw pixels.

    STUB: real decoding needs an image library not present in this
    container. ``codec='fake'`` returns the payload unchanged (a
    deterministic stand-in used by tests); anything else raises.
    """
    if codec == "fake":
        return payload
    raise NotImplementedError(
        "image decoding requires an imaging library; install one and replace "
        "this stub (the Spark-side plumbing in extract_features is complete)"
    )


def resize_image(pixels: bytes, width: int, height: int, codec: str = "real") -> bytes:
    """Resize raw pixels. STUB like :func:`decode_image`; the fake codec
    truncates/pads deterministically so the batch plumbing is testable."""
    if codec == "fake":
        n = max(width * height, 0)
        return (pixels * (n // max(len(pixels), 1) + 1))[:n]
    raise NotImplementedError(
        "image resizing requires an imaging library; replace this stub"
    )


def sample_frames(payload: bytes, every_n: int = 2, codec: str = "real") -> list[bytes]:
    """Sample 'frames' from a video payload. STUB; the fake codec treats
    each 16-byte slice as one frame and keeps every n-th."""
    if codec == "fake":
        frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
        return frames[::every_n]
    raise NotImplementedError(
        "frame sampling requires a video library; replace this stub"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_len", IntegerType()),
    ]
)


def explode_sampled_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """mapInPandas pass that fans each payload out to its sampled frames
    (one output row per kept frame) — the video-ingest shape: schema,
    batch iteration, and row fan-out are real; the codec is the fake."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # a payload-less row has no frames
                for i, fr in enumerate(sample_frames(payload, every_n, codec="fake")):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_len"].append(len(fr))
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, FRAME_SCHEMA)


FRAME_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def frame_hashes(df: DataFrame, every_n: int = 2) -> DataFrame:
    """mapInPandas pass emitting a content hash per sampled frame — the
    fingerprint feed a media dedup index consumes (frame-level near-dup
    detection over video payloads: shared frames ⇒ shared md5s, no
    pixel comparison ever crosses the wire). Same fake codec and batch
    shape as :func:`explode_sampled_frames`; the hash is computed
    INSIDE the Arrow batch loop, so only (doc_id, frame_no, 32-char
    hash) rows leave the task — ~1/GB of the payload bytes."""
    import hashlib

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # no payload, no frames to fingerprint
                frames = sample_frames(payload, every_n, codec="fake")
                for i, fr in enumerate(frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_md5"].append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(hash_frames, FRAME_HASH_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_len", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_payloads(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize pass: decode → resize to (width × height) →
    fingerprint, one row per payload — the image-normalization shape a
    vision-data pipeline runs before embedding. Schema, Arrow batching,
    and per-batch vectorization are real; the codec is the deterministic
    fake (tile-and-truncate), so the output is oracle-checkable."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "out_len": [], "resized_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # nothing to decode
                px = resize_image(
                    decode_image(payload, codec="fake"), width, height, codec="fake"
                )
                out["doc_id"].append(doc_id)
                out["out_len"].append(len(px))
                out["resized_md5"].append(hashlib.md5(px).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, RESIZE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of the text,
    standing in for image/audio bytes) plus typed metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("byte_len"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each task processes whole Arrow batches (not rows);
    the stub features (length / first byte / additive checksum) stand in
    for decode-resize-embed. Deterministic, so oracle-checkable.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (e.g. null source text) carry no features;
            # an unguarded len()/sum() over None would kill the job
            pdf = pdf[pdf["payload"].notna()]
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "checksum": payloads.map(lambda b: int(sum(b)) % 1_000_000_007).astype(
                        "int64"
                    ),
                }
            )

    return df.mapInPandas(compute, FEATURE_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("start", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def frame_audio(df: DataFrame, frame: int = 64, hop: int = 32) -> DataFrame:
    """Audio framing (the STFT windowing pass): treat each payload as a
    PCM sample buffer (the deterministic byte stand-in — a real pipeline
    swaps in soundfile/librosa decode here) and emit fixed-size frames
    on a hop grid with per-frame energy Σ sample².

    Standard analysis convention: FULL frames only (starts 0, hop, 2·hop
    … with start+frame ≤ n; a short tail is dropped, payloads shorter
    than one frame emit nothing). Energy is an exact integer, so the
    fan-out is oracle-checkable end-to-end. ``mapInPandas`` over Arrow
    batches; frames materialize inside the iterator, never on the
    driver — the m2 frame-sampling shape with numeric signal math.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "frame_idx": [], "start": [],
                "n_samples": [], "energy": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # no samples to frame
                buf = bytes(payload)
                for idx, s in enumerate(range(0, len(buf) - frame + 1, hop)):
                    window = buf[s:s + frame]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["start"].append(s)
                    out["n_samples"].append(frame)
                    out["energy"].append(sum(b * b for b in window))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "start": pd.Series(out["start"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                }
            )

    return df.mapInPandas(_frames, AUDIO_FRAME_SCHEMA)
