"""Multimodal columns — SURVEY.md §2 B68 + driver mandate.

Model: image/audio/video payloads are opaque ``BinaryType`` columns with a
typed metadata struct beside them.  The Spark-side plumbing — schema,
Arrow batch shape, partition-size control — is real and tested; the actual
codec step is STUBBED (``decode=\"stub\"``) because no image/audio
libraries exist in this container.  Swapping the stub for PIL/librosa is a
one-function change inside the same ``mapInPandas`` iterator.

Why ``mapInPandas``: per-batch (not per-row) Python with Arrow transfer —
the only acceptable Python entry point for payload-heavy columns; batch
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs never materializes at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_checksum", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the multimodal row shape from the fixture corpus: the UTF-8
    bytes of ``text`` stand in for a real media payload (same column types,
    same plumbing)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def extract_features(media: DataFrame, decode: str = "stub") -> DataFrame:
    """Per-payload feature extraction over ``mapInPandas``.

    ``decode='stub'`` computes deterministic byte-level features (length,
    mod-checksum, head hex) — a stand-in with the same dataflow shape as a
    real decoder.  ``decode='real'`` raises: codecs are not available in
    this environment (clearly-marked stub per the driver contract).

    The UDF body is a closure (serialized by value) so workers never need
    this package on their import path.
    """
    if decode not in ("stub", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present in "
            "this container; use decode='stub' (deterministic byte features)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % 997
                    ),
                    "head_hex": payloads.map(lambda b: b[:8].hex()),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def frame_manifest(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Fixed-stride frame/window manifest over binary payloads — the
    video-frame-sample / audio-window shape: each payload row EXPLODES
    into ceil(n_bytes/stride) manifest rows (offset, length, head bytes).

    This is the 1-to-N Arrow boundary ``extract_features`` (1-to-1)
    doesn't exercise: ``mapInPandas`` output batches carry a different
    row count than their inputs, which is exactly how a real
    frame-sampler or audio-chunker emits.  Downstream decode works
    per-frame from (offset, length) without re-reading whole payloads —
    at 100 TB the manifest is the shuffle-able unit while blobs stay put.
    Empty payloads emit no frames.
    """

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "media_type": [], "frame_idx": [],
                "frame_offset": [], "frame_len": [], "head_hex": [],
            }
            for did, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                n = len(payload)
                for i in range((n + frame_bytes - 1) // frame_bytes):
                    off = i * frame_bytes
                    rows["doc_id"].append(did)
                    rows["media_type"].append(mt)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(min(frame_bytes, n - off))
                    rows["head_hex"].append(bytes(payload[off : off + 4]).hex())
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)
