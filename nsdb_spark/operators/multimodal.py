"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery is real — binary columns, Arrow-batched
mapInPandas with an explicit output schema, partition-sized batches — while
the actual media decode is stubbed (this container has no image/audio
codecs). Swap `_decode_stub` for a PIL/ffmpeg call without touching any of
the plumbing.

Scale notes: mapInPandas streams Arrow record batches (no per-row Python
overhead); keep `spark.sql.execution.arrow.maxRecordsPerBatch` sized so a
batch of payloads fits executor memory (binary columns are wide). Partition
by content size upstream if payloads are skewed.
"""
from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, payload binary) — stand-in for reading image/audio bytes;
    payload is the utf-8 encoding of the text column."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def decode_image(payload: bytes):  # pragma: no cover - by design
    """Real image decode — requires PIL/libjpeg, absent in this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_metadata() which runs the same Arrow plumbing with a "
        "deterministic stub decoder"
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata derived arithmetically from the
    payload length so results are oracle-checkable."""
    n = len(payload)
    return n, n % 64, (n // 64) % 64, "fake"


def decode_metadata(bin_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Input: (doc_id, payload binary). Output: DECODED_SCHEMA.
    """
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta, columns=["n_bytes", "width", "height", "format"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return bin_df.mapInPandas(fn, DECODED_SCHEMA)


def document_media_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """End-to-end: attach binary payloads then decode metadata."""
    return decode_metadata(attach_binary(docs, text_col))
