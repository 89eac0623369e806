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

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: injection seams (round 6): every operator below takes an optional codec
#: callable — decode_metadata(decoder=), resize_media(resizer=),
#: sample_frames(frame_sampler=) — defaulting to the deterministic stubs,
#: so a real PIL/ffmpeg implementation plugs in WITHOUT touching the Arrow
#: plumbing. Callables are pickled into the executor closure: pass a
#: module-level function (or functools.partial over one), not a lambda
#: defined in a REPL.

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


def _with_payload(bin_df: DataFrame) -> DataFrame:
    """Rows without a payload carry nothing to decode — drop them BEFORE
    the Arrow stage (a NULL reaches the pandas fns as None and len()/
    bytes()/np.frombuffer would crash the whole job on one bad row).
    Declarative filter: pushes down to the scan."""
    return bin_df.filter(F.col("payload").isNotNull())


def decode_metadata(
    bin_df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int, str]] | None = None,
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Input: (doc_id, payload binary). Output: DECODED_SCHEMA.
    decoder: payload → (n_bytes, width, height, format). Default is the
    deterministic stub; inject a real codec (e.g. PIL) here.
    """
    import pandas as pd

    decode = decoder or _decode_stub

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta, columns=["n_bytes", "width", "height", "format"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return _with_payload(bin_df).mapInPandas(fn, DECODED_SCHEMA)


def document_media_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """End-to-end: attach binary payloads then decode metadata."""
    return decode_metadata(attach_binary(docs, text_col))


RESIZED_SCHEMA = "doc_id long, out_bytes int, payload_digest string"


def _resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: crop/keep to target_w × target_h bytes."""
    return bytes(payload)[: target_w * target_h]


def resize_media(
    bin_df: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched 'resize'. Output carries the resized size and an md5
    digest of the resized payload so results stay oracle-checkable without
    shipping binaries through the compare.

    resizer: (payload, w, h) → resized bytes. Default is the deterministic
    crop stub; inject PIL.Image.resize-backed bytes here.

    Input: (doc_id, payload binary). One pass, no shuffle; Arrow moves each
    batch once in each direction.
    """
    import hashlib

    import pandas as pd

    resize = resizer or _resize_stub

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            resized = [resize(p, target_w, target_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "out_bytes": [len(r) for r in resized],
                    "payload_digest": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return _with_payload(bin_df).mapInPandas(fn, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_digest string"


def _frame_walk_stub(
    payload: bytes, frame_bytes: int, every: int
) -> list[tuple[int, bytes]]:
    """Deterministic fake keyframe walk: fixed-size frames, every
    `every`-th kept; partial trailing frames kept (truncated last GOP)."""
    b = bytes(payload)
    n_frames = -(-len(b) // frame_bytes) if b else 0
    return [
        (i, b[i * frame_bytes : (i + 1) * frame_bytes])
        for i in range(0, n_frames, every)
    ]


def sample_frames(
    bin_df: DataFrame,
    frame_bytes: int = 64,
    every: int = 4,
    frame_sampler: Callable[[bytes, int, int], list[tuple[int, bytes]]] | None = None,
) -> DataFrame:
    """Arrow-batched frame sampling. Output one row per sampled frame —
    the row-expanding mapInPandas shape a video pipeline needs.

    frame_sampler: (payload, frame_bytes, every) → [(frame_idx, frame
    bytes), ...]. Default is the deterministic fixed-size walk; inject an
    ffmpeg keyframe walk here.
    """
    import hashlib

    import pandas as pd

    sampler = frame_sampler or _frame_walk_stub

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in sampler(p, frame_bytes, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_digest": digests}
            )

    return _with_payload(bin_df).mapInPandas(fn, FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, n_bytes int, mean_byte double, feat_digest string"


def extract_features(bin_df: DataFrame, buckets: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: an 8-bin
    byte-value histogram (the stand-in for a real embedding/CNN feature
    pass — swap the numpy recipe for a model call without touching the
    plumbing). Output: (doc_id, n_bytes, mean_byte rounded 6, feat_digest
    = md5 of the comma-joined integer bucket counts — exact, so the
    whole vector is oracle-checkable without float-formatting drift).

    The per-batch work is vectorized numpy over the Arrow buffer
    (frombuffer + bincount) — the compute shape of a real batched
    feature extractor, never per-row Python."""
    import hashlib

    import numpy as np
    import pandas as pd

    # proportional binning bucket = byte*buckets >> 8 — correct for ANY
    # bucket count (a pure right shift silently dropped the top bins for
    # non-powers-of-two); identical to byte // (256/buckets) at powers
    # of two, so the DuckDB oracle (b // 32 at buckets=8) is unchanged

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, nbs, means, digs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(p), dtype=np.uint8)
                n = len(a)
                hist = (
                    np.bincount(
                        (a.astype(np.int64) * buckets) >> 8, minlength=buckets
                    )[:buckets]
                    if n
                    else np.zeros(buckets, dtype=np.int64)
                )
                ids.append(doc_id)
                nbs.append(n)
                # raw mean here; HALF_UP rounding happens in the Spark
                # expression below (python round() is half-even — would
                # drift from the DuckDB oracle's round())
                means.append(float(a.sum()) / n if n else 0.0)
                digs.append(
                    hashlib.md5(
                        ",".join(str(int(c)) for c in hist).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": nbs, "mean_byte": means,
                 "feat_digest": digs}
            )

    return _with_payload(bin_df).mapInPandas(fn, FEATURES_SCHEMA).withColumn(
        "mean_byte", F.round("mean_byte", 6)
    )
