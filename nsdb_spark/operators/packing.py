"""Sequence packing: lay documents end-to-end on a token axis and cut
every `budget` tokens (concat-and-chunk, the standard way training
pipelines fill fixed-size context windows — no token is padded, docs
straddle chunk boundaries).

The only genuinely sequential piece is the GLOBAL exclusive prefix sum of
token lengths in doc_id order. A naive window over a global ORDER BY
plans an Exchange SinglePartition — one task scans everything, a
non-starter at corpus scale. Instead this uses the classic two-phase
scan:

1. range-partition by doc_id + sort within partitions (partitions are
   globally ordered, P-way parallel);
2. per-partition running sums via ONE mapInPandas pass (Arrow batches,
   state carried across batches inside each partition — the rare case
   where per-partition imperative logic is the right tool);
3. per-partition subtotals → driver prefix-sum over P scalars →
   broadcast-joined back as offsets (P rows, never a corpus shuffle).

Result is partition-layout-invariant: boundaries move, start offsets
don't. No reference analogue (training-data extension).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _words


def partition_offsets(local: DataFrame, size) -> DataFrame:
    """(pid, offset): exclusive prefix sum over per-partition totals of
    `size` — P driver scalars (P ≈ shuffle partitions, never data-sized),
    broadcast back by the caller. The two-phase global-scan tail SHARED
    by pack_sequences (token offsets) and sampling.epoch_shuffle (row
    positions); one definition so the missing-pid/empty-partition edge
    can't drift between them. Callers must pass a CHECKPOINTED frame:
    repartitionByRange samples boundaries per job, so subtotals from one
    evaluation joined to local values from another silently shift every
    offset."""
    subtotals = {r["pid"]: r["s"] for r in
                 local.groupBy("pid").agg(F.sum(size).alias("s")).collect()}
    offsets, acc = [], 0
    for pid in range(max(subtotals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += subtotals.get(pid, 0) or 0
    return local.sparkSession.createDataFrame(
        offsets or [(0, 0)], "pid int, offset long"
    )


def _local_prefix_frame(docs: DataFrame, text_col: str) -> DataFrame:
    """The pre-checkpoint two-phase-scan frame: range-partitioned by
    doc_id with per-partition running sums. Exposed separately so plan
    tests can assert the rangepartitioning exchange, which the
    localCheckpoint in pack_sequences truncates from the final plan."""
    d = (
        # NULL texts contribute no tokens and must not enter the prefix
        # sum: size(split(NULL)) is NULL under ANSI (-1 with it off),
        # which would shift every later doc's global start and emit
        # bogus descending-sequence chunks for the NULL doc itself
        docs.filter(F.col(text_col).isNotNull())
        .select("doc_id", F.size(_words(text_col)).cast("long").alias("n"))
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )

    def _local_prefix(it):
        run = 0
        for pdf in it:
            cs = pdf["n"].cumsum()
            pdf["local_start"] = run + cs - pdf["n"]
            run += int(pdf["n"].sum())
            yield pdf

    return d.mapInPandas(
        _local_prefix, schema="doc_id long, n long, pid int, local_start long"
    )


def pack_sequences(
    docs: DataFrame, budget: int = 512, text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_id, start, tokens_in_chunk): each doc's token span
    [start, start+n) mapped onto every budget-sized chunk it overlaps.
    Whitespace token count (consistent with text.py tokenization)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    local = _local_prefix_frame(docs, text_col).localCheckpoint(eager=True)
    off = partition_offsets(local, F.col("n"))

    start = F.col("offset") + F.col("local_start")
    b = F.lit(budget)
    placed = (
        local.join(F.broadcast(off), "pid")
        .withColumn("start", start)
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.expr(f"start div {budget}"),
                    F.expr(f"(start + n - 1) div {budget}"),
                )
            ),
        )
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * b)
    hi = F.least(F.col("start") + F.col("n"), (F.col("chunk_id") + 1) * b)
    return placed.select(
        "doc_id",
        "chunk_id",
        "start",
        (hi - lo).alias("tokens_in_chunk"),
    )
