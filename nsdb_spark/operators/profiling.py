"""Data profiling / quality auditing — the pre-flight checks a training
pipeline runs before pointing 100 TB at a trainer: per-column null/distinct
profiles, numeric moment profiles, PK uniqueness, FK orphan audits,
calendar completeness, and week-over-week distribution drift.

The reference has no profiling surface (its schema registry validates types
at write); these are engine extensions in the same spirit as the stats
family — each one a single declarative Spark plan the optimizer can prune
and push down.

Scale notes (100 TB):
- column_profile and numeric_moments are ONE aggregate pass each; the
  multi-count-distinct in column_profile uses Spark's Expand strategy (one
  shuffle carrying k copies of the distinct columns) — the idiomatic
  single-pass trade; for ultra-wide tables profile in column batches.
- fk_orphans is a left-anti equi-join; the parent side is projected to the
  key column only (column pruning reaches the scan), so even a billion-row
  parent ships one slim column through the shuffle; AQE picks broadcast
  when the projected parent fits.
- daily_completeness builds the calendar axis with sequence() on a 1-row
  frame — the axis never passes through the driver.
- weekly_drift shares one scan for the weekly histograms; the global
  histogram derives from the weekly partials (no second scan).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile: rows (column, n_rows, n_nulls, null_frac,
    n_distinct). One aggregate pass; NULLs are excluded from n_distinct
    (both engines' COUNT(DISTINCT col) semantics)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in columns
    )
    unp = one.select(
        F.col("__n"),
        F.expr(
            f"stack({len(columns)}, {stack_args}) as (col_name, __nonnull, n_distinct)"
        ),
    )
    return unp.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nonnull")).alias("n_nulls"),
        F.round((F.col("__n") - F.col("__nonnull")) / F.col("__n"), 6).alias(
            "null_frac"
        ),
        "n_distinct",
    ).orderBy("col_name")


def numeric_moments(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column numeric moments from raw power sums — mean, std (population),
    skewness, excess kurtosis — computed identically to the SQL oracle
    (built-in skewness/kurtosis differ between engines on sample-vs-population
    corrections, so both sides use the same moment arithmetic)."""
    aggs = []
    for c in columns:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"__n_{c}"),
            F.avg(x).alias(f"__m1_{c}"),
            F.avg(x * x).alias(f"__m2_{c}"),
            F.avg(x * x * x).alias(f"__m3_{c}"),
            F.avg(x * x * x * x).alias(f"__m4_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __m1_{c}, __m2_{c}, __m3_{c}, __m4_{c}" for c in columns
    )
    unp = one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) "
            "as (col_name, n, m1, m2, m3, m4)"
        )
    )
    var = F.col("m2") - F.col("m1") * F.col("m1")
    m1, m2, m3, m4 = (F.col(x) for x in ["m1", "m2", "m3", "m4"])
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (
        m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, F.lit(4.0))
    ) / (var * var) - 3
    return unp.select(
        "col_name",
        F.col("n").alias("n_values"),
        F.round(m1, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("col_name")


def fk_orphans(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (label, child, fk_col, parent,
    pk_col), count child rows whose FK has no parent (NULL FKs are not
    orphans — they're surfaced separately). Left-anti equi-joins over the
    key column only; AQE broadcasts the projected parent when it fits."""
    outs = []
    for label, child, fk, parent, pk in relations:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        nn = child.filter(F.col(fk).isNotNull())
        orphans = nn.join(keys, fk, "left_anti")
        outs.append(
            child.agg(
                F.lit(label).alias("relation"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col(fk).isNull().cast("long")).alias("n_null_fk"),
            ).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "relation",
        "n_child",
        "n_null_fk",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child"), 6).alias("orphan_frac"),
    ).orderBy("relation")


def pk_duplicates(tables: list[tuple[str, DataFrame, str]]) -> DataFrame:
    """Primary-key uniqueness audit: for each (label, df, key) report row
    count, distinct keys, keys appearing more than once, rows carried by
    those keys, and the worst key's multiplicity. One groupBy per table
    (map-side combinable)."""
    outs = []
    for label, df, key in tables:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("__c"))
        outs.append(
            per_key.agg(
                F.lit(label).alias("table_name"),
                F.sum("__c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("__c") > 1).cast("long")).alias("n_dup_keys"),
                F.sum(
                    F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)
                ).alias("n_dup_rows"),
                F.max("__c").alias("max_multiplicity"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


def daily_completeness(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Calendar completeness over a timestamp column: the full day axis
    from min to max date (built with sequence(), never driver-side), with
    per-day row counts, zero-filled — plus span/empty-day summary columns
    duplicated per row for a single-frame report."""
    days = df.select(F.to_date(F.col(ts_col)).alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    axis = (
        days.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
        )
    )
    filled = axis.join(days, "day", "left").select(
        "day", F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows")
    )
    summary = filled.agg(
        F.count(F.lit(1)).alias("n_days_span"),
        F.sum((F.col("n_rows") == 0).cast("long")).alias("n_empty_days"),
        F.max("n_rows").alias("max_daily"),
    )
    return (
        filled.crossJoin(F.broadcast(summary))
        .select(
            F.col("day").cast("string").alias("day"),
            "n_rows",
            "n_days_span",
            "n_empty_days",
            "max_daily",
        )
        .orderBy("day")
    )


def weekly_drift(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    bin_width: float = 100.0,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability-index drift per ISO week against the GLOBAL
    value distribution, over fixed-width bins (fixed bins keep the oracle
    exact — percentile bins would need exact quantiles on both engines).

    One scan: per-(week, bin) counts; the global histogram is the partial
    sums re-aggregated, never a second pass. PSI_w = Σ_bins
    (p_w − p_g)·ln(p_w/p_g) with an ε floor on both proportions."""
    binned = df.select(
        F.weekofyear(F.col(ts_col)).alias("week"),
        F.least(
            F.greatest(F.floor(F.col(value_col) / bin_width), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("long").alias("bin"),
    )
    # materialize the (week × bin) partials once: four downstream branches
    # derive from this frame, and as a lazy lineage each branch would
    # re-scan the raw table (4 full scans at 100 TB). The frame is bounded
    # by construction (weekofyear ≤ 53 × n_bins rows — a driver-bounded
    # scalar frame, same discipline as k-centroid collects), so one
    # collect + createDataFrame pins it without the unpersist-lifetime
    # problem a cached DataFrame leaves in a long-lived session.
    spark = df.sparkSession
    wk_rows = (
        binned.groupBy("week", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wk = spark.createDataFrame(wk_rows, "week int, bin long, c bigint")
    wk_tot = wk.groupBy("week").agg(F.sum("c").alias("wn"))
    gl = wk.groupBy("bin").agg(F.sum("c").alias("g"))
    gl_tot = gl.agg(F.sum("g").alias("gn"))
    # complete (week × bin) grid so empty bins contribute via the ε floor
    grid = wk_tot.crossJoin(F.broadcast(gl)).crossJoin(F.broadcast(gl_tot))
    j = grid.join(wk, ["week", "bin"], "left").select(
        "week",
        "bin",
        (F.coalesce(F.col("c"), F.lit(0)) / F.col("wn")).alias("pw"),
        (F.col("g") / F.col("gn")).alias("pg"),
    )
    pw = F.greatest(F.col("pw"), F.lit(eps))
    pg = F.greatest(F.col("pg"), F.lit(eps))
    return (
        j.groupBy("week")
        .agg(F.round(F.sum((pw - pg) * F.log(pw / pg)), 6).alias("psi"))
        .orderBy("week")
    )
