"""Deterministic corpus sampling.

Training pipelines re-run; a sample that changes between runs poisons
every downstream cache and ablation. `df.sample()` is seed-stable only
for a fixed partitioning — repartition the input (or change the file
split size) and the sample changes. These operators key the decision to
the ROW (a stable id), not the partition layout, so the same row is
always in or out regardless of cluster geometry — and the predicate is a
narrow filter: zero shuffles, evaluated inside whole-stage codegen
during the scan.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative constant (2^32 / φ) — decorrelates sequential ids
_MIX = 2654435761
#: second-round odd multiplier (xxhash32's PRIME32_2) for the epoch key
_MIX2 = 2246822519


def _mul32(col: Column, const: int) -> Column:
    """(col * const) mod 2^32 in pure integer arithmetic, 16 bits at a
    time: a direct product overflows int64 for operands above ~3.5e9
    (ANSI ARITHMETIC_OVERFLOW; sign-biased values with ANSI off).
    Identical values to the plain product wherever that didn't
    overflow. `col` must already be in [0, 2^32)."""
    lo = col.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftright(col, 16)
    return F.pmod(
        lo * const + F.pmod(hi * const, F.lit(1 << 16)) * (1 << 16),
        F.lit(1 << 32),
    )


def _slot(id_col: Column, denom: int) -> Column:
    # pure integer arithmetic so any SQL engine reproduces it bit-for-bit
    # (unlike xxhash64/md5, whose implementations differ across engines);
    # pmod keeps negative ids unbiased.
    return _mul32(F.pmod(id_col.cast("long"), F.lit(1 << 32)), _MIX) % denom


def hash_sample(df: DataFrame, id_col: str, rate: float, denom: int = 1000) -> DataFrame:
    """Keep ~rate of rows, decided by a multiplicative hash of id_col."""
    return df.filter(_slot(F.col(id_col), denom) < int(rate * denom))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    denom: int = 1000,
) -> DataFrame:
    """Deterministic disjoint split assignment: adds a `split` column
    ('train'/'val'/'test'/...) chosen by consecutive hash-slot ranges in
    weight proportion. Every row gets exactly one split; the assignment
    is stable under repartitioning, re-runs, and engine changes (pure
    integer arithmetic), so train/test contamination can't creep in when
    the pipeline is re-executed on different cluster geometry. Narrow
    projection — no shuffle, no sampling action.

    weights must sum to ≤ 1; any remainder falls into the LAST split.
    """
    slot = _slot(F.col(id_col), denom)
    names = list(weights)
    expr = None
    acc = 0
    for name in names[:-1]:
        acc += int(weights[name] * denom)
        expr = F.when(slot < acc, F.lit(name)) if expr is None else expr.when(
            slot < acc, F.lit(name)
        )
    out = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", out)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    denom: int = 1_000_000_000,
) -> DataFrame:
    """Exactly-k-per-group uniform sample (fewer if the group is smaller):
    rows rank within their group by the multiplicative hash of their id
    (ties by id) and the k lowest win. Deterministic under repartitioning
    and re-runs like every sampler here — and NESTED in k: the k=100
    sample contains the k=10 sample, so sweeping sample sizes never
    re-shuffles membership. The balanced-subset primitive (k docs per
    language, k events per type) that `df.sample()` can't express.

    One hash exchange on the group key; row_number cuts inside the window
    stage so only k rows per group survive it.
    """
    w = Window.partitionBy(group_col).orderBy(
        _slot(F.col(id_col), denom).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")  # internal ranking column — output is df's schema
    )


def hash_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    denom: int = 1000,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep all rare 'purchase' events,
    1% of 'click'): threshold chosen by strata_col, membership by the
    id hash — so enlarging a stratum's rate strictly grows its sample
    (nested samples, the property ablation sweeps need)."""
    thresh = F.lit(int(default_rate * denom))
    for stratum, rate in rates.items():
        thresh = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * denom)))
            .otherwise(thresh)
        )
    return df.filter(_slot(F.col(id_col), denom) < thresh)


def hash_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    denom: int = 1000,
) -> DataFrame:
    """Per-row weighted Bernoulli sample, deterministic: a row with weight
    w in [0, 1] is kept iff hash-slot(id) < w·denom — so keep probability
    tracks the weight column (quality scores, language priors, source
    boosts) while membership stays layout- and rerun-stable, and samples
    are NESTED under any pointwise weight increase. Narrow filter, no
    shuffle; pairs with text.quality_score for quality-weighted corpus
    downsampling."""
    return df.filter(
        _slot(F.col(id_col), denom) < (F.col(weight_col) * denom).cast("long")
    )


def epoch_shuffle(df: DataFrame, epoch: int, id_col: str = "doc_id") -> DataFrame:
    """(id_col, pos): a deterministic full permutation of the corpus for
    one training epoch — pos is the row's 0-based position in the
    epoch's global order. Training loops need a DIFFERENT but
    REPRODUCIBLE order each epoch (same epoch → same order on any
    cluster geometry; df.orderBy(rand()) is neither).

    Key = mul32(xorshift16(mul32(id + epoch·PRIME))) — TWO multiply
    rounds with an xor-shift between them, all portable integer
    arithmetic (id as the tie-break). The xor-shift is load-bearing: a
    single multiplicative round is affine in id, so the epoch term
    would be a mere additive constant in key space and every epoch's
    order a ROTATION of epoch 0's circular order — docs adjacent in one
    epoch stay adjacent in all of them, which defeats the batch-
    decorrelation purpose. The non-linear middle step makes the epoch
    interact with every key bit, so successor pairs are reshuffled
    between epochs (asserted in tests).

    Assigning global positions is the same problem as pack_sequences'
    prefix sum: a row_number window over a global ORDER BY plans an
    Exchange SinglePartition (one task sorts everything). Two-phase scan
    instead: range-partition by (key, id) — globally ordered partitions,
    P-way parallel — local 0-based positions per partition via one
    mapInPandas pass, then P per-partition counts prefix-summed on the
    driver and broadcast back as offsets. The checkpoint pins ONE
    repartitionByRange evaluation so counts and local positions can't
    come from different range splits.
    """
    x = F.pmod(
        F.col(id_col).cast("long") + F.lit(epoch * 2147483647),
        F.lit(1 << 32),
    )
    h1 = _mul32(x, _MIX)
    key = _mul32(h1.bitwiseXOR(F.shiftright(h1, 16)), _MIX2)
    d = (
        df.select(F.col(id_col), key.alias("k"))
        .repartitionByRange("k", id_col)
        .sortWithinPartitions("k", id_col)
        .withColumn("pid", F.spark_partition_id())
    )

    def _local(it):
        run = 0
        for pdf in it:
            pdf["local_pos"] = range(run, run + len(pdf))
            run += len(pdf)
            yield pdf

    from .packing import partition_offsets

    local = d.mapInPandas(
        _local, schema=f"{id_col} long, k long, pid int, local_pos long"
    ).localCheckpoint(eager=True)
    off = partition_offsets(local, F.lit(1))
    return local.join(F.broadcast(off), "pid").select(
        id_col, (F.col("offset") + F.col("local_pos")).alias("pos")
    )


def ht_estimate(
    df: DataFrame,
    id_col: str,
    value: str,
    weight_col: str,
    denom: int = 1000,
) -> DataFrame:
    """Horvitz-Thompson audit of the deterministic weighted sample: each
    row's inclusion probability under hash_weighted_sample is EXACTLY
    π = floor(w·denom)/denom (the slot is uniform on [0, denom)), so the
    estimator Σ_sampled v/π is unbiased for the covered total — this
    computes the sampled estimate AND the ground truth in one pass, the
    audit you run before trusting sampled metrics at 100 TB (where the
    full pass is affordable once, the sample daily). Rows with
    floor(w·denom) < 1 have π = 0 — no sample can represent them; they
    are reported as uncovered mass, not silently folded into the bias.

    ONE map-side-combinable aggregate over one scan — conditional sums,
    no join between sample and population. Output one row: (n_total,
    n_covered, n_sampled, true_sum r3, covered_sum r3, ht_sum r3,
    rel_err r6 = (ht − covered)/covered).
    """
    base = (
        df.filter(F.col(value).isNotNull() & F.col(weight_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(value).cast("double").alias("__v"),
            (F.col(weight_col) * denom).cast("long").alias("__k"),
        )
    )
    covered = F.col("__k") >= 1
    sampled = covered & (_slot(F.col("__id"), denom) < F.col("__k"))
    ht_term = F.when(sampled, F.col("__v") * denom / F.col("__k"))
    cov_term = F.when(covered, F.col("__v"))
    return base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(cov_term).alias("n_covered"),
        F.count(ht_term).alias("n_sampled"),
        F.round(F.sum("__v"), 3).alias("true_sum"),
        F.round(F.sum(cov_term), 3).alias("covered_sum"),
        F.round(F.sum(ht_term), 3).alias("ht_sum"),
        F.round(
            F.try_divide(F.sum(ht_term) - F.sum(cov_term), F.sum(cov_term)), 6
        ).alias("rel_err"),
    )


def neyman_allocation(
    df: DataFrame, stratum: str, value: str, total_n: int
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a survey
    budget of `total_n` rows, allocate n_h ∝ N_h·S_h (stratum size ×
    within-stratum std of `value`) — the allocation that minimizes the
    variance of the stratified mean estimator (Neyman 1934). The
    planning table that should precede stratified_sample when strata
    differ in spread: proportional allocation oversamples big
    homogeneous strata and starves small volatile ones.

    ONE map-side-combinable moment aggregate (n, Σx, Σx²) per stratum,
    then closed-form arithmetic on the |strata|-row frame with the
    mass total broadcast back. Strata with n < 2 (undefined S_h) drop,
    matching the estimator's requirements. Allocations are left
    real-valued (r6) — integerization is a separate apportionment
    choice the caller owns.

    Output: (stratum, n_rows bigint, std r6, alloc_share r6, n_alloc r6).
    """
    g = (
        df.filter(F.col(value).isNotNull() & F.col(stratum).isNotNull())
        .groupBy(stratum)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.stddev_samp(F.col(value).cast("double")).alias("__s"),
        )
        .filter(F.col("n_rows") >= 2)
    )
    mass = F.col("n_rows") * F.col("__s")
    tot = g.select(F.sum(mass).alias("__tot"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            stratum,
            "n_rows",
            F.round(F.col("__s"), 6).alias("std"),
            F.round(mass / F.col("__tot"), 6).alias("alloc_share"),
            F.round(F.lit(float(total_n)) * mass / F.col("__tot"), 6).alias(
                "n_alloc"
            ),
        )
    )


def pps_systematic(
    df: DataFrame, id_col: str, size: str, n: int
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (the
    classic cumulative-size method, Madow 1949): lay the corpus out on
    a line where each item occupies `size` units, drop n equally-
    spaced sampling points (offset half a step, so the design is
    deterministic and centered), and keep every item a point lands in.
    Selection probability ∝ size, large items can be hit multiple
    times (`n_hits` — the standard with-replacement-style multiplicity
    a PPS estimator divides by), and the spacing guarantees the sample
    spreads across the whole corpus instead of clustering the way
    Poisson/Bernoulli PPS draws can.

    Distributed shape: the running size prefix is the pack_sequences
    two-phase scan (range partition by `id_col`, local cumsums,
    partition_offsets' P-row driver prefix) — no global window. The
    hit count is closed-form floor arithmetic on (cum_before, cum]:
    hits = ⌊(2n·cum − S)/2S⌋ − ⌊(2n·cum_before − S)/2S⌋ — evaluated in
    double, exact while 2n·S < 2^53 (≈ 4e15 size-units at n = 1000;
    beyond that swap the two floors to decimal(38,0) arithmetic).

    Output: (id_col, size bigint, n_hits bigint), selected rows only.
    """
    from .packing import partition_offsets

    d = df.filter(
        F.col(id_col).isNotNull()
        & F.col(size).isNotNull()
        & (F.col(size) > 0)
    ).select(id_col, F.col(size).cast("long").alias("__sz"))
    local = (
        d.repartitionByRange(id_col)
        .sortWithinPartitions(id_col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("pid").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = local.withColumn("__cum_loc", F.sum("__sz").over(w))
    off = partition_offsets(local, "__sz")
    total = local.agg(F.sum("__sz")).first()[0]
    if not total:
        return local.filter(F.lit(False)).select(
            id_col,
            F.col("__sz").alias("size"),
            F.lit(0).cast("long").alias("n_hits"),
        )
    cum = F.col("__cum_loc") + F.col("offset")
    cum_before = cum - F.col("__sz")
    two_n = 2 * n
    denom = F.lit(2.0 * float(total))
    hits = F.floor(
        (F.lit(two_n) * cum - F.lit(total)) / denom
    ) - F.floor((F.lit(two_n) * cum_before - F.lit(total)) / denom)
    return (
        local.join(F.broadcast(off), "pid")
        .withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") > 0)
        .select(id_col, F.col("__sz").alias("size"), "n_hits")
    )


def neyman_stratified_sample(
    df: DataFrame, stratum: str, value: str, id_col: str, total_n: int
) -> DataFrame:
    """DRAW the Neyman-allocated stratified sample: per stratum, take
    ⌊n_h⌋ rows where n_h is neyman_allocation's optimal share, chosen
    by a deterministic md5-hash order over ids (the stats_bootstrap
    membership discipline — bit-reproducible on any engine and
    layout-invariant, unlike anything seeded by partition ids). The
    companion operator that turns the allocation TABLE into an actual
    sample; zero-variance strata get zero rows by construction.

    Plan: the allocation is a k-row broadcast; the draw is
    sample_per_group's shape — one hash exchange on the stratum key,
    a rank window inside each stratum, rank ≤ take cut. Per-stratum
    sort cost is the price of exactly-n-per-stratum semantics; with
    heavy strata at 100 TB, pre-filter with a Bernoulli hash gate to
    ~2× the target rate first, then rank the survivors.

    Output: (id_col, stratum, value) — the selected rows.
    """
    alloc = neyman_allocation(df, stratum, value, total_n).select(
        stratum, F.floor("n_alloc").cast("long").alias("__take")
    )
    d = df.filter(
        F.col(id_col).isNotNull()
        & F.col(stratum).isNotNull()
        & F.col(value).isNotNull()
    ).select(id_col, stratum, value)
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        d.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(alloc), stratum)
        .filter(F.col("__rk") <= F.col("__take"))
        .select(id_col, stratum, value)
    )


def class_balance(
    df: DataFrame,
    id_col: str,
    positive: Column | str,
    ratio: float = 1.0,
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic negative downsampling to a target class ratio:
    keep EVERY positive, keep a negative iff its hash slot falls under
    rate = min(1, ratio·n_pos/n_neg) — the classifier-training
    rebalance (quality gates, contamination detectors) done without
    RNG: the same corpus always yields the same sample, and the keep
    decision is a pure function of the id (train_val_test_split's
    slot arithmetic), so it survives repartitions and re-runs.

    One count aggregate fixes the rate (two driver scalars), then a
    narrow codegen filter — the corpus never shuffles. The realized
    negative count is Binomial-tight around the target
    (hash-uniformity), reported by the caller via a plain count.

    Output: the selected rows as (id_col, is_pos boolean).
    """
    pos = F.col(positive) if isinstance(positive, str) else positive
    d = df.filter(F.col(id_col).isNotNull() & pos.isNotNull()).select(
        id_col, pos.alias("is_pos")
    )
    counts = d.groupBy().agg(
        F.sum(F.col("is_pos").cast("int")).alias("np"),
        F.sum((~F.col("is_pos")).cast("int")).alias("nn"),
    ).first()
    n_pos, n_neg = counts["np"] or 0, counts["nn"] or 0
    if n_neg == 0:
        return d
    rate_slots = int(min(1.0, ratio * n_pos / n_neg) * denom)
    # _slot's 16-bit-limb product: the plain (id * MIX) form overflows
    # int64 for ids above ~3.5e9 (ANSI ARITHMETIC_OVERFLOW) and its %
    # goes negative for negative ids, silently keeping them all.
    return d.filter(F.col("is_pos") | (_slot(F.col(id_col), denom) < rate_slots))


def time_split_embargo(
    df: DataFrame,
    id_col: str,
    ts: str,
    split_ms: int,
    embargo_ms: int,
) -> DataFrame:
    """Time-based train/test split with an EMBARGO gap: train strictly
    before `split_ms`, test at or after `split_ms + embargo_ms`, and
    the gap rows dropped — the temporally-sound alternative to hash
    splitting for forecasting/temporal models, where a random split
    leaks the future into training and the embargo kills the
    boundary-adjacency leak (autocorrelated rows just across the
    cut; the time-series cross-validation "purge" discipline).

    Pure projection + filter — pipelines with the scan, zero shuffle,
    assignment a total function of the row's own timestamp (stable
    under repartitions, appends, engine versions).

    Output: (id_col, ts, split string) — gap rows absent.
    """
    return (
        df.filter(F.col(id_col).isNotNull() & F.col(ts).isNotNull())
        .select(
            id_col,
            ts,
            F.when(F.col(ts) < split_ms, F.lit("train"))
            .when(F.col(ts) >= split_ms + embargo_ms, F.lit("test"))
            .alias("split"),
        )
        .filter(F.col("split").isNotNull())
    )
