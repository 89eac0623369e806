"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. All
  arithmetic is JVM fold expressions (no UDF); one scan, one TakeOrdered.
- ivf_assign / ivf_topk: IVF-style inverted-file ANN — the scale path.
  Vectors are assigned to their nearest centroid cell once (a narrow
  projection against a broadcast centroid list); queries probe only the
  nprobe nearest cells.
- write_ivf_index / ivf_topk_indexed (+ append_ivf_index, and the SRP
  twins write_rhp_index / rhp_topk_indexed): the STORED-assignment
  serving path — cell/signature persisted as a partition column at
  write time, probes partition-prune to nprobe/ncells of the data
  (scan numPartitions asserted in tests/test_plans.py).
- cosine_topk_join / ivf_topk_join_indexed: batch k-NN for a bounded
  query set — one corpus pass, or per-query pruned probes.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str) -> Column:
    # native elementwise Cast (codegen) rather than a transform() lambda
    # (interpreted HigherOrderFunction) — float→double widening is exact
    # either way, so scores are bit-identical
    return F.col(vec_col).cast("array<double>")


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    # floored so a zero-norm vector (padding / missing embedding) scores
    # cosine 0 instead of crashing the whole query with ANSI
    # DIVIDE_BY_ZERO; any real vector's norm is >= ~1e-154 and unaffected
    return F.greatest(
        F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)),
        F.lit(1e-300),
    )


def _py_norm(vec) -> float:
    """Driver-side norm of a query/centroid with the zero-vector floor —
    ONE definition so the `or 1.0` convention can't drift between the
    single-query and batch-join paths (it must stay consistent with
    _norm's executor-side 1e-300 floor for scores to agree)."""
    import math

    return math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0


def cosine_scores(emb: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    """(vec_id, raw cosine as `score`) against a literal query vector."""
    q = _lit_vec(query_vec)
    qn = _py_norm(query_vec)
    v = _as_double(vec_col)
    return emb.select(
        "vec_id",
        (_dot(v, q) / (_norm(v) * F.lit(qn))).alias("score"),
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine: (vec_id, cosine rounded to 6).

    Ordering uses the raw score (rounding only the output) and vec_id as a
    deterministic tie-break. Catalyst plans orderBy+limit as
    TakeOrderedAndProject — per-partition heaps, no full sort."""
    return (
        cosine_scores(emb, query_vec, vec_col)
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round(F.col("score"), 6).alias("cosine"))
    )


def ivf_assign(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest centroid (by cosine): adds `cell`.

    Centroids ride along as literal arrays (broadcast by construction). The
    argmax is a fold over the centroid index — pure codegen, no shuffle.
    """
    # argmax via array_max over (score, -cell) structs — a nested
    # when-chain would duplicate subtrees exponentially in the expression
    # tree. The NEGATED cell makes score ties break toward the LOWEST
    # index, matching _nearest_cells' probe order and pq.py's argmin
    # rule: with duplicate/degenerate centroids, a plain (score, cell)
    # max assigned vectors to the HIGHER twin while probes tried the
    # lower one first — nprobe=1 could scan an empty cell.
    # The vector norm is hoisted to its own column so it is computed ONCE
    # per row; inlining _norm(v) into every candidate's score (the old
    # shape) re-ran the norm fold k times per row. Same divisor value →
    # identical scores.
    cands = []
    for ci, c in enumerate(centroids):
        cn = _py_norm(c)
        score = _dot(F.col("__vd"), _lit_vec(c)) / (F.col("__nv") * F.lit(cn))
        cands.append(F.struct(score.alias("s"), F.lit(-ci).alias("nc")))
    best = F.array_max(F.array(*cands))
    return (
        emb.withColumn("__vd", _as_double(vec_col))
        .withColumn("__nv", _norm(F.col("__vd")))
        .withColumn("cell", -best["nc"])
        .drop("__vd", "__nv")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the nprobe cells nearest to the query, exact top-k
    inside them. With nprobe == len(centroids) this equals cosine_topk."""
    probes = _nearest_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(emb, centroids, vec_col).filter(F.col("cell").isin(probes))
    return cosine_topk(assigned, query_vec, k, vec_col)


def _nearest_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """Indices of the nprobe centroids nearest to the query by cosine —
    driver-side arithmetic over k×dim floats (index metadata, not data)."""
    qn = _py_norm(query_vec)
    scored = []
    for ci, c in enumerate(centroids):
        cn = _py_norm(c)
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, c))
        scored.append((dot / (qn * cn), ci))
    # ties: highest score first, LOWEST centroid index wins — the same
    # rule as _ivfpq_query_side's stable argsort, so the IVF and IVF-PQ
    # paths probe identical cells on tied/degenerate centroid layouts
    return [ci for _, ci in sorted(scored, key=lambda t: (-t[0], t[1]))[:nprobe]]


def write_ivf_index(
    emb: DataFrame,
    name: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus with its IVF cell as a PARTITION column —
    the stored-assignment serving path. Assignment runs ONCE at write
    time (one narrow codegen pass); every subsequent probe filters
    `cell IN (nprobe values)`, which the file index applies as a
    PartitionFilter, opening only nprobe of ncells directories (the scan
    metric is asserted in tests/test_plans.py) instead of re-assigning
    the whole corpus per query. The reference prunes shards by time the
    same way (ReadNodesSelection.scala:40-49); this applies that
    discipline to the similarity axis."""
    from ..sources.bucketed import write_partitioned

    assigned = ivf_assign(emb, centroids, vec_col)
    write_partitioned(assigned, name, "cell")


def append_ivf_index(
    emb: DataFrame,
    name: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Incremental ingest into a write_ivf_index table: assign the batch
    against the SAME frozen centroids and append into the cell
    directories — existing files untouched, probes see the new vectors
    immediately. At 100 TB this is the only viable maintenance mode
    (a full re-layout is a compaction decision, not a write-path one);
    centroid drift is handled by periodic re-materialization, exactly
    like the engine's rollup invalidate-and-rebuild rule."""
    from ..sources.bucketed import append_partitioned

    append_partitioned(ivf_assign(emb, centroids, vec_col), name, "cell")


def ivf_topk_indexed(
    spark,
    table: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k served from a write_ivf_index table: same candidate set
    (stored cell ≡ computed cell — assignment is deterministic) and same
    results as ivf_topk, but the plan is a partition-pruned scan of
    nprobe/ncells of the directories plus a k-row TakeOrdered."""
    probes = _nearest_cells(query_vec, centroids, nprobe)
    cand = spark.table(table).filter(F.col("cell").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col)


def cosine_range_search(
    emb: DataFrame,
    query_vec: list[float],
    min_cosine: float,
    vec_col: str = "embedding",
) -> DataFrame:
    """All vectors with cosine(v, query) >= min_cosine: (vec_id, cosine
    rounded 6). The radius-query counterpart of cosine_topk — retrieval
    filters ("every chunk at least this similar to the query") rather than
    fixed-k. Pure fold expressions over one scan; the cut applies to the
    6-decimal rounded score (same discipline as embedding_cosine_pairs —
    sub-ulp fold-order differences between engines can't flip membership).
    At scale, pre-prune with an IVF cell or SRP signature filter first
    (ivf_assign / rhp_signature) and apply this inside the surviving
    cells."""
    return (
        cosine_scores(emb, query_vec, vec_col)
        .select("vec_id", F.round(F.col("score"), 6).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


# ---------------------------------------------------------- random hyperplane


def deterministic_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Reproducible pseudo-random hyperplanes in [-1, 1]^dim (md5-derived —
    identical in any engine/runtime, no RNG state)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rhp_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Packed sign-bit signature: bit p = 1 iff dot(v, plane_p) >= 0.
    Classic SRP-LSH (Charikar '02): P[bits agree] = 1 - angle/pi."""
    v = _as_double(vec_col)
    bits = [
        F.when(_dot(v, _lit_vec(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def rhp_topk(
    emb: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    multiprobe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via random-hyperplane buckets: candidates share the
    query's signature bucket (multiprobe=1 also probes every
    1-bit-flipped neighbour bucket), then exact cosine top-k inside.

    At scale the signature is a stored column (computed once at ingest);
    a probe is then `sig IN (17 values)` — partition/file prunable —
    followed by a k-row TakeOrdered. Candidate volume ~ n/2^planes per
    bucket with SRP's angle-preserving collision probability.
    """
    probes = rhp_query_probes(query_vec, planes, multiprobe)
    tagged = emb.withColumn("__sig", rhp_signature(vec_col, planes))
    cand = tagged.filter(F.col("__sig").isin(probes)).drop("__sig")
    return cosine_topk(cand, query_vec, k, vec_col)


def cosine_topk_join(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN join: exact top-k corpus neighbours for EVERY query in
    a bounded query set — (query_id, vec_id, cosine, rank). The
    batch-retrieval shape (rerank candidates for a request batch,
    evaluate an eval set) next to cosine_topk's single query.

    The query set rides as a broadcast literal array-of-structs exploded
    against the scan — one corpus pass total, not one per query; scoring
    stays a JVM fold (no UDF); per-query top-k is a window rank cut over
    (query, score) — the |Q|·k result rows are the only wide output. For
    unbounded query sets use the IVF/SRP stored-assignment path per query
    instead (the probe cost is independent of corpus size there).
    """
    from pyspark.sql import Window

    if not queries:  # explode of an empty array() is VOID-typed — guard
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    qs = F.array(*[
        F.struct(
            F.lit(int(qid)).cast("long").alias("query_id"),
            _lit_vec(vec).alias("qv"),
            F.lit(_py_norm(vec)).alias("qn"),
        )
        for qid, vec in queries
    ])
    v = _as_double(vec_col)
    scored = (
        emb.select("vec_id", v.alias("__v"), _norm(v).alias("__n"))
        .select("vec_id", "__v", "__n", F.explode(qs).alias("q"))
        .select(
            F.col("q.query_id").alias("query_id"),
            "vec_id",
            (_dot(F.col("__v"), F.col("q.qv")) / (F.col("__n") * F.col("q.qn"))).alias("__s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("__s", 6).alias("cosine"), "rank")
    )


def ivf_topk_join_indexed(
    spark,
    table: str,
    queries: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN against a write_ivf_index table: each query probes only
    its own nprobe cells (per-query partition-pruned scans unioned, each
    tagged with its query_id), then one window rank cut — for Q queries
    the scan cost is Q·(nprobe/ncells) of the corpus instead of Q full
    passes (cosine_topk_join's shape) or one full pass × Q score columns.
    Same output contract as cosine_topk_join; with nprobe == ncells the
    results are identical to it."""
    from pyspark.sql import Window

    t = spark.table(table)
    if not queries:  # degrade like cosine_topk_join, not IndexError
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    parts = []
    for qid, vec in queries:
        probes = _nearest_cells(vec, centroids, nprobe)
        q = _lit_vec(vec)
        qn = _py_norm(vec)
        v = _as_double(vec_col)
        parts.append(
            t.filter(F.col("cell").isin(probes)).select(
                F.lit(int(qid)).cast("long").alias("query_id"),
                "vec_id",
                (_dot(v, q) / (_norm(v) * F.lit(qn))).alias("__s"),
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("__s", 6).alias("cosine"), "rank")
    )


def rhp_query_probes(
    query_vec: list[float], planes: list[list[float]], multiprobe: int = 1
) -> list[int]:
    """The query's SRP signature plus every neighbour within `multiprobe`
    bit flips — the bucket set an SRP probe reads. The knob genuinely
    scales: multiprobe=m probes Σ_{i<=m} C(planes, i) buckets (it used
    to treat any value >= 1 as exactly the 1-flip set, silently capping
    recall). Driver-side index metadata arithmetic only."""
    import itertools

    q = [float(x) for x in query_vec]
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(q, p)) >= 0:
            qsig |= 1 << i
    probes = [qsig]
    for flips in range(1, min(multiprobe, len(planes)) + 1):
        for combo in itertools.combinations(range(len(planes)), flips):
            mask = 0
            for i in combo:
                mask |= 1 << i
            probes.append(qsig ^ mask)
    return probes


def write_rhp_index(
    emb: DataFrame,
    name: str,
    planes: list[list[float]],
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> None:
    """Materialize the corpus with its SRP signature as a PARTITION
    column (stored-assignment counterpart of write_ivf_index): the
    signature is computed once at write time; a probe is then
    `sig IN (1+planes values)` applied as a PartitionFilter, opening at
    most that many of the 2^planes directories — not the corpus.

    `partitions=P` bounds the directory count: the layout column becomes
    sig_part = sig mod P (2^planes directories would explode past ~8-10
    planes), probes prune on the P-valued column, and the full `sig`
    rides along so the row-level filter still cuts within surviving
    files via parquet column stats. Pick P ≈ the cluster's healthy
    partition count; pruning keeps ≤ (1+planes) of P directories."""
    from ..sources.bucketed import write_partitioned

    tagged = emb.withColumn("sig", rhp_signature(vec_col, planes))
    if partitions is not None:
        tagged = tagged.withColumn("sig_part", F.pmod(F.col("sig"), F.lit(partitions)))
        write_partitioned(tagged, name, "sig_part")
        return
    write_partitioned(tagged, name, "sig")


def rhp_topk_indexed(
    spark,
    table: str,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """ANN top-k served from a write_rhp_index table — same results as
    rhp_topk. Pass the SAME `partitions` the index was written with:
    None prunes on the sig directories directly; P adds the
    sig_part IN (probes mod P) PartitionFilter (≤ 1+planes of P
    directories open) with the exact sig filter cutting rows inside the
    surviving files."""
    probes = rhp_query_probes(query_vec, planes, multiprobe)
    cand = spark.table(table).filter(F.col("sig").isin(probes))
    if partitions is not None:
        cand = cand.filter(
            F.col("sig_part").isin(sorted({p % partitions for p in probes}))
        ).drop("sig", "sig_part")
    else:
        cand = cand.drop("sig")
    return cosine_topk(cand, query_vec, k, vec_col)


# ------------------------------------------------------------- quantization


def quantize_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: q[i] = round(v[i]·127/scale),
    scale = max|v| — the storage-shrinking step of a large-scale embedding
    pipeline (4 bytes → 1 byte per dimension before ANN indexing).

    Output: (vec_id, scale rounded to 6, q_digest md5 of the comma-joined
    int codes, n_dims) — digested so results stay compact and
    oracle-checkable. Pure expressions, one scan, no shuffle.
    """
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # try_divide: an all-zero vector has scale 0 — quantize to all-zero
    # codes instead of an ANSI DIVIDE_BY_ZERO failure
    q = F.transform(
        v, lambda x: F.round(F.coalesce(F.try_divide(x * 127.0, scale), F.lit(0.0))).cast("int")
    )
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.md5(F.array_join(F.transform(q, lambda x: x.cast("string")), ",")).alias(
            "q_digest"
        ),
        F.size(v).alias("n_dims"),
    )


def centroid_outliers(
    emb: DataFrame,
    bottom_k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid-distance audit: each label's centroid is the
    element-wise mean of its member vectors; every member scores the
    cosine to its own centroid; the bottom-k members per label surface
    as outliers — the embedding-space mislabel/contamination probe run
    before using labels for stratified sampling or dedup thresholds.

    Plan: the centroid is a posexploded (label, pos) mean — ONE
    map-side-combinable aggregate whose output is |labels|·dim rows,
    tiny at any corpus size — reassembled into an array and BROADCAST
    back onto the members, so the corpus itself moves only into the
    final per-label top-k exchange. Cosine stays JVM-side (zip_with +
    aggregate). Zero-norm members (all-zero vectors) score cosine 0 via
    the _norm floor and sort first, never an ANSI error.

    Output: (label, vec_id, cos_centroid rounded 6, rn) — rn = 1 is the
    farthest member from its centroid.
    """
    from pyspark.sql import Window

    v = _as_double(vec_col)
    exploded = emb.select(
        F.col(label_col).alias("label"), F.posexplode(v).alias("pos", "x")
    )
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("__pm")
        )
        .select(
            "label",
            F.transform(F.col("__pm"), lambda s: s["m"]).alias("__cent"),
        )
    )
    joined = emb.select(
        "vec_id", F.col(label_col).alias("label"), v.alias("__v")
    ).join(F.broadcast(cent), "label")
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__cent"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norms = _norm(F.col("__v")) * _norm(F.col("__cent"))
    scored = joined.select(
        "label",
        "vec_id",
        # try_divide+coalesce: if BOTH norms hit the 1e-300 floor their
        # product underflows to 0.0 — score 0, not an ANSI error
        F.round(F.coalesce(F.try_divide(dot, norms), F.lit(0.0)), 6).alias(
            "cos_centroid"
        ),
    )
    w = Window.partitionBy("label").orderBy(
        F.asc("cos_centroid"), F.asc("vec_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= bottom_k
    )


def label_diversity(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean pairwise cosine similarity — the intra-class
    tightness score (high = redundant near-identical members worth
    semantic-dedup; low = diverse class), computed in CLOSED FORM:
    with unit vectors u_i, Σ_{i≠j} u_i·u_j = ||Σu||² − n, so the mean
    pairwise cosine is (||Σu||² − n) / (n·(n−1)) and the O(n²) pair join
    never happens — one posexplode and two label-keyed aggregates whose
    shuffle is |labels|·dim rows at any corpus size.

    Singleton labels have no pairs: NULL via try_divide (DuckDB /0
    parity). Zero-norm vectors would break the ||u_i|| = 1 identity; the
    _norm floor maps them to the zero vector, which undercounts the
    diagonal — callers with genuinely zero vectors should filter first
    (the docstring contract, asserted nowhere: real embeddings are
    nonzero). Output: (label, n_vecs, mean_pairwise_cos rounded 6).
    """
    v = _as_double(vec_col)
    sel = emb.select(F.col(label_col).alias("label"), v.alias("__v"))
    nrm = _norm(F.col("__v"))
    u = F.transform(F.col("__v"), lambda x: x / nrm)
    ex = sel.select("label", F.posexplode(u).alias("pos", "x"))
    sums = ex.groupBy("label", "pos").agg(F.sum("x").alias("s"))
    ssq = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("ssq")
    )
    counts = sel.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    n = F.col("n_vecs")
    return (
        counts.join(ssq, "label")
        .select(
            "label",
            "n_vecs",
            F.round(
                F.try_divide(F.col("ssq") - n, n * (n - 1)), 6
            ).alias("mean_pairwise_cos"),
        )
    )


def mmr_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    shortlist: int = 30,
    lam: float = 0.7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein SIGIR'98): greedily select argmax_c of
    λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s) — the result-diversification
    step after any similarity retrieval (a plain top-k returns five
    near-copies of the best hit; MMR returns the best hit plus four
    genuinely different ones).

    Two-stage, like text_rerank_twostage: stage 1 is the DISTRIBUTED
    exact top-`shortlist` by cosine (TakeOrderedAndProject — the corpus
    never sorts globally and only `shortlist` rows ever leave the
    executors, vectors included); stage 2 is the greedy argmax over that
    bounded shortlist on the driver — the selection is inherently
    sequential in k and touches shortlist² ≤ 30² pairs, far below the
    kmeans-centroid collect this repo already bounds at. Relevance and
    pairwise cosines round to 6 BEFORE the greedy compare so the SQL
    oracle's unrolled selection walks the identical lattice; ties break
    by vec_id ascending.

    Output: (rank 1-based, vec_id, relevance r6, mmr_score r6) — row
    rank 1 is always the globally most relevant candidate (its MMR
    score is defined as λ·rel, no diversity term yet).
    """
    import math

    q = _lit_vec(query_vec)
    qn = _py_norm(query_vec)
    v = _as_double(vec_col)
    rows = (
        emb.select(
            "vec_id",
            v.alias("__v"),
            (_dot(v, q) / (_norm(v) * F.lit(qn))).alias("__s"),
        )
        .orderBy(F.col("__s").desc(), F.col("vec_id").asc())
        .limit(shortlist)
        .collect()
    )
    cand = [
        (int(r["vec_id"]), list(r["__v"]), round(r["__s"], 6)) for r in rows
    ]

    def cos(a: list, b: list) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return round(d / (na * nb), 6)

    selected: list[tuple] = []  # (vec_id, vec, relevance, mmr_score)
    remaining = list(cand)
    while remaining and len(selected) < k:
        best = None
        for vid, vec, rel in remaining:
            div = max((cos(vec, sv) for _, sv, _, _ in selected), default=0.0)
            score = lam * rel - (1.0 - lam) * div
            # ties: higher score wins, then smaller vec_id
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, (vid, vec, rel, score))
        selected.append(best[1])
        remaining = [c for c in remaining if c[0] != best[1][0]]
    out = [
        (i + 1, vid, rel, round(score, 6))
        for i, (vid, _, rel, score) in enumerate(selected)
    ]
    return emb.sparkSession.createDataFrame(
        out, "rank int, vec_id long, relevance double, mmr_score double"
    )


def knn_label_vote(
    emb: DataFrame,
    k: int = 5,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Leave-one-out k-NN label classification over the embedding table:
    each vector's predicted label is the majority label of its k nearest
    OTHER vectors by cosine — the standard label-quality audit
    (`agree` = False rows are mislabel/boundary candidates, the same
    consumers as centroid_outliers but neighborhood- instead of
    centroid-based).

    This is the EXACT all-pairs anchor, like dedup_embedding_cosine: the
    pair join is O(n²) by declaration, the oracle-checkable ground truth
    the bucketed paths (IVF cells, SRP bands) are measured against — at
    100 TB the same vote runs over their candidate pairs instead. Both
    stages after the join are window/aggregate cuts: per-vector top-k by
    raw cosine (ties by neighbour id — raw dots are bit-identical across
    engines because both fold left-to-right), then a (vector, label)
    count with a (count desc, label asc) rank-1 cut.

    Output: (vec_id, label, pred_label, n_votes, agree).
    """
    from pyspark.sql import Window

    v = _as_double(vec_col)
    # checkpoint the (vec, norm) projection: the norm FOLD must evaluate
    # once per ROW, not once per pair, and both join sides reuse the same
    # materialized rows. The probe side then REPARTITIONS to the session
    # parallelism — the source is typically a handful of parquet splits,
    # and a broadcast nested-loop join inherits the left side's partition
    # count, so without the spread 1-2 tasks would score every pair
    # (measured 25.5 s → 15 s at sf0.1); the build side broadcasts
    # explicitly (a checkpointed frame has no stats for the auto-
    # broadcast threshold; the unbroadcast plan measured 127 s).
    side = emb.select(
        "vec_id", F.col(label_col).alias("__l"), v.alias("__v"),
        _norm(v).alias("__n"),
    ).localCheckpoint(eager=True)
    par = emb.sparkSession.sparkContext.defaultParallelism
    pairs = (
        side.repartition(par).alias("a")
        .join(
            F.broadcast(side.alias("b")),
            F.col("a.vec_id") != F.col("b.vec_id"),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.__l").alias("label"),
            F.col("b.vec_id").alias("nbr_id"),
            F.col("b.__l").alias("nbr_label"),
            (
                _dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("__s"),
        )
    )
    wk = Window.partitionBy("vec_id").orderBy(
        F.desc("__s"), F.asc("nbr_id")
    )
    nbrs = pairs.withColumn("__rn", F.row_number().over(wk)).filter(
        F.col("__rn") <= k
    )
    votes = nbrs.groupBy("vec_id", "label", "nbr_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.desc("n_votes"), F.asc("nbr_label")
    )
    out = (
        votes.withColumn("__rv", F.row_number().over(wv))
        .filter(F.col("__rv") == 1)
        .select(
            "vec_id",
            "label",
            F.col("nbr_label").alias("pred_label"),
            "n_votes",
            (F.col("nbr_label") == F.col("label")).alias("agree"),
        )
    )
    return out


def centroid_drift(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label centroid drift between two deterministic corpus halves
    (id parity): the embedding-space DRIFT monitor — run it between two
    ingest batches / embedding-model versions and a label whose two
    half-centroids diverge (low cosine) has shifted meaning, mixed
    sources, or a model regression, before any downstream threshold
    (dedup, ANN recall) quietly degrades. Splitting on id parity makes
    the audit self-contained and rerun-stable; callers comparing real
    batches pass a precomputed 0/1 column as `id_col`'s parity instead.

    Plan: ONE posexploded (label, half, pos) mean — map-side-combinable,
    output 2·|labels|·dim rows — reassembled per half and joined per
    label (tiny frames); cosine is a JVM fold. Output: (label, n_even,
    n_odd, cos_drift r6, norm_even r6, norm_odd r6); labels missing a
    half drop (no drift defined).
    """
    v = _as_double(vec_col)
    half = F.pmod(F.col(id_col), F.lit(2)).cast("int")
    ex = emb.select(
        F.col(label_col).alias("label"),
        half.alias("half"),
        F.posexplode(v).alias("pos", "x"),
    )
    cent = (
        ex.groupBy("label", "half", "pos")
        .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("c"))
        .groupBy("label", "half")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__pm"),
            F.max("c").alias("n"),
        )
        .select(
            "label",
            "half",
            F.transform(F.col("__pm"), lambda s: s["m"]).alias("__c"),
            "n",
        )
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", F.col("__c").alias("__ca"), F.col("n").alias("n_even")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", F.col("__c").alias("__cb"), F.col("n").alias("n_odd")
    )
    dot = _dot(F.col("__ca"), F.col("__cb"))
    na, nb = _norm(F.col("__ca")), _norm(F.col("__cb"))
    return a.join(b, "label").select(
        "label",
        "n_even",
        "n_odd",
        F.round(F.coalesce(F.try_divide(dot, na * nb), F.lit(0.0)), 6).alias(
            "cos_drift"
        ),
        F.round(na, 6).alias("norm_even"),
        F.round(nb, 6).alias("norm_odd"),
    )


def cosine_topk_filtered(
    emb: DataFrame,
    allowed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Filtered exact vector search: top-k by cosine WITHIN an allowlist
    of ids (a metadata predicate resolved to ids — lang = 'en', source
    in a tenant set, license-clean docs). The filter applies BEFORE any
    distance arithmetic via a semi join, so the score computation —
    the expensive part at 100 TB — runs only over qualifying vectors;
    a post-filter top-k would either over-fetch blindly or return
    fewer than k. Composes with the stored-index paths the same way
    (probe, semi-join the allowlist, then rank).

    `allowed`: one-column DataFrame of qualifying ids. Output:
    (vec_id, cosine r6), exactly as cosine_topk.
    """
    key = allowed.columns[0]
    pruned = emb.join(
        allowed.select(F.col(key).alias(id_col)).distinct(), id_col, "semi"
    )
    return cosine_topk(pruned, query_vec, k=k, vec_col=vec_col)


def signbit_words(vec_col: str, dim: int) -> list[Column]:
    """Sign-bit sketch of a `dim`-float vector as ceil(dim/32) packed
    32-bit words (each held in a long): bit j of word w is 1 iff
    component w*32+j is >= 0. The expression is a fixed unrolled sum of
    conditional bigint literals — pure JVM whole-stage-codegen, no UDF,
    and each word stays in [0, 2^32), so no sign-bit edge cases."""
    v = _as_double(vec_col)
    words = []
    for w in range((dim + 31) // 32):
        terms = None
        for j in range(min(32, dim - w * 32)):
            bit = F.when(
                F.element_at(v, w * 32 + j + 1) >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            terms = bit if terms is None else terms + bit
        words.append(terms.cast("long").alias(f"w{w}"))
    return words


def hamming_topk_signbits(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest by SIGN-BIT Hamming distance: quantize every
    embedding to a 1-bit-per-dimension sketch (dim bits, packed into
    32-bit words) and rank by popcount of the XOR against the query's
    sketch. For unit-norm-ish embeddings the sign sketch preserves
    angular order in expectation (each hyperplane {x_i = 0} is a random
    cut — the same guarantee SimHash/SRP rely on), so this is the
    32x-compressed shortlist stage: at 100 TB the sketch column is
    ~0.4 TB, scanned with two bit ops per word and NO float math,
    and the shortlist re-ranks exactly via cosine_topk on k' << n
    survivors (compose with cosine_topk_filtered). Here it serves the
    ranking itself so the semantics are oracle-checkable end to end.

    Plan: narrow projection (id + packed words), xor + bit_count per
    word — whole-stage codegen throughout — then TakeOrderedAndProject
    for the k rows (ties break on hamming ASC, vec_id ASC). The sketch
    is computed inline here; a stored-index variant would write the
    words once at ingest exactly like write_rhp_index.

    Output: (vec_id, hamming int), k rows.
    """
    dim = len(query_vec)
    qwords = []
    for w in range((dim + 31) // 32):
        acc = 0
        for j in range(min(32, dim - w * 32)):
            if query_vec[w * 32 + j] >= 0:
                acc |= 1 << j
        qwords.append(acc)
    packed = emb.select("vec_id", *signbit_words(vec_col, dim))
    dist = None
    for w, qw in enumerate(qwords):
        d = F.bit_count(F.col(f"w{w}").bitwiseXOR(F.lit(qw)))
        dist = d if dist is None else dist + d
    return (
        packed.withColumn("hamming", dist.cast("int"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "hamming")
    )


def hamming_rerank_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """The two-stage sketch-then-exact search the sign-bit sketch
    exists for: shortlist `shortlist` candidates by Hamming distance
    over the 1-bit sketches (32x less IO than the float column, pure
    bit ops), then rank the survivors by EXACT cosine. At 100 TB the
    first stage touches only the sketch column and the second touches
    `shortlist` float vectors instead of n — the same recall/cost
    shape as text_rerank_twostage (BM25 recall → exact re-score).

    Both stages are deterministic (hamming ties break on vec_id, the
    exact stage on raw score then vec_id), so the composition is
    oracle-checkable end to end. The shortlist ids broadcast into a
    semi join — no shuffle of the embedding table.

    Output: (vec_id, cosine r6), k rows.
    """
    short = hamming_topk_signbits(
        emb, query_vec, k=shortlist, vec_col=vec_col
    ).select("vec_id")
    pruned = emb.join(F.broadcast(short), "vec_id", "semi")
    return cosine_topk(pruned, query_vec, k=k, vec_col=vec_col)


def matryoshka_overlap(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefix: int = 32,
    vec_col: str = "embedding",
) -> DataFrame:
    """Prefix-dimension retrieval-quality audit: how much of the exact
    full-dimension top-k survives when the search uses only the FIRST
    `prefix` components (the Matryoshka/MRL serving trick — truncated
    embeddings cut index size and scan cost by dim/prefix, IF the
    model front-loads information; this measures whether it does, on
    YOUR corpus, before committing the index build).

    Two exact top-k rankings (full and sliced — the slice is a
    projection, so the prefix scan reads dim·(prefix/dim) of the
    column bytes at parquet level too) and a k-row semi join. Both
    rankings are deterministic (score desc, vec_id asc), so the
    overlap count is oracle-checkable.

    Output: one row (k, n_overlap bigint, overlap_frac r6).
    """
    full = cosine_topk(emb, query_vec, k=k, vec_col=vec_col)
    pre = cosine_topk(
        emb.select(
            "vec_id", F.slice(F.col(vec_col), 1, prefix).alias(vec_col)
        ),
        query_vec[:prefix],
        k=k,
        vec_col=vec_col,
    )
    return (
        full.select("vec_id")
        .join(F.broadcast(pre.select("vec_id")), "vec_id", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(float(k)), 6).alias(
                "overlap_frac"
            ),
        )
    )


def int8_recall_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Retrieval-quality audit of int8 quantization: how much of the
    exact fp top-k survives when BOTH corpus and query are
    symmetric-int8 quantized (quantize_int8's exact codes,
    reconstructed as code·scale/127)? The measured go/no-go for the
    4x-storage-cut index — the same audit shape as
    matryoshka_overlap, pointed at precision loss instead of
    dimension loss.

    The dequantized ranking is deterministic (same HALF_UP rounding
    both engines — the emb_quantize_int8 oracle contract) and the
    query is quantized THROUGH the corpus expression (it is corpus
    vector 0), so no driver-side rounding can diverge. Two exact
    top-k scans + a k-row semi join.

    Output: one row (k, n_overlap bigint, overlap_frac r6).
    """
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    deq = F.transform(
        v,
        lambda x: F.round(
            F.coalesce(F.try_divide(x * 127.0, scale), F.lit(0.0))
        ).cast("int")
        * scale
        / 127.0,
    )
    qd = emb.select("vec_id", deq.alias(vec_col))
    dq_query = [
        float(x)
        for x in qd.filter(F.col("vec_id") == 0).first()[vec_col]
    ]
    pre = cosine_topk(qd, dq_query, k=k, vec_col=vec_col)
    full = cosine_topk(emb, query_vec, k=k, vec_col=vec_col)
    return (
        full.select("vec_id")
        .join(F.broadcast(pre.select("vec_id")), "vec_id", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(float(k)), 6).alias(
                "overlap_frac"
            ),
        )
    )


def effective_dimension(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-space anisotropy audit via per-dimension variances:
    the participation ratio PR = (Σᵢ vᵢ)² / Σᵢ vᵢ² over the per-
    dimension variances vᵢ — the "how many dimensions actually carry
    signal?" number (PR = dim for isotropic embeddings, PR ≪ dim for
    the collapsed/anisotropic spaces that sink cosine retrieval), and
    the cheap go/no-go before PCA truncation or Matryoshka serving.

    One posexplode collapses the corpus to dim rows of (n, Σx, Σx²)
    — map-side combinable, shuffle bounded by dim — and PR is closed
    form on that frame. Diagonal-only (full covariance is
    emb_pca_project's job); population variance (÷n) on both engines.

    Output: one row (dim int, n_vectors bigint, var_total r6,
    var_top r6 [largest single dimension], pr_dim r6).
    """
    d = emb.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(_as_double(vec_col)).alias("i", "x")
    )
    per = d.groupBy("i").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    v = F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (
        F.col("s1") / F.col("n")
    )
    agg = per.select(v.alias("v"), F.col("n")).groupBy().agg(
        F.count(F.lit(1)).cast("int").alias("dim"),
        F.max("n").alias("n_vectors"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.max("v").alias("vt"),
    )
    return agg.select(
        "dim",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.round(F.col("sv"), 6).alias("var_total"),
        F.round(F.col("vt"), 6).alias("var_top"),
        F.round(
            F.try_divide(F.col("sv") * F.col("sv"), F.col("svv")), 6
        ).alias("pr_dim"),
    )


def hamming_knn_join(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    shortlist: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN join through the sign-bit sketch: for every query in
    a bounded set, a per-query hamming shortlist (one packed-words
    corpus pass shared by ALL queries — the query sketches ride as a
    broadcast literal exploded against the scan, exactly the
    cosine_topk_join shape but over 1-bit words) followed by ONE exact
    re-rank pass over the union of shortlists. The batch sibling of
    hamming_rerank_topk: at 100 TB the sketch pass reads 32× fewer
    bytes than cosine_topk_join's fp32 scan, and the exact pass
    touches |Q|·shortlist vectors instead of |Q|·n.

    Output: (query_id, vec_id, cosine r6, rank int), rank 1..k per
    query — the cosine_topk_join contract, so the two paths are
    directly comparable.
    """
    from pyspark.sql import Window

    if not queries:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    dim = len(queries[0][1])
    n_words = (dim + 31) // 32
    packed = emb.select("vec_id", *signbit_words(vec_col, dim))
    qrows = []
    for qid, vec in queries:
        words = []
        for w in range(n_words):
            acc = 0
            for j in range(min(32, dim - w * 32)):
                if vec[w * 32 + j] >= 0:
                    acc |= 1 << j
            words.append(acc)
        qrows.append((int(qid), words))
    qs = F.array(*[
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            F.array(*[F.lit(w).cast("long") for w in words]).alias("qw"),
        )
        for qid, words in qrows
    ])
    e = packed.select("vec_id", *[f"w{i}" for i in range(n_words)],
                      F.explode(qs).alias("q"))
    dist = None
    for i in range(n_words):
        d = F.bit_count(
            F.col(f"w{i}").bitwiseXOR(F.element_at(F.col("q.qw"), i + 1))
        )
        dist = d if dist is None else dist + d
    wsh = Window.partitionBy("q.query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id")
    )
    short = (
        e.withColumn("hamming", dist)
        .withColumn("rn", F.row_number().over(wsh))
        .filter(F.col("rn") <= shortlist)
        .select(F.col("q.query_id").alias("query_id"), "vec_id")
        .localCheckpoint(eager=True)
    )
    cand = emb.join(
        F.broadcast(short.select("vec_id").distinct()), "vec_id", "semi"
    )
    # k = the union bound: nothing may be cut before the own-shortlist
    # semi join (a query's candidate can rank below `shortlist` in the
    # UNION while still being in that query's own list)
    exact = cosine_topk_join(
        cand, queries, k=shortlist * len(queries), vec_col=vec_col
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        exact.join(short, ["query_id", "vec_id"], "semi")
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def isotropy_profile(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """First-moment isotropy diagnostics: how far the embedding cloud
    sits from the origin relative to its spread. mean_norm_ratio =
    ‖μ‖ / mean‖x‖ (0 = centered cloud, →1 = all vectors point one way
    — the anisotropic cone LLM embeddings famously collapse into), and
    avg_cos_mu = mean cosine of each vector to μ, the standard
    "average pairwise cosine" estimator (E[cos(x, y)] ≈ cos-to-mean²
    when the cloud is cone-shaped). Complements effective_dimension's
    second-moment participation ratio: PR can look healthy while every
    vector still shares a dominant direction.

    Two passes, both map-side combinable and dim-bounded: (1)
    posexplode → per-dimension means; (2) the dim-row mean vector
    broadcasts back and one aggregate accumulates ‖x‖, x·μ. No
    pairwise joins anywhere.

    Output: one row (n_vectors bigint, mu_norm r6, mean_norm r6,
    mean_norm_ratio r6, avg_cos_mu r6).
    """
    d = emb.filter(F.col(vec_col).isNotNull()).select(
        F.monotonically_increasing_id().alias("__rid"),
        _as_double(vec_col).alias("v"),
    )
    dims = d.select(F.col("__rid"), F.posexplode("v").alias("i", "x"))
    mu = dims.groupBy("i").agg(F.avg("x").alias("m"))
    j = dims.join(F.broadcast(mu), "i")
    per_vec = j.groupBy("__rid").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"),
        F.sum(F.col("x") * F.col("m")).alias("dot_mu"),
    )
    mu_norm_df = mu.groupBy().agg(
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("mu_norm")
    )
    agg = per_vec.crossJoin(F.broadcast(mu_norm_df)).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.first("mu_norm").alias("mu_norm"),
        F.avg("nrm").alias("mean_norm"),
        F.avg(
            F.try_divide(F.col("dot_mu"), F.col("nrm") * F.col("mu_norm"))
        ).alias("avg_cos_mu"),
    )
    return agg.select(
        "n_vectors",
        F.round("mu_norm", 6).alias("mu_norm"),
        F.round("mean_norm", 6).alias("mean_norm"),
        F.round(
            F.try_divide(F.col("mu_norm"), F.col("mean_norm")), 6
        ).alias("mean_norm_ratio"),
        F.round("avg_cos_mu", 6).alias("avg_cos_mu"),
    )


def hubness_profile(
    emb: DataFrame,
    n_queries: int = 100,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k-NN hubness audit: run exact top-k retrieval for a bounded
    query sample (the first n_queries vectors, self-hits excluded) and
    summarize the IN-DEGREE distribution of the returned neighbors —
    high-dimensional spaces concentrate retrieval onto "hub" vectors
    that appear in everyone's neighbor list, silently wrecking kNN
    label votes and dedup verdicts (Radovanović et al., JMLR 2010).
    hub_share near k/n_hits ⇒ healthy; a single vector owning a large
    share ⇒ hubness problem (mean-center or re-normalize first).

    One corpus pass: the query sample rides as a BROADCAST FRAME (not a
    literal array — at 100 queries x dim the literal expression tree hit
    thousands of nodes and cost multiple seconds of driver
    analysis/codegen before the first task launched, and its generated
    code overflowed the JVM method limit into interpreted fallback), the
    per-query top-k is a window cut, and the in-degree rollup runs on
    the |n_queries·k| hit frame. qn uses the same executor-side fold as
    the corpus norms: identical op order to the old driver-side
    _py_norm, so scores are bit-identical.

    Output: one row (n_queries int, k int, n_hits bigint,
    n_distinct_neighbors bigint, max_in_degree bigint, hub_vec_id,
    hub_share r6).
    """
    from pyspark.sql import Window

    from .dedup import _parallelize

    v = _as_double(vec_col)
    qv = _as_double("qv")
    qdf = (
        emb.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("qv"),
        )
        .select("query_id", qv.alias("qv"), _norm(qv).alias("qn"))
    )
    scored = (
        # the corpus side expands |emb| x n_queries under the nested-loop
        # join — spread the one-split scan first or it runs on one core
        _parallelize(emb)
        .select(F.col(id_col).alias("vid"), v.alias("__v"), _norm(v).alias("__n"))
        .join(F.broadcast(qdf), F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            "vid",
            (_dot(F.col("__v"), F.col("qv")) / (F.col("__n") * F.col("qn"))).alias("__s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("vid").asc()
    )
    hits = scored.select(
        "query_id", "vid", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)
    indeg = hits.groupBy("vid").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    out = indeg.groupBy().agg(
        F.sum("d").alias("n_hits"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_neighbors"),
        F.max(F.struct(F.col("d"), (-F.col("vid")).alias("nv"))).alias("mx"),
    ).crossJoin(
        F.broadcast(qdf.agg(F.count(F.lit(1)).alias("__nq")))
    )
    return out.select(
        F.col("__nq").cast("int").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "n_distinct_neighbors",
        F.col("mx.d").alias("max_in_degree"),
        (-F.col("mx.nv")).cast("long").alias("hub_vec_id"),
        F.round(
            F.try_divide(F.col("mx.d"), F.col("n_hits").cast("double")), 6
        ).alias("hub_share"),
    )


def norm_profile(emb: DataFrame, label_col: str = "label") -> DataFrame:
    """Embedding L2-norm QA per label: n, min/mean/max norm — the
    pre-flight check before any cosine machinery (an unnormalized or
    collapsed-norm slice silently skews every similarity).

    Scale shape: explode to (vec, component) once, one two-level
    aggregate (norms per vector map-side, k-row profile after) —
    whole-stage codegen, no Python, no pair joins."""
    comp = emb.select(
        "vec_id", F.col(label_col).alias("lbl"),
        F.explode("embedding").alias("x"),
    )
    norms = comp.groupBy("vec_id", "lbl").agg(
        F.sqrt(F.sum(F.col("x").cast("double") * F.col("x"))).alias("nrm")
    )
    return (
        norms.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.avg("nrm"), 6).alias("mean_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("lbl")
    )
