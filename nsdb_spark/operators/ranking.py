"""Ranked retrieval over the documents table: BM25 scoring.

NSDb has no full-text surface (the dialect's only string operator is LIKE —
SQLStatementParser.scala:217-219); BM25 is a training-data-pipeline
extension: score documents against term lists, keep the top-k.

Scale shape: the per-(doc, term) term-frequency aggregate is the only wide
shuffle, and the term filter is applied BEFORE it, so at 100 TB the shuffle
carries |query terms| rows per doc, not the whole vocabulary. Document
length rides along with the exploded tokens (one extra int per row) — no
second scan or doc-keyed join. Document frequencies for the handful of
query terms collapse to |Q| rows and broadcast. Everything is built-in
expressions — no UDFs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(doc_id, score, rank) for the k best of `scored`.

    orderBy().limit(k) compiles to TakeOrderedAndProject — each partition
    keeps only its local top-k, the driver merges k·P rows — so the global
    rank window (which would otherwise pull EVERY scored doc into one
    partition) runs over ≤ k rows. Ties break by doc_id for determinism.
    """
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", F.round("score", 6).alias("score"), "rank")
    )


def _per_term_scores(
    docs: DataFrame,
    all_terms: list[str],
    k1: float,
    b: float,
    text_col: str,
) -> DataFrame:
    """(doc_id, term, s) — the BM25 contribution of each query term to
    each doc containing it:

        s = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
    """
    words = F.split(F.col(text_col), " ")
    # ONE corpus pass for both stats (the write_postings_table form);
    # two separate actions doubled the scan on every BM25 call
    stats = docs.select(F.size(words).cast("double").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs = int(stats["n"])
    if n_docs == 0:
        raise ValueError("BM25 needs a non-empty corpus")
    avgdl = float(stats["avgdl"])
    toks = docs.select(
        "doc_id",
        F.size(words).cast("double").alias("dl"),
        F.explode(words).alias("term"),
    ).filter(F.col("term").isin(all_terms))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        _bm25_score(n_docs, avgdl, k1, b).alias("s"),
    )


def _bm25_score(n_docs: int, avgdl: float, k1: float, b: float):
    """The ONE BM25 scoring expression over (tf, df, dl) columns — shared
    by the scan path and the postings-served path so the 'identical
    results' contract is structural, not two hand-synchronized copies.
    Parenthesization is part of the contract (the DuckDB oracle mirrors
    it term for term)."""
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    return (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck Jones) for ONE query.

    Output: (doc_id, score rounded to 6, rank) — rank ties broken by doc_id
    so the result is deterministic. The same parenthesization is used in the
    DuckDB oracle so FP evaluation order matches term-for-term.
    """
    per_term = _per_term_scores(docs, query_terms, k1, b, text_col)
    scored = per_term.groupBy("doc_id").agg(F.sum("s").alias("score"))
    return _rank_topk(scored, k)


def bm25_topk_multi(
    docs: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Batch scoring: top-k docs for EVERY query in one pass — the shape
    of offline retrieval evaluation / hard-negative mining. The per-term
    contributions are computed once over the union of all query terms,
    then fanned out to queries via a broadcast join on term (the query
    table is tiny by construction) and re-summed per (query_id, doc_id).
    One extra narrow shuffle versus the single-query path, independent of
    the number of queries.

    Output: (query_id, doc_id, score rounded 6, rank)."""
    spark = docs.sparkSession
    all_terms = sorted({t for ts in queries.values() for t in ts})
    per_term = _per_term_scores(docs, all_terms, k1, b, text_col)
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(queries.items()) for t in ts],
        "query_id string, term string",
    )
    scored = (
        per_term.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def bm25_topk_and(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive retrieval: BM25 top-k restricted to documents that
    contain EVERY query term (Lucene `+term` / `AND` semantics).

    Same single wide shuffle as the OR path — the AND constraint is a
    post-aggregate HAVING (per-(doc,term) rows are distinct, so matched
    terms per doc = row count), not an extra join, so the plan shape and
    shuffle volume are identical to `bm25_topk`.
    """
    nt = len(set(query_terms))
    per_term = _per_term_scores(docs, query_terms, k1, b, text_col)
    scored = (
        per_term.groupBy("doc_id")
        .agg(F.sum("s").alias("score"), F.count(F.lit(1)).alias("__nt"))
        .filter(F.col("__nt") == nt)
        .drop("__nt")
    )
    return _rank_topk(scored, k)


def bm25_topk_phrase(
    docs: DataFrame,
    phrase: str,
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Phrase retrieval: documents containing the exact token-contiguous
    phrase, ranked by BM25 over the phrase's terms.

    Corpus statistics (N, avgdl, df) stay corpus-wide — standard phrase
    scoring — so the phrase match is a cheap narrow substring predicate
    on the space-padded text (token-aligned because the tokenizer is
    single-space split), evaluated in the scan before any shuffle, and
    the match set joins the scored set as a co-partitioned semi join on
    doc_id (the groupBy already partitioned by doc_id; only the thin
    doc_id column shuffles on the other side).
    """
    # normalize the phrase the same way split() normalizes the terms:
    # a stray leading/trailing/double space would otherwise make the
    # contains() match silently impossible while the terms still score
    phrase = " ".join(phrase.split())
    terms = sorted(set(phrase.split()))
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    hits = docs.filter(padded.contains(f" {phrase} ")).select("doc_id")
    per_term = _per_term_scores(docs, terms, k1, b, text_col)
    scored = (
        per_term.groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .join(hits, "doc_id", "semi")
    )
    return _rank_topk(scored, k)


def build_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Full inverted index over the corpus: (term, doc_id, tf, dl) for
    EVERY term — the materialize-once artifact behind repeated retrieval.
    One explode + one (term, doc_id) aggregate; build cost is one corpus
    scan, after which queries never touch the text again."""
    words = F.split(F.col(text_col), " ")
    return (
        docs.select(
            "doc_id",
            F.size(words).cast("double").alias("dl"),
            F.explode(words).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


def write_postings_table(
    docs: DataFrame, name: str, buckets: int = 8, text_col: str = "text"
) -> tuple[int, float]:
    """Materialize the inverted index as a TERM-BUCKETED sorted table (the
    Lucene-postings analogue of operators/rollup.py's facet tables): a
    query for |Q| terms opens only the buckets those terms hash to —
    bucket pruning — and the within-bucket term sort gives row-group
    skipping on top. Returns (n_docs, avgdl) — the two corpus-level
    scoring constants, recorded at build time like any index metadata."""
    from ..sources.bucketed import write_bucketed

    write_bucketed(build_postings(docs, text_col), name, "term", buckets)
    # (n_docs, avgdl) in ONE narrow aggregate over the source frame — the
    # same single-pass stats line as _per_term_scores, so the two paths
    # share their constants' derivation structurally. The old shape
    # re-read the JUST-WRITTEN index and ran a full groupBy(doc_id) over
    # every (term, doc) posting — a second full-index shuffle per build —
    # plus a separate docs.count() job (guide §2.3/§5; r9). Same values:
    # n = count(1) keeps NULL-text docs (they emit no postings rows but
    # ARE corpus rows — IDF parity with bm25_topk and the oracle's
    # count(*)); avg skips the NULL dl of NULL-text docs, i.e. averages
    # exactly the docs resident in the index. Distributed-sum order on
    # avgdl wiggles at most the last ulp, absorbed by the family-wide
    # round(score, 6) contract (the DuckDB oracle already computes avgdl
    # with its own summation order).
    words = F.split(F.col(text_col), " ")
    stats = (
        docs.select(F.size(words).cast("double").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
        .first()
    )
    return int(stats["n"]), float(stats["avgdl"])


def bm25_topk_postings(
    spark,
    table: str,
    n_docs: int,
    avgdl: float,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 served from a materialized postings table — identical
    results to bm25_topk (same arithmetic and parenthesization), but the
    query-time plan reads |Q| term buckets instead of scanning and
    re-tokenizing the corpus: the retrieval-service shape, where the
    index build amortizes over every subsequent query."""
    tf = spark.table(table).filter(F.col("term").isin(query_terms))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_term = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        _bm25_score(n_docs, avgdl, k1, b).alias("s"),
    )
    scored = per_term.groupBy("doc_id").agg(F.sum("s").alias("score"))
    return _rank_topk(scored, k)


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    conjunctive: bool = False,
    phrase: str | None = None,
) -> str:
    """DuckDB oracle with identical arithmetic/parenthesization.

    conjunctive=True adds the AND-semantics HAVING; phrase adds the
    token-aligned substring filter (same padded-contains expression as
    the Spark side)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    having = f"HAVING count(*) = {len(set(query_terms))}" if conjunctive else ""
    phrase_join = (
        f"""JOIN (SELECT doc_id FROM documents
              WHERE contains(' ' || text || ' ', ' {phrase} ')) h USING (doc_id)"""
        if phrase
        else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, cast(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
params AS (SELECT cast(count(*) AS DOUBLE) AS n, (SELECT avg(dl) FROM dl) AS avgdl
           FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({terms}) GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (params.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * ({k1} + 1.0))
           / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / params.avgdl)) AS s
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), params
),
scored AS (SELECT doc_id, sum(s) AS score FROM per_term GROUP BY doc_id {having}),
ranked AS (SELECT doc_id, score,
                  row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
           FROM scored {phrase_join})
SELECT doc_id, round(score, 6) AS score, cast(rank AS int) AS rank
FROM ranked WHERE rank <= {k}
"""


def bm25_multi_oracle_sql(
    queries: dict[str, list[str]], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB oracle for the batch-scoring path (same arithmetic; the
    query table is inlined as VALUES)."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    terms = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in sorted(queries.items()) for t in ts
    )
    return f"""
WITH q(query_id, term) AS (VALUES {qvals}),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, cast(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
params AS (SELECT cast(count(*) AS DOUBLE) AS n, (SELECT avg(dl) FROM dl) AS avgdl
           FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({terms}) GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (params.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * ({k1} + 1.0))
           / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / params.avgdl)) AS s
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), params
),
scored AS (SELECT q.query_id, p.doc_id, sum(p.s) AS score
           FROM per_term p JOIN q USING (term) GROUP BY 1, 2),
ranked AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scored)
SELECT query_id, doc_id, round(score, 6) AS score, cast(rank AS int) AS rank
FROM ranked WHERE rank <= {k}
"""


def rerank_topk(
    docs: DataFrame,
    query_terms: list[str],
    n_candidates: int = 50,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Two-stage retrieval: a cheap BM25 recall stage keeps the top
    n_candidates, then an Arrow-batched re-scorer runs over ONLY those
    candidates — the cross-encoder serving shape (recall stage prunes the
    corpus so the expensive model touches a constant-size candidate set
    regardless of corpus size; swap the stand-in scorer for a real model
    call without touching the plumbing, exactly like
    multimodal.extract_features).

    Stand-in scorer (deterministic, oracle-checkable): distinct-query-
    term coverage * 10 + the BM25 prior — a monotone "semantic boost"
    shape that reorders candidates the recall stage under-ranked.

    Physical shape: candidates are a k-row frame; fetching their text is
    a broadcast semi-join against the corpus (one scan, no corpus
    shuffle); mapInPandas batches flow through Arrow; the final rank
    window runs over n_candidates rows. Output: (doc_id, bm25_score,
    rerank_score, rank) for the top k.
    """
    from collections.abc import Iterator

    import pandas as pd  # noqa: F401 — mapInPandas contract

    cand = bm25_topk(docs, query_terms, k=n_candidates, k1=k1, b=b, text_col=text_col)
    cand_docs = docs.select("doc_id", text_col).join(
        F.broadcast(cand.select("doc_id", F.col("score").alias("bm25_score"))),
        "doc_id",
    )
    qset = sorted(set(query_terms))

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        qs = set(qset)
        for pdf in batches:
            cov = [len(qs.intersection(t.split(" "))) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bm25_score": pdf["bm25_score"],
                    "coverage": cov,
                }
            )

    scored = cand_docs.mapInPandas(fn, "doc_id long, bm25_score double, coverage int")
    rer = scored.select(
        "doc_id",
        "bm25_score",
        (10.0 * F.col("coverage") + F.col("bm25_score")).alias("rs"),
    )
    top = rer.orderBy(F.desc("rs"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("rs"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id",
            "bm25_score",
            F.round("rs", 6).alias("rerank_score"),
            "rank",
        )
    )
