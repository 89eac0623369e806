"""sampling registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    F, M, MCNEMAR_SPLIT_MS, _docs, sampling, selection, testdata,
)


def register(q):

    # deterministic per-epoch corpus permutation (two-phase global
    # ordering — no Exchange SinglePartition; plan pinned in test_plans)
    q["sample_epoch_shuffle"] = lambda spark, sf: sampling.epoch_shuffle(
        _docs(spark, sf), epoch=1
    )
    q["sample_stratified"] = lambda spark, sf: sampling.hash_stratified_sample(
        testdata.events_metric(spark, sf).select(
            "event_id", "event_type", "user_id", "timestamp", "value"
        ),
        id_col="event_id",
        strata_col="event_type",
        rates={"purchase": 1.0, "click": 0.1},
        default_rate=0.01,
    )
    q["sample_split"] = lambda spark, sf: sampling.train_val_test_split(
        testdata.table(spark, sf, "events").select("event_id"),
        id_col="event_id",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    q["sample_per_group"] = lambda spark, sf: sampling.sample_per_group(
        testdata.table(spark, sf, "events").select("event_id", "event_type"),
        group_col="event_type",
        id_col="event_id",
        k=100,
    )
    q["sample_weighted"] = lambda spark, sf: sampling.hash_weighted_sample(
        testdata.events_metric(spark, sf)
        .select("event_id", (F.col("value") / 500.0).alias("weight")),
        id_col="event_id",
        weight_col="weight",
    ).select("event_id", F.round("weight", 6).alias("weight"))
    q["sample_neyman"] = lambda spark, sf: sampling.neyman_allocation(
        _docs(spark, sf), stratum="source", value="n_chars", total_n=1000
    )
    q["sample_pps_systematic"] = lambda spark, sf: sampling.pps_systematic(
        _docs(spark, sf).select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("tok"),
        ),
        id_col="doc_id", size="tok", n=1000,
    )
    q["sample_dsir"] = lambda spark, sf: selection.dsir_sample(
        _docs(spark, sf), F.col("lang") == "en", k=100
    )
    q["sample_domain_mix"] = lambda spark, sf: selection.domain_mixture(
        _docs(spark, sf), alpha=0.5
    )
    q["sample_neyman_apply"] = (
        lambda spark, sf: sampling.neyman_stratified_sample(
            _docs(spark, sf), stratum="source", value="n_chars",
            id_col="doc_id", total_n=100,
        )
    )
    q["sample_class_balance"] = lambda spark, sf: sampling.class_balance(
        _docs(spark, sf).filter(F.col("lang").isNotNull()),
        id_col="doc_id", positive=F.col("lang") == "de", ratio=1.0,
    )
    q["sample_time_split"] = lambda spark, sf: sampling.time_split_embargo(
        testdata.events_metric(spark, sf).select("event_id", "timestamp"),
        id_col="event_id", ts="timestamp",
        split_ms=MCNEMAR_SPLIT_MS, embargo_ms=604_800_000,
    )

    def _ht(spark, sf):
        ev = testdata.events_metric(spark, sf)
        return sampling.ht_estimate(
            ev.withColumn("weight", F.col("value") / 500.0),
            "event_id", "value", "weight",
        )

    q["sample_ht_estimate"] = _ht
    q["sample_token_budget"] = lambda spark, sf: selection.select_token_budget(
        _docs(spark, sf).select(
            "doc_id", "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("tok"),
        ),
        quality="n_chars", tokens="tok", budget=15_000,
    )
    q["sample_ess"] = lambda spark, sf: selection.importance_ess(
        selection.dsir_weights(_docs(spark, sf), F.col("lang") == "en")
    )


def register_oracles(o):
    # DSIR (hashed unigram LM ratio + deterministic Gumbel top-k) — the
    # same arithmetic relationally: per-bucket counts, add-1 smoothing,
    # md5-derived uniform per doc
    o["sample_dsir"] = """
WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split(text, ' ')) AS t FROM documents),
tb AS (SELECT doc_id, tgt,
       cast(concat('0x', substr(md5(t), 1, 15)) AS bigint) % 8192 AS b FROM tok),
cnt AS (SELECT b, count(*) AS cr, count(*) FILTER (tgt) AS ct FROM tb GROUP BY b),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnt),
ratio AS (SELECT b, ln(ct + 1) - ln(tt + 8192) - ln(cr + 1) + ln(tr + 8192) AS lam
          FROM cnt, tot),
dw AS (SELECT doc_id, sum(lam) AS logw FROM tb JOIN ratio USING (b) GROUP BY doc_id),
g AS (SELECT doc_id, logw,
      -ln(-ln((cast(concat('0x', substr(md5(cast(doc_id AS varchar)), 1, 15)) AS bigint)
               % 1000000 + 0.5) / 1000000.0)) AS gum
      FROM dw)
SELECT doc_id, round(logw, 4) AS dsir_logweight, round(logw + gum, 4) AS sample_key
FROM g ORDER BY logw + gum DESC, doc_id LIMIT 100
"""
    # temperature rebalancing: same rate formula relationally; the
    # copy count is an exact integer given the (rounded-stable) rate
    o["sample_domain_mix"] = """
WITH d AS (SELECT doc_id, source,
           cast(len(string_split(text, ' ')) AS bigint) AS nt FROM documents),
ps AS (SELECT source, sum(nt) AS ts FROM d GROUP BY source),
w AS (SELECT sum(pow(ts, 0.5)) AS wsum, sum(ts) AS total FROM ps),
r AS (SELECT source, total * pow(ts, 0.5) / wsum / ts AS rate FROM ps, w),
dd AS (SELECT doc_id, d.source AS source, rate,
       (cast(concat('0x', substr(md5(cast(doc_id AS varchar)), 1, 15)) AS bigint)
        % 1000000 + 0.5) / 1000000.0 AS u
       FROM d JOIN r USING (source)),
n AS (SELECT doc_id, source, rate,
      cast(floor(rate) AS bigint)
      + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS nc FROM dd)
SELECT doc_id, source, unnest(generate_series(1, nc)) AS copy_idx,
       round(rate, 6) AS rate
FROM n WHERE nc > 0
"""
    # allocation identical to sample_neyman (round-6 BEFORE the floor,
    # mirroring the Spark side); md5-of-id order is engine-portable
    o["sample_neyman_apply"] = """
WITH g AS (SELECT source, cast(count(*) AS bigint) AS n_rows,
                  stddev_samp(cast(n_chars AS double)) AS s
           FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL
           GROUP BY 1 HAVING count(*) >= 2),
t AS (SELECT sum(n_rows * s) AS tot FROM g),
al AS (SELECT source,
              cast(floor(round(100.0 * (n_rows * s) / t.tot, 6))
                AS bigint) AS take
       FROM g, t),
d AS (SELECT doc_id, source, n_chars FROM documents
      WHERE doc_id IS NOT NULL AND source IS NOT NULL
        AND n_chars IS NOT NULL),
r AS (SELECT *, row_number() OVER
        (PARTITION BY source
         ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rk
      FROM d)
SELECT doc_id, source, n_chars FROM r JOIN al USING (source)
WHERE rk <= take
"""
    # pure integer multiplicative hash — reproducible in any engine
    o["sample_stratified"] = """
WITH m AS (SELECT event_id, event_type, user_id, epoch_ms(ts) AS timestamp, value
           FROM events)
SELECT * FROM m
WHERE (event_id * 2654435761) % 4294967296 % 1000 <
      CASE event_type WHEN 'purchase' THEN 1000 WHEN 'click' THEN 100 ELSE 10 END
"""
    o["sample_split"] = """
SELECT event_id,
       CASE WHEN slot < 800 THEN 'train'
            WHEN slot < 900 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT event_id,
             (event_id * 2654435761) % 4294967296 % 1000 AS slot FROM events)
"""
    o["sample_per_group"] = """
WITH r AS (SELECT event_id, event_type,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY (event_id * 2654435761) % 4294967296 % 1000000000 ASC,
                             event_id ASC) AS rn
           FROM events)
SELECT event_id, event_type FROM r WHERE rn <= 100
"""
    # epoch key mirrors sampling._slot's portable multiplicative hash;
    # two-round epoch key (mul32 → xor-shift → mul32), epoch=1; HUGEINT
    # for the second product (h1 can reach 2^32-1, so h1*PRIME2
    # overflows int64 — the Spark side splits the multiply instead)
    o["sample_epoch_shuffle"] = """
WITH x AS (SELECT doc_id, (doc_id + 2147483647) % 4294967296 AS xv FROM documents),
h AS (SELECT doc_id,
             cast((xv::HUGEINT * 2654435761) % 4294967296 AS bigint) AS h1
      FROM x),
kk AS (SELECT doc_id,
              cast((xor(h1, h1 >> 16)::HUGEINT * 2246822519) % 4294967296
                   AS bigint) AS k
       FROM h)
SELECT doc_id, cast(row_number() OVER (ORDER BY k, doc_id) - 1 AS bigint) AS pos
FROM kk
"""
    # operator casts weight*denom double->long (truncation == floor for
    # positive weights); the oracle floors explicitly since DuckDB CAST
    # rounds instead
    o["sample_weighted"] = f"""
{M}
SELECT event_id, round(value / 500.0, 6) AS weight FROM m
WHERE (event_id * 2654435761) % 4294967296 % 1000
      < floor((value / 500.0) * 1000)
"""
    o["sample_time_split"] = f"""
SELECT event_id, epoch_ms(ts) AS timestamp,
       CASE WHEN epoch_ms(ts) < {MCNEMAR_SPLIT_MS} THEN 'train'
            WHEN epoch_ms(ts) >= {MCNEMAR_SPLIT_MS} + 604800000
            THEN 'test' END AS split
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL
  AND (epoch_ms(ts) < {MCNEMAR_SPLIT_MS}
       OR epoch_ms(ts) >= {MCNEMAR_SPLIT_MS} + 604800000)
"""
    o["sample_neyman"] = """
WITH g AS (SELECT source, cast(count(*) AS bigint) AS n_rows,
                  stddev_samp(cast(n_chars AS double)) AS s
           FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL
           GROUP BY 1 HAVING count(*) >= 2),
t AS (SELECT sum(n_rows * s) AS tot FROM g)
SELECT source, n_rows, round(s, 6) AS std,
       round((n_rows * s) / t.tot, 6) AS alloc_share,
       round(1000.0 * (n_rows * s) / t.tot, 6) AS n_alloc
FROM g, t
"""
    # cumulative-size systematic PPS: hit count is closed-form floor
    # arithmetic on each item's (cum_before, cum] size interval
    o["sample_pps_systematic"] = """
WITH d AS (SELECT doc_id, cast(len(string_split(text, ' ')) AS bigint) AS sz
           FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
c AS (SELECT doc_id, sz, sum(sz) OVER (ORDER BY doc_id) AS cum FROM d),
t AS (SELECT cast(sum(sz) AS bigint) AS tot FROM d),
sel AS (SELECT doc_id, sz,
               cast(floor((2000 * cum - t.tot) / (2.0 * t.tot))
                    - floor((2000 * (cum - sz) - t.tot) / (2.0 * t.tot))
                 AS bigint) AS n_hits
        FROM c, t)
SELECT doc_id, sz AS size, n_hits FROM sel WHERE n_hits > 0
"""
    o["sample_ht_estimate"] = f"""
{M},
b AS (SELECT event_id AS id, value AS v,
             cast(floor((value / 500.0) * 1000) AS bigint) AS k
      FROM m WHERE value IS NOT NULL),
s AS (SELECT *,
             k >= 1 AS covered,
             k >= 1 AND (id * 2654435761) % 4294967296 % 1000 < k AS sampled
      FROM b)
SELECT count(*) AS n_total,
       count(CASE WHEN covered THEN 1 END) AS n_covered,
       count(CASE WHEN sampled THEN 1 END) AS n_sampled,
       round(sum(v), 3) AS true_sum,
       round(sum(CASE WHEN covered THEN v END), 3) AS covered_sum,
       round(sum(CASE WHEN sampled THEN v * 1000 / k END), 3) AS ht_sum,
       round((sum(CASE WHEN sampled THEN v * 1000 / k END)
              - sum(CASE WHEN covered THEN v END))
             / sum(CASE WHEN covered THEN v END), 6) AS rel_err
FROM s
"""
    o["sample_token_budget"] = """
WITH d AS (SELECT doc_id, n_chars AS q,
                  cast(len(string_split(text, ' ')) AS bigint) AS tok
           FROM documents
           WHERE n_chars IS NOT NULL AND text IS NOT NULL
             AND doc_id IS NOT NULL),
cls AS (SELECT q, sum(tok) AS ct FROM d GROUP BY 1),
cum AS (SELECT q, sum(ct) OVER (ORDER BY q DESC) AS c FROM cls),
keep AS (SELECT q FROM cum WHERE c <= 15000)
SELECT doc_id, q AS n_chars, tok AS n_tokens FROM d JOIN keep USING (q)
"""
    o["sample_class_balance"] = """
WITH d AS (SELECT doc_id, lang = 'de' AS is_pos FROM documents
           WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
c AS (SELECT cast(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS bigint)
               AS np,
             cast(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS bigint)
               AS nneg
      FROM d),
r AS (SELECT cast(trunc(least(1.0, 1.0 * np / nneg) * 1000000)
               AS bigint) AS rs FROM c)
SELECT doc_id, is_pos FROM d, r
WHERE is_pos OR (doc_id * 2654435761) % 4294967296 % 1000000 < rs
"""
    o["sample_ess"] = """
WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split(text, ' ')) AS t FROM documents),
tb AS (SELECT doc_id, tgt,
       cast(concat('0x', substr(md5(t), 1, 15)) AS bigint) % 8192 AS b
       FROM tok),
cnt AS (SELECT b, count(*) AS cr, count(*) FILTER (tgt) AS ct FROM tb
        GROUP BY b),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnt),
ratio AS (SELECT b,
                 ln(ct + 1) - ln(tt + 8192) - ln(cr + 1) + ln(tr + 8192)
                   AS lam
          FROM cnt, tot),
dw AS (SELECT doc_id, sum(lam) AS logw FROM tb JOIN ratio USING (b)
       GROUP BY doc_id),
mx AS (SELECT max(logw) AS m FROM dw),
s AS (SELECT cast(count(*) AS bigint) AS n,
             sum(exp(logw - m)) AS s1,
             sum(exp(logw - m) * exp(logw - m)) AS s2,
             quantile_cont(exp(logw - m), 0.99) AS c
      FROM dw, mx),
cl AS (SELECT sum(least(exp(logw - m), (SELECT c FROM s))) AS cs1,
              sum(least(exp(logw - m), (SELECT c FROM s))
                  * least(exp(logw - m), (SELECT c FROM s))) AS cs2
       FROM dw, mx)
SELECT n, round(s1 * s1 / nullif(s2, 0), 6) AS ess,
       round(s1 * s1 / nullif(s2, 0) / n, 6) AS ess_frac,
       round(c, 6) AS clip_w,
       round(cs1 * cs1 / nullif(cs2, 0), 6) AS ess_clipped,
       round(cs1 * cs1 / nullif(cs2, 0) / n, 6) AS ess_clipped_frac
FROM s, cl
"""
