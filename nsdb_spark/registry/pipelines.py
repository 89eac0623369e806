"""pipelines registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    F, _MM_ORACLE, _PAIR_GUARD_FLOOR, _PAIR_GUARD_FRAC, _docs, _round,
    _stoplist_sql, dedup, multimodal, packing, profiling, selection,
    testdata, text,
)


def register(q):

    # full pretraining-corpus pipeline: quality/lang filter → exact dedup
    # → guarded near-dup clustering (keep each cluster's min doc) →
    # benchmark decontamination → sequence packing. Every stage is an
    # already-oracled operator; the composite is hash-checked end-to-end.
    def _pipeline_pretrain(spark, sf):
        import math as _math

        docs = _docs(spark, sf)
        # id frames are tiny — materialize each stage's survivor set once
        # instead of recomputing the upstream stages per consumer
        surv_ids = (
            text.clean_corpus(docs, lang="en", min_quality=0.3)
            .select("doc_id").localCheckpoint(eager=True)
        )
        surv = docs.join(surv_ids, "doc_id")
        # the module-wide stop-shingle guard formula, over the survivor
        # set (not the full corpus like _pair_guard_limit). Counting the
        # checkpointed id frame — docs⋈surv_ids is 1:1 on doc_id, so the
        # count is identical and the join job is saved.
        cap = max(
            _PAIR_GUARD_FLOOR, _math.ceil(_PAIR_GUARD_FRAC * surv_ids.count())
        )
        pairs = dedup.ngram_jaccard_pairs(
            surv, n=3, threshold=0.5, stop_shingle_df_limit=cap
        )
        clusters = dedup.connected_components(pairs, surv.select("doc_id"))
        reps = (
            clusters.filter(F.col("doc_id") == F.col("cluster_id"))
            .filter(F.col("doc_id") % 10 != 0)
            .select("doc_id").localCheckpoint(eager=True)
        )
        corpus = docs.join(reps, "doc_id")
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        contaminated = (
            dedup.decontaminate(corpus, bench, n=4)
            .filter(F.col("matched_ngrams") >= 3)
            .select("doc_id")
        )
        final = corpus.join(contaminated, "doc_id", "left_anti")
        return packing.pack_sequences(final, budget=512)

    q["pipeline_pretrain_corpus"] = _pipeline_pretrain
    q["pipeline_clean_corpus"] = lambda spark, sf: _round(
        text.clean_corpus(_docs(spark, sf), lang="en", min_quality=0.3),
        {"quality": 6},
    )
    q["pack_sequences"] = lambda spark, sf: packing.pack_sequences(
        _docs(spark, sf), budget=512
    )

    # --- multimodal plumbing ---
    q["mm_decode_metadata"] = lambda spark, sf: multimodal.document_media_metadata(
        _docs(spark, sf)
    )
    q["mm_resize"] = lambda spark, sf: multimodal.resize_media(
        multimodal.attach_binary(_docs(spark, sf)), target_w=32, target_h=32
    )
    q["mm_frame_sample"] = lambda spark, sf: multimodal.sample_frames(
        multimodal.attach_binary(_docs(spark, sf)), frame_bytes=64, every=4
    )
    q["mm_features"] = lambda spark, sf: multimodal.extract_features(
        multimodal.attach_binary(_docs(spark, sf))
    )

    def _pipeline_select(spark, sf):
        # the KEEP-side pipeline composed end-to-end: LR-quality gate →
        # DSIR in-domain top-k → domain-temperature mixture; every stage
        # is an already-oracled operator, the chain is hash-checked
        docs = _docs(spark, sf)
        kept_ids = (
            selection.quality_score_lr(docs)
            .filter("keep")
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        kept = docs.join(kept_ids, "doc_id")
        chosen = (
            selection.dsir_sample(kept, F.col("lang") == "en", k=200)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        return selection.domain_mixture(docs.join(chosen, "doc_id"), alpha=0.5)

    q["pipeline_select_corpus"] = _pipeline_select
    def _source_scorecard(spark, sf):
        """Composite: one quality row per source — readability, lexical
        richness, PII exposure, and size — each stage an oracled
        operator, joined on the |sources|-row grain."""
        docs = _docs(spark, sf)
        read = text.readability(docs).join(
            docs.select("doc_id", "source"), "doc_id"
        ).groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("flesch"), 6).alias("avg_flesch"),
            F.round(F.avg(F.col("n_words").cast("double")), 6).alias(
                "avg_words"
            ),
        )
        hap = text.hapax_by_source(docs).select("source", "hapax_ratio")
        pii = text.pii_scrub(docs).join(
            docs.select("doc_id", "source"), "doc_id"
        ).groupBy("source").agg(
            F.sum(
                (
                    (F.col("n_email") + F.col("n_phone") + F.col("n_url")
                     + F.col("n_long_digits")) > 0
                ).cast("long")
            ).alias("n_pii_docs")
        )
        return (
            read.join(hap, "source").join(pii, "source")
            .select(
                "source", "n_docs", "avg_flesch", "avg_words",
                "hapax_ratio", "n_pii_docs",
            )
        )

    q["pipeline_source_scorecard"] = _source_scorecard

    # --- data profiling / quality auditing (round 6) ---
    q["profile_columns"] = lambda spark, sf: profiling.column_profile(
        testdata.table(spark, sf, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )
    q["profile_moments"] = lambda spark, sf: profiling.numeric_moments(
        testdata.table(spark, sf, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    q["profile_fk_orphans"] = lambda spark, sf: profiling.fk_orphans([
        ("orders->customer", testdata.table(spark, sf, "orders"), "o_custkey",
         testdata.table(spark, sf, "customer"), "c_custkey"),
        ("lineitem->orders", testdata.table(spark, sf, "lineitem"), "l_orderkey",
         testdata.table(spark, sf, "orders"), "o_orderkey"),
        ("lineitem->part", testdata.table(spark, sf, "lineitem"), "l_partkey",
         testdata.table(spark, sf, "part"), "p_partkey"),
    ])
    q["profile_pk_unique"] = lambda spark, sf: profiling.pk_duplicates([
        ("customer", testdata.table(spark, sf, "customer"), "c_custkey"),
        ("documents", testdata.table(spark, sf, "documents"), "doc_id"),
        ("events", testdata.table(spark, sf, "events"), "event_id"),
        ("orders", testdata.table(spark, sf, "orders"), "o_orderkey"),
        ("part", testdata.table(spark, sf, "part"), "p_partkey"),
    ])
    q["profile_daily_completeness"] = lambda spark, sf: profiling.daily_completeness(
        testdata.table(spark, sf, "events"), "ts"
    )
    q["profile_weekly_drift"] = lambda spark, sf: profiling.weekly_drift(
        testdata.table(spark, sf, "events"), "value", "ts"
    )


def register_oracles(o):
    # the three selection stages composed relationally (same hashes /
    # smoothing / rate arithmetic as the standalone oracles)
    o["pipeline_select_corpus"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks, lang, source
           FROM documents),
q AS (SELECT doc_id,
      cast(list_sum(list_transform(toks, t ->
         (cast(concat('0x', substr(md5(t), 1, 15)) AS bigint) % 4096)
         * 2654435761 % 2001 - 1000)) AS bigint) AS lm FROM w),
kept AS (SELECT w.* FROM w JOIN q USING (doc_id) WHERE lm > 0),
tok AS (SELECT doc_id, lang = 'en' AS tgt, unnest(toks) AS t FROM kept),
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
      FROM dw),
sel AS (SELECT doc_id FROM g ORDER BY logw + gum DESC, doc_id LIMIT 200),
d AS (SELECT kept.doc_id, kept.source, cast(len(kept.toks) AS bigint) AS nt
      FROM kept JOIN sel USING (doc_id)),
ps AS (SELECT source, sum(nt) AS ts FROM d GROUP BY source),
wsm AS (SELECT sum(pow(ts, 0.5)) AS wsum, sum(ts) AS total FROM ps),
r AS (SELECT source, total * pow(ts, 0.5) / wsum / ts AS rate FROM ps, wsm),
dd AS (SELECT d.doc_id, d.source, rate,
       (cast(concat('0x', substr(md5(cast(d.doc_id AS varchar)), 1, 15)) AS bigint)
        % 1000000 + 0.5) / 1000000.0 AS u
       FROM d JOIN r USING (source)),
n AS (SELECT doc_id, source, rate,
      cast(floor(rate) AS bigint)
      + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS nc FROM dd)
SELECT doc_id, source, unnest(generate_series(1, nc)) AS copy_idx,
       round(rate, 6) AS rate
FROM n WHERE nc > 0
"""
    o["pipeline_clean_corpus"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words, text FROM documents),
ls AS (SELECT doc_id, {", ".join(
        f"len(list_distinct(list_intersect(words, {_stoplist_sql(lang)}))) AS s_{lang}"
        for lang in text.LANG_ORDER)} FROM w),
lang AS (SELECT doc_id, CASE {" ".join(
        f"WHEN s_{lang} = greatest({', '.join('s_' + x for x in text.LANG_ORDER)}) THEN '{lang}'"
        for lang in text.LANG_ORDER)} END AS pred_lang FROM ls),
qs AS (SELECT doc_id, len(words) AS nw, len(list_distinct(words)) AS nd,
              len(list_distinct(list_intersect(words, {_stoplist_sql('en')}))) AS sh
       FROM w),
qual AS (SELECT doc_id,
                round(0.4*(sh/nw) + 0.3*(nd/nw) + 0.3*least(nw/100.0, 1.0), 6) AS quality
         FROM qs),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT lang.doc_id AS doc_id, pred_lang, quality
FROM lang JOIN qual USING (doc_id) JOIN keep USING (doc_id)
WHERE pred_lang = 'en' AND quality >= 0.3
"""
    # the composite pipeline replays every stage's proven fragment over
    # the running survivor set: clean_corpus filter → capped shingle
    # pair join → recursive CC (min-label reps) → 4-gram
    # decontamination → order-by-doc_id sequence packing
    o["pipeline_pretrain_corpus"] = f"""
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS words, text FROM documents),
ls AS (SELECT doc_id, {", ".join(
        f"len(list_distinct(list_intersect(words, {_stoplist_sql(lang)}))) AS s_{lang}"
        for lang in text.LANG_ORDER)} FROM w),
lang AS (SELECT doc_id, CASE {" ".join(
        f"WHEN s_{lang} = greatest({', '.join('s_' + x for x in text.LANG_ORDER)}) THEN '{lang}'"
        for lang in text.LANG_ORDER)} END AS pred_lang FROM ls),
qs AS (SELECT doc_id, len(words) AS nw, len(list_distinct(words)) AS nd,
              len(list_distinct(list_intersect(words, {_stoplist_sql('en')}))) AS sh
       FROM w),
qual AS (SELECT doc_id,
                round(0.4*(sh/nw) + 0.3*(nd/nw) + 0.3*least(nw/100.0, 1.0), 6) AS quality
         FROM qs),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
surv AS (SELECT lang.doc_id AS doc_id
         FROM lang JOIN qual USING (doc_id) JOIN keep USING (doc_id)
         WHERE pred_lang = 'en' AND quality >= 0.3),
sw AS (SELECT w.doc_id, w.words FROM w JOIN surv USING (doc_id)),
shg AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(words) >= 3
        THEN list_transform(generate_series(1, cast(len(words)-2 AS bigint)),
                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        ELSE [array_to_string(words, ' ')] END)) AS sh FROM sw),
hot AS (SELECT sh FROM shg GROUP BY sh
        HAVING count(*) > greatest({_PAIR_GUARD_FLOOR},
               cast(ceil({_PAIR_GUARD_FRAC} * (SELECT count(*) FROM surv)) AS bigint))),
sg AS (SELECT shg.doc_id, shg.sh FROM shg ANTI JOIN hot USING (sh)),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sg GROUP BY doc_id),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM sg a JOIN sg b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
prs AS (SELECT doc_a, doc_b
        FROM p JOIN cnt ca ON p.doc_a = ca.doc_id JOIN cnt cb ON p.doc_b = cb.doc_id
        WHERE round(common / (ca.n_sh + cb.n_sh - common), 6) >= 0.5),
edges AS (SELECT doc_a AS s, doc_b AS d FROM prs
          UNION ALL SELECT doc_b, doc_a FROM prs),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM surv
  UNION
  SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.node
),
clus AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
reps AS (SELECT doc_id FROM clus WHERE doc_id = cluster_id AND doc_id % 10 <> 0),
g4 AS (SELECT w.doc_id, unnest(list_distinct(CASE WHEN len(words) >= 4
        THEN list_transform(generate_series(1, cast(len(words)-3 AS bigint)),
                            i -> array_to_string(words[i:i+3], ' '))
        ELSE [array_to_string(words, ' ')] END)) AS gram FROM w),
bgr AS (SELECT DISTINCT gram FROM g4 WHERE doc_id % 10 = 0),
cont AS (SELECT g4.doc_id FROM g4 JOIN reps USING (doc_id) JOIN bgr USING (gram)
         GROUP BY g4.doc_id HAVING count(DISTINCT g4.gram) >= 3),
final AS (SELECT doc_id FROM reps ANTI JOIN cont USING (doc_id)),
d AS (SELECT f.doc_id, cast(len(string_split(doc.text, ' ')) AS bigint) AS n
      FROM final f JOIN documents doc USING (doc_id)),
cum AS (SELECT doc_id, n,
             cast(sum(n) OVER (ORDER BY doc_id) - n AS bigint) AS start
        FROM d)
SELECT doc_id, chunk_id, start,
       least(start + n, (chunk_id + 1) * 512)
         - greatest(start, chunk_id * 512) AS tokens_in_chunk
FROM cum, unnest(generate_series(start // 512, (start + n - 1) // 512))
       AS u(chunk_id)
"""
    o["pack_sequences"] = """
WITH d AS (SELECT doc_id, cast(len(string_split(text, ' ')) AS bigint) AS n
           FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id, n,
             cast(sum(n) OVER (ORDER BY doc_id) - n AS bigint) AS start
      FROM d)
SELECT doc_id, chunk_id, start,
       least(start + n, (chunk_id + 1) * 512)
         - greatest(start, chunk_id * 512) AS tokens_in_chunk
FROM c, unnest(generate_series(start // 512, (start + n - 1) // 512))
       AS u(chunk_id)
"""
    o["mm_decode_metadata"] = _MM_ORACLE
    o["mm_resize"] = """
SELECT doc_id, cast(least(strlen(text), 1024) AS int) AS out_bytes,
       md5(substr(text, 1, 1024)) AS payload_digest
FROM documents
"""
    o["mm_features"] = """
WITH d AS (SELECT doc_id, text FROM documents),
ch AS (SELECT doc_id, ascii(substr(text, cast(i AS int), 1)) AS b
       FROM d, unnest(generate_series(1, strlen(text))) AS t(i)),
g AS (SELECT doc_id, b // 32 AS bk, count(*) AS c FROM ch GROUP BY 1, 2),
grid AS (SELECT d.doc_id, t.bk FROM d, unnest(generate_series(0, 7)) AS t(bk)),
hist AS (SELECT grid.doc_id,
                string_agg(coalesce(g.c, 0), ',' ORDER BY grid.bk) AS hs
         FROM grid LEFT JOIN g ON grid.doc_id = g.doc_id AND grid.bk = g.bk
         GROUP BY grid.doc_id),
stats AS (SELECT doc_id, count(*) AS n_bytes, avg(b) AS mean_byte FROM ch GROUP BY doc_id)
SELECT d.doc_id AS doc_id,
       cast(coalesce(stats.n_bytes, 0) AS int) AS n_bytes,
       round(coalesce(stats.mean_byte, 0.0), 6) AS mean_byte,
       md5(hist.hs) AS feat_digest
FROM d JOIN hist USING (doc_id) LEFT JOIN stats USING (doc_id)
"""
    o["mm_frame_sample"] = """
WITH d AS (SELECT doc_id, text, cast(ceil(strlen(text)/64.0) AS bigint) AS nf
           FROM documents WHERE strlen(text) > 0),
f AS (SELECT doc_id, text, unnest(generate_series(0, nf-1, 4)) AS i FROM d)
SELECT doc_id, cast(i AS int) AS frame_idx,
       md5(substr(text, cast(i*64+1 AS int), 64)) AS frame_digest
FROM f
"""
    o["pipeline_source_scorecard"] = """
WITH read AS (SELECT d.source, count(*)::BIGINT AS n_docs,
                     round(avg(206.835
                        - 1.015 * len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        - 84.6 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
                          / nullif(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 0)),
                        6) AS avg_flesch,
                     round(avg(len(regexp_extract_all(text, '[A-Za-z0-9]+'))::DOUBLE),
                        6) AS avg_words
              FROM documents d WHERE text IS NOT NULL AND source IS NOT NULL
              GROUP BY d.source),
toks AS (SELECT source, tok
         FROM (SELECT source,
                      unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
         WHERE tok <> ''),
per AS (SELECT source, tok, count(*)::BIGINT AS n FROM toks
        GROUP BY source, tok),
hap AS (SELECT source,
               round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                     / nullif(count(*), 0)::DOUBLE, 6) AS hapax_ratio
        FROM per GROUP BY source),
pii AS (SELECT source,
               sum(CASE WHEN len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   + len(regexp_extract_all(text,
                     '[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}'))
                   + len(regexp_extract_all(text, 'https?://[^\\s]+'))
                   + len(regexp_extract_all(text, '[0-9]{9,}')) > 0
                   THEN 1 ELSE 0 END)::BIGINT AS n_pii_docs
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        GROUP BY source)
SELECT read.source, n_docs, avg_flesch, avg_words, hapax_ratio, n_pii_docs
FROM read JOIN hap ON read.source = hap.source
JOIN pii ON read.source = pii.source
"""

    # --- data profiling / quality auditing (round 6) ---
    def _col_profile_sql(table: str, cols: list[str]) -> str:
        parts = [
            f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, "
            f"round((count(*) - count({c})) * 1.0 / count(*), 6) AS null_frac, "
            f"count(DISTINCT {c}) AS n_distinct FROM {table}"
            for c in cols
        ]
        return " UNION ALL ".join(parts) + " ORDER BY col_name"

    o["profile_columns"] = _col_profile_sql(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )

    def _moments_sql(table: str, cols: list[str]) -> str:
        parts = []
        for c in cols:
            parts.append(f"""
SELECT '{c}' AS col_name, cnt AS n_values,
       round(m1, 6) AS mean,
       round(sqrt(m2 - m1*m1), 6) AS std_pop,
       round((m3 - 3*m1*m2 + 2*m1*m1*m1) / pow(m2 - m1*m1, 1.5), 6) AS skewness,
       round((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*pow(m1, 4))
             / pow(m2 - m1*m1, 2) - 3, 6) AS excess_kurtosis
FROM (SELECT count({c})::BIGINT AS cnt, avg({c}::DOUBLE) AS m1,
             avg(({c}::DOUBLE)*({c}::DOUBLE)) AS m2,
             avg(({c}::DOUBLE)*({c}::DOUBLE)*({c}::DOUBLE)) AS m3,
             avg(({c}::DOUBLE)*({c}::DOUBLE)*({c}::DOUBLE)*({c}::DOUBLE)) AS m4
      FROM {table}) s""")
        return " UNION ALL ".join(parts) + " ORDER BY col_name"

    o["profile_moments"] = _moments_sql(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    o["profile_fk_orphans"] = """
WITH rel AS (
  SELECT 'orders->customer' AS relation,
         (SELECT count(*) FROM orders) AS n_child,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_fk,
         (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
  UNION ALL
  SELECT 'lineitem->orders',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
         (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
         (SELECT count(*) FROM lineitem l WHERE l_partkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
)
SELECT relation, n_child, n_null_fk, n_orphans,
       round(n_orphans * 1.0 / n_child, 6) AS orphan_frac
FROM rel ORDER BY relation
"""

    def _pk_sql(label: str, table: str, key: str) -> str:
        return f"""
SELECT '{label}' AS table_name, sum(c)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_keys,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_keys,
       sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_rows,
       max(c)::BIGINT AS max_multiplicity
FROM (SELECT {key}, count(*) AS c FROM {table} GROUP BY {key})"""

    o["profile_pk_unique"] = " UNION ALL ".join([
        _pk_sql("customer", "customer", "c_custkey"),
        _pk_sql("documents", "documents", "doc_id"),
        _pk_sql("events", "events", "event_id"),
        _pk_sql("orders", "orders", "o_orderkey"),
        _pk_sql("part", "part", "p_partkey"),
    ]) + " ORDER BY table_name"
    o["profile_daily_completeness"] = """
WITH days AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows
              FROM events GROUP BY 1),
axis AS (SELECT unnest(generate_series((SELECT min(day) FROM days),
                                       (SELECT max(day) FROM days),
                                       INTERVAL 1 DAY))::DATE AS day),
filled AS (SELECT a.day, coalesce(d.n_rows, 0) AS n_rows
           FROM axis a LEFT JOIN days d USING (day)),
summ AS (SELECT count(*) AS n_days_span,
                sum(CASE WHEN n_rows = 0 THEN 1 ELSE 0 END) AS n_empty_days,
                max(n_rows) AS max_daily
         FROM filled)
SELECT strftime(f.day, '%Y-%m-%d') AS day, f.n_rows,
       s.n_days_span::BIGINT AS n_days_span,
       s.n_empty_days::BIGINT AS n_empty_days,
       s.max_daily::BIGINT AS max_daily
FROM filled f, summ s ORDER BY day
"""
    o["profile_weekly_drift"] = """
WITH b AS (SELECT weekofyear(ts) AS week,
                  least(greatest(CAST(floor(value / 100.0) AS BIGINT), 0), 9) AS bin
           FROM events),
wk AS (SELECT week, bin, count(*) AS c FROM b GROUP BY week, bin),
wk_tot AS (SELECT week, sum(c) AS wn FROM wk GROUP BY week),
gl AS (SELECT bin, sum(c) AS g FROM wk GROUP BY bin),
gl_tot AS (SELECT sum(g) AS gn FROM gl),
grid AS (SELECT t.week, t.wn, g.bin, g.g, gt.gn
         FROM wk_tot t CROSS JOIN gl g CROSS JOIN gl_tot gt),
j AS (SELECT grid.week,
             greatest(coalesce(wk.c, 0) * 1.0 / grid.wn, 1e-6) AS pw,
             greatest(grid.g * 1.0 / grid.gn, 1e-6) AS pg
      FROM grid LEFT JOIN wk ON wk.week = grid.week AND wk.bin = grid.bin)
SELECT week, round(sum((pw - pg) * ln(pw / pg)), 6) AS psi
FROM j GROUP BY week ORDER BY week
"""
