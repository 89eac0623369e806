"""stats registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    F, M, MCNEMAR_SPLIT_MS, _docs, _emb, _stoplist_sql, analytics,
    selection, testdata, text,
)


def register(q):
    q["stats_percentiles"] = lambda spark, sf: analytics.group_percentiles(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        value="l_extendedprice",
    )
    q["stats_histogram"] = lambda spark, sf: analytics.histogram(
        testdata.events_metric(spark, sf), value="value", lo=0.0, hi=500.0,
        nbins=20,
    )
    q["stats_corr"] = lambda spark, sf: analytics.group_stats(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        x="l_quantity", y="l_extendedprice",
    )
    q["stats_psi"] = lambda spark, sf: analytics.psi_by_group(
        _docs(spark, sf), "source", "n_chars", nbins=10
    )
    # binning-free drift test: exact KS via the two-phase global-CDF
    # scan (no single-partition window — see ks_two_sample docstring)
    q["stats_ks"] = lambda spark, sf: analytics.ks_two_sample(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    q["stats_diversity"] = lambda spark, sf: analytics.category_diversity(
        _docs(spark, sf), group="source", cat="lang"
    )
    # location-shift sibling of stats_ks on the same two-phase scan;
    # doubled-rank arithmetic keeps everything in exact bigints
    q["stats_mwu"] = lambda spark, sf: analytics.mannwhitney_u(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    # unit-bearing drift metric + whole-distribution drift test, both on
    # the SAME two-phase CDF scan as stats_ks / stats_mwu
    q["stats_wasserstein"] = lambda spark, sf: analytics.wasserstein_1d(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    q["stats_cvm"] = lambda spark, sf: analytics.cvm_two_sample(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    q["stats_chi2"] = lambda spark, sf: analytics.chi2_independence(
        _docs(spark, sf), x="lang", y="source"
    )
    q["stats_robust"] = lambda spark, sf: analytics.robust_stats(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        value="l_extendedprice",
    )
    q["stats_qq"] = lambda spark, sf: analytics.qq_table(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view", n_q=20,
    )

    def _stats_runs(spark, sf):
        daily = (
            testdata.table(spark, sf, "orders")
            .filter(F.col("o_orderdate").isNotNull())
            .groupBy(F.to_date("o_orderdate").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
        )
        return analytics.runs_test(daily, value="n_orders", order="day")

    q["stats_runs"] = _stats_runs
    q["stats_ad"] = lambda spark, sf: analytics.anderson_darling_2s(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    q["stats_deming"] = lambda spark, sf: analytics.deming_regression(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        x="l_quantity", y="l_extendedprice",
    )
    q["stats_histogram_equidepth"] = lambda spark, sf: analytics.equidepth_histogram(
        testdata.events_metric(spark, sf), value="value", nbins=10
    )
    q["stats_mood"] = lambda spark, sf: analytics.mood_median_test(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type",
    )
    q["stats_kruskal"] = lambda spark, sf: analytics.kruskal_wallis(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type",
    )

    def _stats_hill(spark, sf):
        per_user = (
            testdata.table(spark, sf, "events")
            .filter(F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("double").alias("n_events"))
        )
        return analytics.hill_tail_index(per_user, value="n_events", k=200)

    q["stats_hill"] = _stats_hill
    q["stats_ccc"] = lambda spark, sf: analytics.concordance_ccc(
        testdata.table(spark, sf, "lineitem"),
        x="l_extendedprice", y="l_quantity",
    )
    q["stats_odds_ratio"] = lambda spark, sf: analytics.odds_ratio_2x2(
        testdata.table(spark, sf, "orders"),
        exposure=F.col("o_orderpriority") == "1-URGENT",
        outcome=F.col("o_orderstatus") == "F",
    )

    def _scored_docs(spark, sf):
        # deterministic quality-LR probability + the lang=='en' label:
        # the standing classifier-evaluation frame for the ML-eval pack
        docs = _docs(spark, sf)
        return selection.quality_score_lr(docs).select(
            "doc_id", "lr_prob"
        ).join(
            docs.filter(F.col("lang").isNotNull()).select(
                "doc_id", (F.col("lang") == "en").alias("y")
            ),
            "doc_id",
        )

    q["stats_auc"] = lambda spark, sf: analytics.auc_rank(
        _scored_docs(spark, sf), score="lr_prob", label="y"
    )
    q["stats_brier"] = lambda spark, sf: analytics.brier_score(
        _scored_docs(spark, sf), score="lr_prob", label="y"
    )
    q["stats_calibration"] = lambda spark, sf: analytics.calibration_bins(
        _scored_docs(spark, sf), score="lr_prob", label="y", nbins=10
    )
    q["stats_lift"] = lambda spark, sf: analytics.lift_table(
        _scored_docs(spark, sf), score="lr_prob", label="y", nbins=10
    )
    q["stats_g_test"] = lambda spark, sf: analytics.g_test_independence(
        _docs(spark, sf), x="lang", y="source"
    )
    q["stats_jarque_bera"] = lambda spark, sf: analytics.jarque_bera_by_group(
        testdata.table(spark, sf, "events"), part="event_type",
        value="value",
    )
    q["stats_tukey"] = lambda spark, sf: analytics.tukey_outlier_share(
        testdata.table(spark, sf, "events"), part="event_type",
        value="value", k=1.5,
    )
    q["stats_cvar"] = lambda spark, sf: analytics.cvar_by_group(
        testdata.table(spark, sf, "events"), part="event_type",
        value="value", p=0.95,
    )
    q["stats_cov_matrix"] = lambda spark, sf: analytics.covariance_matrix(
        testdata.table(spark, sf, "lineitem"),
        cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    q["stats_cochran_armitage"] = lambda spark, sf: analytics.cochran_armitage(
        testdata.table(spark, sf, "orders"), group="o_orderpriority",
        success=F.col("o_orderstatus") == "F",
        scores={"1-URGENT": 1.0, "2-HIGH": 2.0, "3-MEDIUM": 3.0,
                "4-NOT SPECIFIED": 4.0, "5-LOW": 5.0},
    )

    def _wilcoxon(spark, sf):
        e = testdata.events_metric(spark, sf)
        paired = (
            e.filter(
                F.col("user_id").isNotNull() & F.col("value").isNotNull()
            )
            .groupBy("user_id")
            .agg(
                F.avg(
                    F.when(
                        F.col("timestamp") < MCNEMAR_SPLIT_MS,
                        F.col("value"),
                    )
                ).alias("before"),
                F.avg(
                    F.when(
                        F.col("timestamp") >= MCNEMAR_SPLIT_MS,
                        F.col("value"),
                    )
                ).alias("after"),
            )
        )
        return analytics.wilcoxon_signed_rank(
            paired, subject="user_id", x="before", y="after"
        )

    q["stats_wilcoxon"] = _wilcoxon

    def _cohen_kappa(spark, sf):
        docs = _docs(spark, sf)
        pred = text.language_id(docs).select("doc_id", "pred_lang")
        j = docs.filter(F.col("lang").isNotNull()).select(
            "doc_id", "lang"
        ).join(pred, "doc_id")
        return analytics.cohen_kappa(j, rater_a="lang", rater_b="pred_lang")

    q["stats_cohen_kappa"] = _cohen_kappa
    q["stats_pr_curve"] = lambda spark, sf: analytics.pr_curve(
        _scored_docs(spark, sf), score="lr_prob", label="y"
    )
    q["stats_theil"] = lambda spark, sf: analytics.theil_index_by_group(
        testdata.table(spark, sf, "orders"), part="o_orderpriority",
        value="o_totalprice",
    )
    q["stats_fisher_z"] = lambda spark, sf: analytics.fisher_z_corr_diff(
        testdata.table(spark, sf, "lineitem"), group="l_returnflag",
        a="A", b="R", x="l_quantity", y="l_extendedprice",
    )

    def _bland_altman(spark, sf):
        e = testdata.events_metric(spark, sf)
        paired = (
            e.filter(
                F.col("user_id").isNotNull() & F.col("value").isNotNull()
            )
            .groupBy("user_id")
            .agg(
                F.avg(
                    F.when(
                        F.col("timestamp") < MCNEMAR_SPLIT_MS,
                        F.col("value"),
                    )
                ).alias("before"),
                F.avg(
                    F.when(
                        F.col("timestamp") >= MCNEMAR_SPLIT_MS,
                        F.col("value"),
                    )
                ).alias("after"),
            )
            .filter(
                F.col("before").isNotNull() & F.col("after").isNotNull()
            )
        )
        return analytics.bland_altman(
            paired, subject="user_id", x="before", y="after"
        )

    q["stats_bland_altman"] = _bland_altman
    q["stats_gmean"] = lambda spark, sf: analytics.pythagorean_means(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        value="l_quantity",
    )
    q["stats_cpk"] = lambda spark, sf: analytics.process_capability(
        testdata.table(spark, sf, "events"), part="event_type",
        value="value", lsl=0.0, usl=90.0,
    )
    q["stats_eta_squared"] = lambda spark, sf: analytics.eta_squared(
        testdata.table(spark, sf, "events"), part="event_type",
        value="value",
    )

    # --- round-5 additions: parametric stats, OLAP cube, mixing
    # diagnostics, embedding audit, seasonal decomposition ---
    q["stats_ttest"] = lambda spark, sf: analytics.welch_ttest(
        testdata.events_metric(spark, sf), "value", "event_type",
        "purchase", "view",
    )
    q["stats_cube"] = lambda spark, sf: analytics.cube_counts(
        testdata.table(spark, sf, "orders"),
        ["o_orderstatus", "o_orderpriority"], "o_totalprice",
    )
    q["stats_bootstrap"] = lambda spark, sf: analytics.bootstrap_mean_ci(
        testdata.events_metric(spark, sf), "value", "event_id",
        n_replicates=32,
    )
    q["stats_winsorize"] = lambda spark, sf: analytics.winsorize_by_group(
        testdata.events_metric(spark, sf), "event_type", "value",
        lo_p=0.05, hi_p=0.95,
    )
    q["stats_benford"] = lambda spark, sf: analytics.benford_digit_audit(
        testdata.events_metric(spark, sf), "value"
    )
    q["stats_basket_lift"] = lambda spark, sf: analytics.basket_pair_lift(
        testdata.table(spark, sf, "lineitem"),
        basket="l_orderkey", item="l_partkey", min_pairs=2,
    )
    q["stats_linreg"] = lambda spark, sf: analytics.linreg_by_group(
        testdata.table(spark, sf, "lineitem"), part="l_returnflag",
        x="l_quantity", y="l_extendedprice",
    )
    q["stats_anova"] = lambda spark, sf: analytics.welch_anova(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type",
    )
    q["stats_gini"] = lambda spark, sf: analytics.gini_by_group(
        testdata.table(spark, sf, "orders"), part="o_orderpriority",
        value="o_totalprice", scale=100,
    )
    q["stats_spearman"] = lambda spark, sf: analytics.spearman_corr(
        testdata.table(spark, sf, "lineitem"),
        x="l_quantity", y="l_extendedprice",
    )
    q["stats_mi"] = lambda spark, sf: analytics.mutual_information(
        testdata.table(spark, sf, "documents"), x="source", y="lang",
    )

    def _daily_orders(spark, sf):
        # collapse to one point per (priority, day) FIRST — the pair joins
        # of theil_sen/kendall are quadratic in points, so feed them
        # calendar-bounded daily counts; shared so the two entries (and
        # their oracles' identical `daily` CTE) can never desynchronize
        return (
            testdata.table(spark, sf, "orders")
            .filter(
                F.col("o_orderpriority").isNotNull()
                & F.col("o_orderdate").isNotNull()
            )
            .groupBy(
                "o_orderpriority",
                F.unix_date(F.to_date("o_orderdate")).alias("day"),
            )
            .agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
        )

    q["stats_theil_sen"] = lambda spark, sf: analytics.theil_sen_by_group(
        _daily_orders(spark, sf), part="o_orderpriority", x="day",
        y="n_orders",
    )

    q["stats_kendall"] = lambda spark, sf: analytics.kendall_tau_by_group(
        _daily_orders(spark, sf), part="o_orderpriority", x="day",
        y="n_orders",
    )
    q["stats_wilson"] = lambda spark, sf: analytics.wilson_ci_by_group(
        _docs(spark, sf), part="source", success=F.col("lang") == "en",
    )
    q["stats_zipf"] = lambda spark, sf: text.zipf_slope(
        _docs(spark, sf), top_n=100
    )
    q["stats_cohens_d"] = lambda spark, sf: analytics.cohens_d(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type", a="click", b="view",
    )
    q["stats_lorenz"] = lambda spark, sf: analytics.lorenz_deciles(
        testdata.table(spark, sf, "orders"), value="o_totalprice"
    )
    q["stats_partial_corr"] = lambda spark, sf: analytics.partial_corr(
        testdata.table(spark, sf, "lineitem"),
        x="l_quantity", y="l_extendedprice", z="l_discount",
    )
    q["stats_pct_rank"] = lambda spark, sf: analytics.midrank_pct(
        testdata.table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders")),
        id_col="o_custkey", value="n_orders",
    )
    q["stats_cramers_v"] = lambda spark, sf: analytics.chi2_independence(
        testdata.table(spark, sf, "orders"),
        x="o_orderstatus", y="o_orderpriority", effect_size=True,
    )
    q["stats_levene"] = lambda spark, sf: analytics.brown_forsythe(
        testdata.table(spark, sf, "events"), value="value",
        group="event_type",
    )

    # --- round-5 wave: inferential stats beyond the r4 families ---
    q["stats_dagostino"] = lambda spark, sf: analytics.dagostino_k2_by_group(
        testdata.table(spark, sf, "events"), part="event_type", value="value"
    )

    def _logrank_durations(spark, sf):
        ev = testdata.table(spark, sf, "events")
        t = testdata.ts_ms(ev)
        per = (
            ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
            .groupBy("user_id")
            .agg(
                (F.max(t) - F.min(t)).cast("double").alias("dur"),
                F.max((F.col("event_type") == "purchase").cast("int")).alias("pu"),
            )
            .select("dur", (F.col("pu") == 1).alias("grp"))
        )
        return analytics.log_rank_test(per, group="grp", time_col="dur")

    q["stats_logrank"] = _logrank_durations
    q["stats_cronbach"] = lambda spark, sf: analytics.cronbach_alpha(
        _emb(spark, sf).select(
            *[
                F.element_at("embedding", i).cast("double").alias(f"it{i}")
                for i in range(1, 9)
            ]
        ),
        items=[f"it{i}" for i in range(1, 9)],
    )
    q["stats_icc"] = lambda spark, sf: analytics.icc_oneway(
        testdata.table(spark, sf, "events"), part="user_id", value="value"
    )
    # timestamps are all-2024 (positive), so truncating div == floor div
    q["stats_friedman"] = lambda spark, sf: analytics.friedman_test(
        testdata.events_metric(spark, sf),
        block=F.expr("(timestamp div 86400000) * 86400000").cast("long"),
        treatment="event_type",
        value="value",
    )
    q["stats_risk_ratio"] = lambda spark, sf: analytics.risk_ratio_2x2(
        _docs(spark, sf),
        exposure=F.col("lang") == "en",
        outcome=F.col("n_chars") >= 2000,
    )
    q["stats_tost"] = lambda spark, sf: analytics.tost_equivalence(
        testdata.table(spark, sf, "events").filter(
            F.col("event_type").isin("view", "click")
        ),
        group=F.col("event_type") == "view",
        value="value",
        margin=10.0,
    )
    q["stats_ab_srm"] = lambda spark, sf: analytics.ab_srm_check(
        testdata.table(spark, sf, "events")
    )
    q["stats_bartlett"] = lambda spark, sf: analytics.bartlett_test(
        testdata.table(spark, sf, "events"), part="event_type", value="value"
    )
    q["stats_poisson_rate"] = lambda spark, sf: analytics.poisson_rate_test(
        testdata.events_metric(spark, sf), split_ms=MCNEMAR_SPLIT_MS
    )
    q["stats_bhattacharyya"] = lambda spark, sf: analytics.bhattacharyya_overlap(
        testdata.table(spark, sf, "events").filter(
            F.col("event_type").isin("view", "purchase")
        ),
        group=F.col("event_type") == "purchase",
        value="value",
        bin_width=50.0,
    )
    q["stats_jonckheere"] = lambda spark, sf: analytics.jonckheere_terpstra(
        testdata.events_metric(spark, sf),
        group_expr=F.expr("((timestamp div 3600000) % 24) div 6").cast("int"),
        value_expr=F.floor(F.col("value") / 10).cast("long"),
    )
    q["stats_somers_d"] = lambda spark, sf: analytics.somers_d(
        testdata.events_metric(spark, sf),
        x=F.expr("(timestamp div 3600000) % 24").cast("long"),
        y=F.floor(F.col("value") / 100).cast("long"),
    )
    q["stats_cohens_h"] = lambda spark, sf: analytics.cohens_h(
        _docs(spark, sf),
        exposure=F.col("lang") == "en",
        outcome=F.col("n_chars") >= 2000,
    )
    q["stats_grubbs"] = lambda spark, sf: analytics.grubbs_statistic(
        testdata.table(spark, sf, "events"), part="event_type", value="value"
    )
    q["stats_gamma"] = lambda spark, sf: analytics.gk_gamma(
        testdata.events_metric(spark, sf),
        x=F.expr("(timestamp div 3600000) % 24").cast("long"),
        y=F.floor(F.col("value") / 100).cast("long"),
    )
    q["stats_fdr_bh"] = lambda spark, sf: analytics.fdr_bh(
        testdata.events_metric(spark, sf), "value", "event_type", q=0.10
    )
    q["stats_fdr_by"] = lambda spark, sf: analytics.fdr_by(
        testdata.events_metric(spark, sf), "value", "event_type", q=0.10
    )
    q["stats_holm"] = lambda spark, sf: analytics.holm_bonferroni(
        testdata.events_metric(spark, sf), "value", "event_type", alpha=0.05
    )
    q["stats_power_two_prop"] = lambda spark, sf: analytics.power_two_prop(
        testdata.events_metric(spark, sf),
        success=F.col("value") >= 900,
        group="event_type",
    )
    q["stats_page_trend"] = lambda spark, sf: analytics.page_trend(
        testdata.events_metric(spark, sf)
    )
    q["stats_cochran_q"] = lambda spark, sf: analytics.cochran_q(
        testdata.events_metric(spark, sf),
        block="user_id", treatment="event_type",
        success=F.col("value") >= 100,
    )
    q["stats_mantel_haenszel"] = lambda spark, sf: analytics.mantel_haenszel_2x2(
        testdata.events_metric(spark, sf),
        stratum=F.expr("timestamp div 86400000"),
        exposure=F.col("user_id") % 2 == 0,
        outcome=F.col("event_type") == "purchase",
    )


def register_oracles(o):
    # midranks over the pooled distinct values; tie masses in hugeint
    # (Spark: decimal(38,0)) before the double correction
    o["stats_kruskal"] = """
WITH d AS (SELECT event_type AS g, value AS v FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
cg AS (SELECT g, v, cast(count(*) AS bigint) AS c FROM d GROUP BY 1, 2),
vc AS (SELECT v, cast(sum(c) AS bigint) AS cv FROM cg GROUP BY 1),
r AS (SELECT v, cast(sum(cv) OVER (ORDER BY v) AS double)
               - (cv - 1) / 2.0 AS avg_rank FROM vc),
t AS (SELECT cast(sum(cv) AS bigint) AS n,
             cast(sum(cv::HUGEINT * cv * cv - cv) AS double) AS tsum
      FROM vc),
gr AS (SELECT g, cast(sum(c) AS bigint) AS n_g, sum(c * avg_rank) AS rs
       FROM cg JOIN r USING (v) GROUP BY 1)
SELECT round((12.0 / (max(t.n) * (max(t.n) + 1.0))
              * sum(rs * rs / n_g) - 3.0 * (max(t.n) + 1.0))
             / (1.0 - max(t.tsum)
                / (cast(max(t.n) AS double) * max(t.n) * max(t.n)
                   - max(t.n))), 6) AS h_stat,
       cast(count(*) - 1 AS bigint) AS df1,
       cast(count(*) AS bigint) AS k,
       max(t.n) AS n_total
FROM gr, t
"""
    o["stats_mood"] = """
WITH d AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
med AS (SELECT quantile_cont(x, 0.5) AS m FROM d),
s AS (SELECT g, x FROM d WHERE x != (SELECT m FROM med)),
gg AS (SELECT g,
              cast(sum(CASE WHEN x > (SELECT m FROM med)
                            THEN 1 ELSE 0 END) AS bigint) AS ab,
              cast(sum(CASE WHEN x < (SELECT m FROM med)
                            THEN 1 ELSE 0 END) AS bigint) AS bl
       FROM s GROUP BY 1),
t AS (SELECT cast(sum(ab) AS bigint) AS ta, cast(sum(bl) AS bigint) AS tb,
             cast(count(*) AS bigint) AS nk FROM gg)
SELECT round(sum((ab - (ab + bl) * t.ta / (t.ta + t.tb))
                 * (ab - (ab + bl) * t.ta / (t.ta + t.tb))
                 / ((ab + bl) * t.ta / (t.ta + t.tb))
               + (bl - (ab + bl) * t.tb / (t.ta + t.tb))
                 * (bl - (ab + bl) * t.tb / (t.ta + t.tb))
                 / ((ab + bl) * t.tb / (t.ta + t.tb))), 6) AS chi2,
       max(t.nk) - 1 AS df1,
       max(t.nk) AS k,
       max(t.ta) + max(t.tb) AS n_total
FROM gg, t
"""
    # shared scored-frame CTE for the ML-eval pack: the quality_lr
    # probability (bit-exact integer fold) + the lang=='en' label
    _SCORED = """
w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sq AS (SELECT doc_id, cast(len(toks) AS bigint) AS n,
  cast(list_sum(list_transform(toks, t ->
     (cast(concat('0x', substr(md5(t), 1, 15)) AS bigint) % 4096)
     * 2654435761 % 2001 - 1000)) AS bigint) AS lm
  FROM w),
sc AS (SELECT sq.doc_id, round(1 / (1 + exp(-lm / (1000.0 * n))), 6) AS s,
              d.lang = 'en' AS y
       FROM sq JOIN documents d ON sq.doc_id = d.doc_id
       WHERE d.lang IS NOT NULL)"""
    o["stats_auc"] = f"""
WITH {_SCORED},
g AS (SELECT s AS v,
             cast(sum(CASE WHEN y THEN 1 ELSE 0 END) AS bigint) AS ca,
             cast(count(*) - sum(CASE WHEN y THEN 1 ELSE 0 END)
               AS bigint) AS cb
      FROM sc GROUP BY 1),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT ca, cb,
             sum(ca + cb) OVER (ORDER BY v) - (ca + cb) AS cum_before
      FROM g)
SELECT round(((cast(sum(ca * (2 * cum_before + ca + cb + 1)) AS bigint)
               - max(t.na) * (max(t.na) + 1)) / 2.0)
             / (max(t.na) * max(t.nb)), 6) AS auc,
       max(t.na) AS n_pos, max(t.nb) AS n_neg
FROM c, t
"""
    o["stats_brier"] = f"""
WITH {_SCORED}
SELECT cast(count(*) AS bigint) AS n,
       round(avg((s - CASE WHEN y THEN 1 ELSE 0 END)
                 * (s - CASE WHEN y THEN 1 ELSE 0 END)), 6) AS brier,
       round(avg(CASE WHEN y THEN 1 ELSE 0 END), 6) AS base_rate
FROM sc
"""
    o["stats_calibration"] = f"""
WITH {_SCORED}
SELECT cast(least(floor(s * 10), 9) AS int) AS bin,
       cast(count(*) AS bigint) AS n,
       round(avg(s), 6) AS avg_score,
       round(avg(CASE WHEN y THEN 1 ELSE 0 END), 6) AS frac_pos,
       round(avg(CASE WHEN y THEN 1 ELSE 0 END) - avg(s), 6) AS gap
FROM sc GROUP BY 1
"""
    o["stats_lift"] = f"""
WITH {_SCORED},
vc AS (SELECT s AS v, cast(count(*) AS bigint) AS cv,
              cast(sum(CASE WHEN y THEN 1 ELSE 0 END) AS bigint) AS pv
       FROM sc GROUP BY 1),
r AS (SELECT v, cv, pv,
             cast(sum(cv) OVER (ORDER BY v) AS double)
               - (cv - 1) / 2.0 AS avg_rank FROM vc),
t0 AS (SELECT cast(sum(cv) AS bigint) AS n FROM vc),
bd AS (SELECT cast(9 - least(floor(avg_rank / t0.n * 10), 9) AS int)
                AS band,
              cv, pv FROM r, t0),
per AS (SELECT band, cast(sum(cv) AS bigint) AS n,
               cast(sum(pv) AS bigint) AS n_pos FROM bd GROUP BY 1),
tt AS (SELECT cast(sum(n) AS bigint) AS tn,
              cast(sum(n_pos) AS bigint) AS tp FROM per),
cum AS (SELECT band, n, n_pos,
               cast(sum(n) OVER (ORDER BY band) AS bigint) AS cn,
               cast(sum(n_pos) OVER (ORDER BY band) AS bigint) AS cp
        FROM per)
SELECT band, n, n_pos, round(n_pos / n, 6) AS resp_rate,
       round((cp / cn) / (tt.tp / tt.tn), 6) AS cum_lift
FROM cum, tt
"""
    o["stats_cpk"] = """
WITH d AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
a AS (SELECT g, cast(count(*) AS bigint) AS n, sum(x) AS s1,
             sum(x * x) AS s2,
             cast(sum(CASE WHEN x >= 0.0 AND x <= 90.0
                           THEN 1 ELSE 0 END) AS bigint) AS ok
      FROM d GROUP BY 1),
x AS (SELECT g, n, ok, s1 / n AS mu,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sig
      FROM a)
SELECT g AS event_type, n, round(ok / cast(n AS double), 6)
         AS in_spec_share,
       round(90.0 / (6.0 * sig), 6) AS cp,
       round(least(90.0 - mu, mu - 0.0) / (3.0 * sig), 6) AS cpk
FROM x
"""
    o["stats_eta_squared"] = """
WITH g AS (SELECT event_type AS p, cast(count(*) AS bigint) AS ng,
                  sum(value) AS sg, sum(value * value) AS ssg
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1),
t AS (SELECT cast(sum(ng) AS bigint) AS tn, sum(sg) AS tsg FROM g),
j AS (SELECT g.*, t.tn, t.tsg, t.tsg / t.tn AS grand FROM g, t)
SELECT cast(count(*) AS bigint) AS k, max(tn) AS n,
       round(sum(ng * (sg / ng - grand) * (sg / ng - grand))
             / (sum(ssg) - max(tsg) * max(tsg) / max(tn)), 6) AS eta_sq
FROM j
"""
    o["stats_bland_altman"] = f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS t, value FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL),
pu AS (SELECT user_id,
              avg(CASE WHEN t < {MCNEMAR_SPLIT_MS} THEN value END) AS xa,
              avg(CASE WHEN t >= {MCNEMAR_SPLIT_MS} THEN value END) AS xb
       FROM e GROUP BY 1),
d AS (SELECT xb - xa AS d FROM pu
      WHERE xa IS NOT NULL AND xb IS NOT NULL),
m AS (SELECT cast(count(*) AS bigint) AS n, avg(d) AS bias,
             stddev_samp(d) AS sd FROM d),
bd AS (SELECT n, round(bias, 6) AS bias,
              round(bias - {analytics.WILSON_Z!r} * sd, 6) AS loa_low,
              round(bias + {analytics.WILSON_Z!r} * sd, 6) AS loa_high
       FROM m)
SELECT max(bd.n) AS n, max(bd.bias) AS bias,
       max(bd.loa_low) AS loa_low, max(bd.loa_high) AS loa_high,
       cast(sum(CASE WHEN d.d < bd.loa_low OR d.d > bd.loa_high
                     THEN 1 ELSE 0 END) AS bigint) AS n_outside
FROM d, bd
"""
    o["stats_gmean"] = """
WITH b AS (SELECT l_returnflag AS g, cast(l_quantity AS double) AS x
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL)
SELECT g AS l_returnflag,
       cast(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bigint) AS n,
       cast(sum(CASE WHEN x <= 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_dropped,
       round(avg(CASE WHEN x > 0 THEN x END), 6) AS am,
       round(exp(avg(CASE WHEN x > 0 THEN ln(x) END)), 6) AS gm,
       round(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)
             / sum(CASE WHEN x > 0 THEN 1.0 / x END), 6) AS hm
FROM b GROUP BY 1
"""
    o["stats_fisher_z"] = """
WITH b AS (SELECT l_returnflag AS g,
                  cast(l_quantity AS double) AS x,
                  cast(l_extendedprice AS double) AS y
           FROM lineitem
           WHERE l_returnflag IN ('A', 'R')
             AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
m AS (SELECT g, avg(x) AS mx, avg(y) AS my FROM b GROUP BY 1),
per AS (SELECT b.g, cast(count(*) AS bigint) AS n,
               sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy,
               sum((x - mx) * (y - my)) AS sxy
        FROM b JOIN m ON b.g = m.g GROUP BY 1),
rr AS (SELECT g, n, sxy / sqrt(sxx * syy) AS r FROM per),
wide AS (SELECT
    max(CASE WHEN g = 'A' THEN n END) AS n_a,
    max(CASE WHEN g = 'R' THEN n END) AS n_b,
    max(CASE WHEN g = 'A' THEN r END) AS ra,
    max(CASE WHEN g = 'R' THEN r END) AS rb,
    max(CASE WHEN g = 'A' THEN 0.5 * ln((1.0 + r) / (1.0 - r)) END) AS za,
    max(CASE WHEN g = 'R' THEN 0.5 * ln((1.0 + r) / (1.0 - r)) END) AS zb
  FROM rr)
SELECT n_a, n_b, round(ra, 6) AS r_a, round(rb, 6) AS r_b,
       round((za - zb) / sqrt(1.0 / (n_a - 3) + 1.0 / (n_b - 3)), 6)
         AS z_stat
FROM wide
"""
    _pr_cells = []
    for _t in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        _pr_cells.append(f"""
SELECT round({_t!r}, 6) AS tau,
       cast(sum(CASE WHEN s >= {_t!r} AND y THEN 1 ELSE 0 END)
         AS bigint) AS tp,
       cast(sum(CASE WHEN s >= {_t!r} AND NOT y THEN 1 ELSE 0 END)
         AS bigint) AS fp,
       cast(sum(CASE WHEN s < {_t!r} AND y THEN 1 ELSE 0 END)
         AS bigint) AS fn
FROM sc""")
    o["stats_pr_curve"] = f"""
WITH {_SCORED},
cells AS ({" UNION ALL ".join(_pr_cells)})
SELECT tau, tp, fp, fn,
       round(tp / (tp + fp), 6) AS precision,
       round(tp / (tp + fn), 6) AS recall,
       round(2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
             / ((tp / (tp + fp)) + (tp / (tp + fn))), 6) AS f1
FROM cells
"""
    o["stats_theil"] = """
WITH b AS (SELECT o_orderpriority AS g, cast(o_totalprice AS double) AS x
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND o_orderpriority IS NOT NULL),
p AS (SELECT g, x FROM b WHERE x > 0),
m AS (SELECT g, avg(x) AS mu, cast(count(*) AS bigint) AS n
      FROM p GROUP BY 1),
dr AS (SELECT g, cast(count(*) AS bigint) AS nd FROM b
       WHERE x <= 0 GROUP BY 1),
t AS (SELECT p.g, max(m.n) AS n,
             round(avg((x / mu) * ln(x / mu)), 6) AS theil,
             round(avg((x / mu) * ln(x / mu))
                   / ln(cast(max(m.n) AS double)), 6) AS theil_norm
      FROM p JOIN m ON p.g = m.g GROUP BY 1)
SELECT t.g AS o_orderpriority, n,
       cast(coalesce(dr.nd, 0) AS bigint) AS n_dropped, theil, theil_norm
FROM t LEFT JOIN dr ON t.g = dr.g
"""
    o["stats_odds_ratio"] = f"""
WITH b0 AS (SELECT (o_orderpriority = '1-URGENT') AS e,
                   (o_orderstatus = 'F') AS o
            FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND o_orderstatus IS NOT NULL),
cells AS (SELECT
  cast(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS bigint) AS a,
  cast(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS bigint) AS b,
  cast(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS bigint) AS c,
  cast(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS bigint) AS d
  FROM b0),
x AS (SELECT a, b, c, d,
             a * d / cast(b * c AS double) AS orr,
             sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS se,
             a / cast(a + b AS double) AS p1,
             c / cast(c + d AS double) AS p2,
             (a + c) / cast(a + b + c + d AS double) AS pp
      FROM cells)
SELECT a, b, c, d,
       round(orr, 6) AS odds_ratio,
       round(exp(ln(orr) - {analytics.WILSON_Z!r} * se), 6) AS ci_low,
       round(exp(ln(orr) + {analytics.WILSON_Z!r} * se), 6) AS ci_high,
       round(p1, 6) AS p1, round(p2, 6) AS p2,
       round((p1 - p2) / sqrt(pp * (1 - pp)
                              * (1.0 / (a + b) + 1.0 / (c + d))), 6)
         AS z_stat
FROM x
"""
    o["stats_ccc"] = """
WITH b AS (SELECT cast(l_extendedprice AS double) AS x,
                  cast(l_quantity AS double) AS y
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
m AS (SELECT avg(x) AS mx, avg(y) AS my FROM b),
a AS (SELECT cast(count(*) AS bigint) AS n,
             sum((x - m.mx) * (x - m.mx)) AS sxx,
             sum((y - m.my) * (y - m.my)) AS syy,
             sum((x - m.mx) * (y - m.my)) AS sxy,
             max(m.mx) AS mx, max(m.my) AS my
      FROM b, m)
SELECT n, round(sxy / sqrt(sxx * syy), 6) AS pearson_r,
       round(2.0 * sxy / (sxx + syy + n * (mx - my) * (mx - my)), 6) AS ccc
FROM a
"""
    # effective-k semantics: with fewer than 201 qualifying rows the
    # estimator shrinks to n_fetched − 1 and the cutoff row is excluded
    # from the log-mean (mirrors hill_tail_index exactly)
    o["stats_hill"] = """
WITH c AS (SELECT user_id, cast(count(*) AS double) AS n FROM events
           WHERE user_id IS NOT NULL GROUP BY 1),
top AS (SELECT n, row_number() OVER (ORDER BY n DESC) AS rn
        FROM c WHERE n > 0),
sel AS (SELECT n, rn, count(*) OVER () AS cnt FROM top WHERE rn <= 201)
SELECT cast(least(200, max(cnt) - 1) AS bigint) AS k, min(n) AS x_tail,
       round(1.0 / (avg(CASE WHEN rn <= cnt - 1 THEN ln(n) END)
                    - ln(min(n))), 6) AS alpha
FROM sel
"""
    o["stats_percentiles"] = """
SELECT l_returnflag, count(*) AS n,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p5,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem GROUP BY l_returnflag
"""
    o["stats_histogram"] = """
WITH e AS (SELECT value FROM events WHERE value >= 0 AND value <= 500),
b AS (SELECT cast(least(floor(value / 25.0), 19) AS int) AS bin, value FROM e)
SELECT bin, round(bin * 25.0, 6) AS lo_edge, round(bin * 25.0 + 25.0, 6) AS hi_edge,
       count(*) AS n, round(sum(value), 3) AS sum_value
FROM b GROUP BY bin
"""
    o["stats_corr"] = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_xy,
       round(covar_samp(l_quantity, l_extendedprice), 3) AS covar_xy,
       round(stddev_samp(l_quantity), 3) AS stddev_x,
       round(stddev_samp(l_extendedprice), 3) AS stddev_y
FROM lineitem GROUP BY l_returnflag
"""
    o["stats_robust"] = """
WITH p AS (SELECT l_returnflag,
                  quantile_cont(l_extendedprice, [0.1, 0.5, 0.9]) AS q
           FROM lineitem GROUP BY 1)
SELECT l.l_returnflag, count(*) AS n,
       round(any_value(p.q[2]), 6) AS median,
       round(median(abs(l.l_extendedprice - p.q[2])), 6) AS mad,
       round(avg(CASE WHEN l.l_extendedprice BETWEEN p.q[1] AND p.q[3]
                      THEN l.l_extendedprice END), 3) AS trimmed_mean
FROM lineitem l JOIN p USING (l_returnflag) GROUP BY 1
"""
    o["stats_qq"] = """
WITH d AS (SELECT event_type AS g, value AS v FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
la AS (SELECT quantile_cont(v, [x / 20.0 FOR x IN range(1, 20)]) AS l
       FROM d WHERE g = 'click'),
lb AS (SELECT quantile_cont(v, [x / 20.0 FOR x IN range(1, 20)]) AS l
       FROM d WHERE g = 'view'),
idx AS (SELECT unnest(range(1, 20)) AS i)
SELECT round(i / 20.0, 6) AS q,
       round(la.l[i], 6) AS q_a,
       round(lb.l[i], 6) AS q_b,
       round(lb.l[i] - la.l[i], 6) AS gap
FROM idx, la, lb
"""
    qcuts = ", ".join(str(i / 10) for i in range(1, 10))
    o["stats_histogram_equidepth"] = f"""
WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
ed AS (SELECT list_transform(quantile_cont(value, [{qcuts}]),
                             x -> round(x, 6)) AS q FROM e),
b AS (SELECT cast(len(list_filter(ed.q, x -> value > x)) AS int) AS bin, value
      FROM e, ed)
SELECT bin, count(*) AS n, min(value) AS min_value, max(value) AS max_value
FROM b GROUP BY bin
"""
    o["stats_runs"] = """
WITH daily AS (SELECT cast(o_orderdate AS date) AS o,
                      cast(count(*) AS double) AS x
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
med AS (SELECT quantile_cont(x, 0.5) AS m FROM daily),
s AS (SELECT o, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE -1 END AS sgn
      FROM daily WHERE x != (SELECT m FROM med)),
r AS (SELECT sgn,
             CASE WHEN lag(sgn) OVER (ORDER BY o) IS NULL
                  OR lag(sgn) OVER (ORDER BY o) != sgn
                  THEN 1 ELSE 0 END AS brk
      FROM s),
a AS (SELECT cast(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_pos,
             cast(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS bigint)
               AS n_neg,
             cast(sum(brk) AS bigint) AS n_runs
      FROM r)
SELECT n_pos, n_neg, n_runs,
       round((n_runs - (2.0 * n_pos * n_neg / (n_pos + n_neg) + 1))
             / sqrt((2.0 * n_pos * n_neg)
                    * (2.0 * n_pos * n_neg - n_pos - n_neg)
                    / ((n_pos + n_neg) * (n_pos + n_neg)
                       * (n_pos + n_neg - 1))), 6) AS z_stat
FROM a
"""
    _cm = {"l_quantity": "a", "l_extendedprice": "b",
           "l_discount": "c", "l_tax": "e"}
    _cm_names = list(_cm)
    _cm_sums, _cm_cells = [], []
    for _i, _x in enumerate(_cm_names):
        for _y in _cm_names[_i:]:
            _ax, _ay = _cm[_x], _cm[_y]
            _cm_sums.append(
                f"sum(({_ax} - m.m{_ax}) * ({_ay} - m.m{_ay}))"
                f" AS s_{_ax}{_ay}"
            )
            _cm_cells.append(
                f"SELECT '{_x}' AS col_a, '{_y}' AS col_b, n,\n"
                f"       round(s_{_ax}{_ay} / (n - 1), 6) AS cov,\n"
                f"       round(s_{_ax}{_ay}"
                f" / sqrt(s_{_ax}{_ax} * s_{_ay}{_ay}), 6) AS corr\n"
                f"FROM s"
            )
    o["stats_wilcoxon"] = f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS t, value FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL),
pu AS (SELECT user_id,
              avg(CASE WHEN t < {MCNEMAR_SPLIT_MS} THEN value END) AS xa,
              avg(CASE WHEN t >= {MCNEMAR_SPLIT_MS} THEN value END) AS xb
       FROM e GROUP BY 1),
d AS (SELECT user_id, xb - xa AS d, abs(xb - xa) AS ad FROM pu
      WHERE xa IS NOT NULL AND xb IS NOT NULL AND xb - xa != 0),
vc AS (SELECT ad, cast(count(*) AS bigint) AS cv FROM d GROUP BY 1),
r AS (SELECT ad, cast(sum(cv) OVER (ORDER BY ad) AS double)
              - (cv - 1) / 2.0 AS avg_rank FROM vc),
mm AS (SELECT cast(count(*) AS bigint) AS m FROM d)
SELECT max(mm.m) AS m,
       round(sum(CASE WHEN d.d > 0 THEN r.avg_rank ELSE 0 END), 6)
         AS w_plus,
       round((sum(CASE WHEN d.d > 0 THEN r.avg_rank ELSE 0 END)
              - max(mm.m) * (max(mm.m) + 1) / 4.0)
             / sqrt(max(mm.m) * (max(mm.m) + 1)
                    * (2 * max(mm.m) + 1) / 24.0), 6) AS z_stat
FROM d JOIN r USING (ad), mm
"""
    _ck_scores = ",\n  ".join(
        f"len(list_distinct(list_intersect(words, {_stoplist_sql(lang)})))"
        f" AS s_{lang}"
        for lang in text.LANG_ORDER
    )
    _ck_best = (
        "greatest(" + ", ".join(f"s_{lang}" for lang in text.LANG_ORDER) + ")"
    )
    _ck_case = "CASE " + " ".join(
        f"WHEN s_{lang} = {_ck_best} THEN '{lang}'"
        for lang in text.LANG_ORDER
    ) + " END"
    o["stats_cohen_kappa"] = f"""
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
           FROM documents),
s AS (SELECT doc_id, {_ck_scores} FROM w),
pred AS (SELECT doc_id, {_ck_case} AS pred_lang FROM s),
g AS (SELECT d.lang AS ra, p.pred_lang AS rb,
             cast(count(*) AS bigint) AS c
      FROM documents d JOIN pred p USING (doc_id)
      WHERE d.lang IS NOT NULL GROUP BY 1, 2),
base AS (SELECT cast(sum(c) AS bigint) AS n,
                cast(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS bigint)
                  AS agree
         FROM g),
ma AS (SELECT ra, sum(c) AS ca FROM g GROUP BY 1),
mb AS (SELECT rb, sum(c) AS cb FROM g GROUP BY 1),
pes AS (SELECT sum(ca * cb) AS pesum FROM ma JOIN mb ON ma.ra = mb.rb)
SELECT n, round(agree / cast(n AS double), 6) AS p_o,
       round(coalesce(pesum, 0) / (cast(n AS double) * n), 6) AS p_e,
       round((agree / cast(n AS double)
              - coalesce(pesum, 0) / (cast(n AS double) * n))
             / (1.0 - coalesce(pesum, 0) / (cast(n AS double) * n)), 6)
         AS kappa
FROM base, pes
"""
    o["stats_cochran_armitage"] = """
WITH d AS (SELECT o_orderpriority AS g,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
                  CASE o_orderpriority
                       WHEN '1-URGENT' THEN 1.0 WHEN '2-HIGH' THEN 2.0
                       WHEN '3-MEDIUM' THEN 3.0
                       WHEN '4-NOT SPECIFIED' THEN 4.0
                       WHEN '5-LOW' THEN 5.0 END AS s
           FROM orders
           WHERE o_orderpriority IS NOT NULL
             AND o_orderstatus IS NOT NULL),
d2 AS (SELECT * FROM d WHERE s IS NOT NULL),
per AS (SELECT g, max(s) AS s, cast(count(*) AS bigint) AS n,
               cast(sum(y) AS bigint) AS a
        FROM d2 GROUP BY 1),
t AS (SELECT cast(sum(n) AS bigint) AS nt,
             cast(sum(a) AS bigint) AS a_t FROM per),
j AS (SELECT per.*, t.nt, t.a_t / cast(t.nt AS double) AS pb
      FROM per, t)
SELECT max(nt) AS n_total, cast(count(*) AS bigint) AS k,
       round(max(pb), 6) AS p_pooled,
       round(sum(s * (a - n * pb)), 6) AS t_stat,
       round(sum(s * (a - n * pb))
             / sqrt(max(pb) * (1 - max(pb))
                    * (sum(n * s * s)
                       - sum(n * s) * sum(n * s) / max(nt))), 6)
         AS z_stat
FROM j
"""
    o["stats_cov_matrix"] = f"""
WITH d AS (SELECT cast(l_quantity AS double) AS a,
                  cast(l_extendedprice AS double) AS b,
                  cast(l_discount AS double) AS c,
                  cast(l_tax AS double) AS e
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
m AS (SELECT avg(a) AS ma, avg(b) AS mb, avg(c) AS mc, avg(e) AS me
      FROM d),
s AS (SELECT cast(count(*) AS bigint) AS n,
             {", ".join(_cm_sums)}
      FROM d, m)
{" UNION ALL ".join(_cm_cells)}
"""
    o["stats_cvar"] = """
WITH d AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
c AS (SELECT g, round(quantile_cont(x, 0.95), 6) AS var_p
      FROM d GROUP BY 1)
SELECT d.g AS event_type, cast(count(*) AS bigint) AS n,
       max(c.var_p) AS var_p,
       round(avg(CASE WHEN x >= c.var_p THEN x END), 6) AS cvar_p,
       cast(sum(CASE WHEN x >= c.var_p THEN 1 ELSE 0 END) AS bigint)
         AS n_tail
FROM d JOIN c ON d.g = c.g GROUP BY 1
"""
    o["stats_tukey"] = """
WITH d AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
q AS (SELECT g, round(quantile_cont(x, 0.25), 6) AS q1,
             round(quantile_cont(x, 0.75), 6) AS q3 FROM d GROUP BY 1),
f AS (SELECT g, q1, q3, round(q1 - 1.5 * (q3 - q1), 6) AS lo,
             round(q3 + 1.5 * (q3 - q1), 6) AS hi FROM q)
SELECT d.g AS event_type, cast(count(*) AS bigint) AS n,
       max(q1) AS q1, max(q3) AS q3,
       max(lo) AS lo_fence, max(hi) AS hi_fence,
       cast(sum(CASE WHEN x < lo OR x > hi THEN 1 ELSE 0 END) AS bigint)
         AS n_outliers,
       round(avg(CASE WHEN x < lo OR x > hi THEN 1 ELSE 0 END), 6)
         AS outlier_share
FROM d JOIN f ON d.g = f.g GROUP BY 1
"""
    # PSI per group vs the whole population, Laplace-smoothed bins
    o["stats_psi"] = """
WITH bounds AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
bn AS (SELECT source,
       least(cast(floor((n_chars - lo) / ((hi - lo) / 10)) AS int), 9) AS b
       FROM documents, bounds),
gb AS (SELECT source, b, count(*) AS c FROM bn GROUP BY 1, 2),
tot AS (SELECT b, sum(c) AS ct FROM gb GROUP BY b),
grid AS (SELECT DISTINCT source FROM gb),
bins AS (SELECT unnest(generate_series(0, 9)) AS b),
fl AS (SELECT g.source, bins.b, coalesce(gb.c, 0) AS c, coalesce(tot.ct, 0) AS ct
       FROM grid g CROSS JOIN bins
       LEFT JOIN gb ON gb.source = g.source AND gb.b = bins.b
       LEFT JOIN tot ON tot.b = bins.b),
gn AS (SELECT source, sum(c) AS n FROM fl GROUP BY source),
nt AS (SELECT sum(c) AS nt FROM fl)
SELECT f.source, cast(gn.n AS bigint) AS n,
       round(sum(((f.c + 0.5) / (gn.n + 5.0) - (f.ct + 0.5) / (nt.nt + 5.0))
                 * ln(((f.c + 0.5) / (gn.n + 5.0))
                      / ((f.ct + 0.5) / (nt.nt + 5.0)))), 6) AS psi
FROM fl f JOIN gn USING (source), nt
GROUP BY f.source, gn.n
"""  # n cast: DuckDB sum() yields HUGEINT (pandas float) vs Spark's long
    # pooled-sample CDF difference; cumulative counts are exact ints so
    # the max is bit-deterministic across engines
    o["stats_ks"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT v, cast(sum(ia) AS bigint) AS ca,
             cast(count(*) - sum(ia) AS bigint) AS cb
      FROM s GROUP BY v),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
             sum(cb) OVER (ORDER BY v) AS cum_b FROM g)
SELECT round(max(abs(cum_a / cast(t.na AS double)
                     - cum_b / cast(t.nb AS double))), 6) AS ks_stat,
       max(t.na) AS n_a, max(t.nb) AS n_b
FROM c, t
"""
    # doubled average-rank identity: 2*avg_rank(v) = 2*cum_before + ct + 1
    # keeps every term an exact integer until the final halving
    o["stats_mwu"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT v, cast(sum(ia) AS bigint) AS ca,
             cast(count(*) - sum(ia) AS bigint) AS cb
      FROM s GROUP BY v),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT ca, cb,
             sum(ca + cb) OVER (ORDER BY v) - (ca + cb) AS cum_before
      FROM g)
SELECT (cast(sum(ca * (2 * cum_before + ca + cb + 1)) AS bigint)
        - max(t.na) * (max(t.na) + 1)) / 2.0 AS u_a,
       cast(sum(ca * (2 * cum_before + ca + cb + 1)) AS bigint) / 2.0 AS r_a,
       max(t.na) AS n_a, max(t.nb) AS n_b
FROM c, t
"""
    # W1 = sum over consecutive distinct pooled values of
    # |F_a - F_b| * gap; the largest value's row has |F_a - F_b| = 0 so
    # dropping its NULL lead() gap is exactly the Spark side's zero-fill
    o["stats_wasserstein"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT v, cast(sum(ia) AS bigint) AS ca,
             cast(count(*) - sum(ia) AS bigint) AS cb
      FROM s GROUP BY v),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT v, lead(v) OVER (ORDER BY v) AS nv,
             sum(ca) OVER (ORDER BY v) AS cum_a,
             sum(cb) OVER (ORDER BY v) AS cum_b FROM g)
SELECT round(sum(abs(cum_a / cast(t.na AS double)
                     - cum_b / cast(t.nb AS double))
                 * coalesce(nv - v, 0)), 6)
         AS w1_dist,
       max(t.na) AS n_a, max(t.nb) AS n_b
FROM c, t
"""
    # tie-aware pooled form: T = na*nb/N^2 * sum (ca+cb)(F_a-F_b)^2
    o["stats_cvm"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT v, cast(sum(ia) AS bigint) AS ca,
             cast(count(*) - sum(ia) AS bigint) AS cb
      FROM s GROUP BY v),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT ca, cb,
             sum(ca) OVER (ORDER BY v) AS cum_a,
             sum(cb) OVER (ORDER BY v) AS cum_b FROM g)
SELECT round(cast(max(t.na) AS double) * max(t.nb)
             / ((max(t.na) + max(t.nb)) * cast(max(t.na) + max(t.nb)
                                               AS double))
             * sum((ca + cb)
                   * (cum_a / cast(t.na AS double)
                      - cum_b / cast(t.nb AS double))
                   * (cum_a / cast(t.na AS double)
                      - cum_b / cast(t.nb AS double))), 6) AS cvm_stat,
       max(t.na) AS n_a, max(t.nb) AS n_b
FROM c, t
"""
    # Scholz-Stephens tie-adjusted midrank form; degenerate-denominator
    # rows (one value carrying the whole pooled sample) drop on both sides
    o["stats_ad"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT v, cast(sum(ia) AS bigint) AS ca,
             cast(count(*) - sum(ia) AS bigint) AS cb
      FROM s GROUP BY v),
t AS (SELECT cast(sum(ca) AS bigint) AS na, cast(sum(cb) AS bigint) AS nb
      FROM g),
c AS (SELECT ca, cb,
             sum(ca) OVER (ORDER BY v) AS cum_a,
             sum(cb) OVER (ORDER BY v) AS cum_b FROM g),
x AS (SELECT cast(t.na AS bigint) AS bna, cast(t.nb AS bigint) AS bnb,
             cast(t.na AS double) AS dna, cast(t.nb AS double) AS dnb,
             cast(t.na + t.nb AS double) AS dn,
             ca + cb AS l,
             cum_a - ca / 2.0 AS ma,
             cum_b - cb / 2.0 AS mb,
             cum_a + cum_b - (ca + cb) / 2.0 AS bj
      FROM c, t),
y AS (SELECT bna, bnb, dna, dnb, dn, l,
             bj * (dn - bj) - dn * l / 4.0 AS denom,
             dn * ma - dna * bj AS da,
             dn * mb - dnb * bj AS db
      FROM x)
SELECT round((max(dn) - 1.0) / max(dn)
             * sum((l / dn) * (da * da / dna + db * db / dnb) / denom),
             6) AS ad_stat,
       max(bna) AS n_a, max(bnb) AS n_b
FROM y WHERE denom > 0
"""
    o["stats_deming"] = """
WITH g AS (SELECT l_returnflag, cast(count(*) AS bigint) AS n,
                  sum(cast(l_quantity AS double)) AS sx,
                  sum(cast(l_extendedprice AS double)) AS sy,
                  sum(cast(l_quantity AS double)
                      * cast(l_quantity AS double)) AS sxx_r,
                  sum(cast(l_extendedprice AS double)
                      * cast(l_extendedprice AS double)) AS syy_r,
                  sum(cast(l_quantity AS double)
                      * cast(l_extendedprice AS double)) AS sxy_r
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             AND l_returnflag IS NOT NULL
           GROUP BY 1 HAVING count(*) >= 2),
m AS (SELECT l_returnflag, n, sx, sy,
             sxx_r - sx * sx / n AS sxx,
             syy_r - sy * sy / n AS syy,
             sxy_r - sx * sy / n AS sxy
      FROM g),
s2 AS (SELECT l_returnflag, n, sx, sy,
              (syy - sxx + sqrt((syy - sxx) * (syy - sxx)
                                + 4.0 * sxy * sxy)) / (2.0 * sxy) AS slope
       FROM m)
SELECT l_returnflag, n, round(slope, 6) AS slope,
       round(sy / n - slope * sx / n, 6) AS intercept
FROM s2
"""
    o["stats_chi2"] = """
WITH grid AS (SELECT lang, source, count(*) AS obs FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2),
rm AS (SELECT lang, sum(obs) AS rtot FROM grid GROUP BY 1),
cm AS (SELECT source, sum(obs) AS ctot FROM grid GROUP BY 1),
t AS (SELECT sum(obs) AS n, count(DISTINCT lang) AS nr,
             count(DISTINCT source) AS nc FROM grid)
SELECT greatest(round(sum(cast(g.obs AS double) * g.obs
                       / (rm.rtot * cm.ctot / cast(t.n AS double)))
                   - max(t.n), 6), 0.0) AS chi2,
       cast(max((t.nr - 1) * (t.nc - 1)) AS bigint) AS dof,
       cast(max(t.n) AS bigint) AS n
FROM grid g JOIN rm USING (lang) JOIN cm USING (source), t
"""
    o["stats_diversity"] = """
WITH counts AS (SELECT source, lang, count(*) AS ct FROM documents
                WHERE lang IS NOT NULL AND source IS NOT NULL
                GROUP BY 1, 2),
tot AS (SELECT source, sum(ct) AS tot FROM counts GROUP BY 1)
SELECT c.source AS source, count(*) AS n_cats,
       round(-sum((c.ct / cast(t.tot AS double))
                  * ln(c.ct / cast(t.tot AS double))), 6) AS entropy,
       round(1.0 - sum((c.ct / cast(t.tot AS double))
                       * (c.ct / cast(t.tot AS double))), 6) AS gini
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source
"""
    o["stats_ttest"] = """
WITH s AS (SELECT event_type AS g, count(*) AS n,
                  sum(value) AS s, sum(value * value) AS ss
           FROM events
           WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
           GROUP BY 1),
one AS (SELECT
  max(CASE WHEN g = 'purchase' THEN n END) AS na,
  max(CASE WHEN g = 'view' THEN n END) AS nb,
  max(CASE WHEN g = 'purchase' THEN s / n END) AS ma,
  max(CASE WHEN g = 'view' THEN s / n END) AS mb,
  max(CASE WHEN g = 'purchase' THEN (ss - s * s / n) / (n - 1) END) AS va,
  max(CASE WHEN g = 'view' THEN (ss - s * s / n) / (n - 1) END) AS vb
  FROM s)
SELECT round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
       round(((va / na + vb / nb) * (va / na + vb / nb))
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)), 2) AS dof,
       round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
       cast(na AS bigint) AS n_a, cast(nb AS bigint) AS n_b
FROM one
"""
    o["stats_cube"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
       round(sum(o_totalprice), 3) AS sum_value
FROM orders
WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""
    o["stats_bootstrap"] = """
WITH base AS (SELECT event_id AS id, value AS v
              FROM events WHERE value IS NOT NULL),
reps AS (SELECT t.r, round(avg(v), 6) AS m
         FROM base, unnest(generate_series(0, 31)) AS t(r)
         WHERE cast(concat('0x', substr(md5(concat(cast(id AS varchar), ':',
                    cast(r AS varchar))), 1, 15)) AS bigint) % 2 = 0
         GROUP BY t.r),
ci AS (SELECT round(quantile_cont(m, 0.025), 6) AS ci_lo,
              round(quantile_cont(m, 0.975), 6) AS ci_hi,
              round(stddev_samp(m), 6) AS se_reps,
              cast(count(*) AS int) AS n_replicates
       FROM reps)
SELECT round(avg(v), 6) AS mean, ci.ci_lo, ci.ci_hi, ci.se_reps,
       count(*) AS n_rows, ci.n_replicates
FROM base, ci GROUP BY ci.ci_lo, ci.ci_hi, ci.se_reps, ci.n_replicates
"""
    o["stats_winsorize"] = f"""
{M},
b AS (SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM m GROUP BY 1)
SELECT m.event_id, m.event_type, m.value, b.lo, b.hi,
       CASE WHEN m.value < b.lo THEN b.lo
            WHEN m.value > b.hi THEN b.hi
            ELSE round(m.value, 6) END AS clipped,
       (m.value < b.lo OR m.value > b.hi) AS was_clipped
FROM m JOIN b USING (event_type)
"""
    o["stats_benford"] = f"""
{M},
p AS (SELECT value AS v FROM m WHERE value IS NOT NULL AND value > 0),
c AS (SELECT cast(floor(v / power(10.0, floor(log10(v)))) AS int) AS digit,
             count(*) AS n
      FROM p GROUP BY 1),
t AS (SELECT sum(n) AS t FROM c)
SELECT digit, n,
       round(n / t.t, 6) AS observed_p,
       round(log10(1.0 + 1.0 / digit), 6) AS expected_p,
       round((n - t.t * log10(1.0 + 1.0 / digit))
             * (n - t.t * log10(1.0 + 1.0 / digit))
             / (t.t * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
FROM c, t
"""
    o["stats_spearman"] = """
WITH base AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
r AS (SELECT rank() OVER (ORDER BY x)
             + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY y)
             + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM base),
t AS (SELECT count(*) AS nt FROM base)
SELECT round(sum((rx - (nt + 1) / 2.0) * (ry - (nt + 1) / 2.0))
             / sqrt(sum(power(rx - (nt + 1) / 2.0, 2))
                    * sum(power(ry - (nt + 1) / 2.0, 2))), 6)
           AS spearman_rho,
       cast(count(*) AS bigint) AS n
FROM r, t
"""
    o["stats_mi"] = """
WITH base AS (SELECT source AS cx, lang AS cy FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL),
jt AS (SELECT cx, cy, count(*) AS nxy FROM base GROUP BY 1, 2),
nxt AS (SELECT cx, sum(nxy) AS nx FROM jt GROUP BY 1),
nyt AS (SELECT cy, sum(nxy) AS ny FROM jt GROUP BY 1),
t AS (SELECT cast(sum(nxy) AS double) AS nn FROM jt),
mi AS (SELECT sum((nxy / nn) * ln(nxy * nn / (nx * ny))) AS mi,
              cast(sum(nxy) AS bigint) AS n
       FROM jt JOIN nxt USING (cx) JOIN nyt USING (cy), t),
hx AS (SELECT sum(-(nx / nn) * ln(nx / nn)) AS h_x FROM nxt, t),
hy AS (SELECT sum(-(ny / nn) * ln(ny / nn)) AS h_y FROM nyt, t)
SELECT round(mi, 6) AS mi_nats,
       CASE WHEN h_x > 0 AND h_y > 0
            THEN round(mi / sqrt(h_x * h_y), 6) ELSE 0.0 END AS nmi,
       round(h_x, 6) AS h_x, round(h_y, 6) AS h_y, n
FROM mi, hx, hy
"""
    o["stats_theil_sen"] = """
WITH daily AS (SELECT o_orderpriority,
                      date_diff('day', DATE '1970-01-01',
                                cast(o_orderdate AS date)) AS day,
                      cast(count(*) AS double) AS n
               FROM orders
               WHERE o_orderpriority IS NOT NULL
                 AND o_orderdate IS NOT NULL
               GROUP BY 1, 2),
pairs AS (SELECT a.o_orderpriority AS g,
                 (b.n - a.n) / (b.day - a.day) AS slope
          FROM daily a JOIN daily b
            ON a.o_orderpriority = b.o_orderpriority AND a.day < b.day),
np AS (SELECT o_orderpriority AS g, cast(count(*) AS bigint) AS n_points
       FROM daily GROUP BY 1)
SELECT p.g AS o_orderpriority, np.n_points,
       cast(count(*) AS bigint) AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) AS ts_slope
FROM pairs p JOIN np ON p.g = np.g GROUP BY 1, 2
"""
    _z = analytics.WILSON_Z
    _z2 = _z * _z
    o["stats_wilson"] = f"""
WITH g AS (SELECT source, cast(count(*) AS bigint) AS n,
                  cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS bigint) AS k
           FROM documents
           WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1)
SELECT source, n, k,
       round(k / n, 6) AS p_hat,
       round((k / n + {_z2!r} / (2 * n)) / (1 + {_z2!r} / n)
             - {_z!r} * sqrt(k / n * (1 - k / n) / n
                             + {_z2!r} / (4 * n * n))
               / (1 + {_z2!r} / n), 6) AS ci_low,
       round((k / n + {_z2!r} / (2 * n)) / (1 + {_z2!r} / n)
             + {_z!r} * sqrt(k / n * (1 - k / n) / n
                             + {_z2!r} / (4 * n * n))
               / (1 + {_z2!r} / n), 6) AS ci_high
FROM g
"""
    o["stats_zipf"] = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
             FROM documents WHERE text IS NOT NULL),
c AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
top AS (SELECT w, n FROM c ORDER BY n DESC, w ASC LIMIT 100),
l AS (SELECT ln(cast(row_number() OVER (ORDER BY n DESC, w ASC)
                     AS double)) AS x,
             ln(cast(n AS double)) AS y
      FROM top),
m AS (SELECT avg(x) AS mx, avg(y) AS my FROM l)
SELECT round(sum((x - mx) * (y - my)) / sum((x - mx) * (x - mx)), 6)
           AS zipf_slope,
       round(pow(sum((x - mx) * (y - my)), 2)
             / (sum((x - mx) * (x - mx)) * sum((y - my) * (y - my))), 6)
           AS r2,
       cast(count(*) AS bigint) AS n_tokens
FROM l, m
"""
    o["stats_cohens_d"] = """
WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
           FROM events
           WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
g AS (SELECT cast(sum(ia) AS bigint) AS na,
             cast(count(*) - sum(ia) AS bigint) AS nb,
             sum(CASE WHEN ia = 1 THEN v ELSE 0.0 END) AS sa,
             sum(CASE WHEN ia = 0 THEN v ELSE 0.0 END) AS sb,
             sum(CASE WHEN ia = 1 THEN v * v ELSE 0.0 END) AS qa,
             sum(CASE WHEN ia = 0 THEN v * v ELSE 0.0 END) AS qb
      FROM s),
p AS (SELECT na, nb, sa / na AS ma, sb / nb AS mb,
             sqrt(((qa - sa * (sa / na)) + (qb - sb * (sb / nb)))
                  / (na + nb - 2)) AS pooled
      FROM g)
SELECT round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(pooled, 6) AS pooled_sd,
       CASE WHEN na >= 2 AND nb >= 2 AND pooled > 0
            THEN round((ma - mb) / pooled, 6) END AS cohens_d,
       na AS n_a, nb AS n_b
FROM p
"""
    o["stats_lorenz"] = """
WITH r AS (SELECT o_totalprice AS v,
                  rank() OVER (ORDER BY o_totalprice)
                  + (count(*) OVER (PARTITION BY o_totalprice) - 1) / 2.0
                      AS ar,
                  count(*) OVER () AS n
           FROM orders WHERE o_totalprice IS NOT NULL),
d AS (SELECT least(10, cast(ceil(ar * 10 / n) AS int)) AS decile, v FROM r),
g AS (SELECT decile, cast(count(*) AS bigint) AS n_rows, sum(v) AS sv
      FROM d GROUP BY 1),
t AS (SELECT sum(sv) AS tot FROM g)
SELECT decile, n_rows, round(sv / tot, 6) AS value_share,
       round(sum(sv) OVER (ORDER BY decile) / tot, 6) AS cum_share
FROM g, t ORDER BY decile
"""
    o["stats_partial_corr"] = """
WITH base AS (SELECT l_quantity AS x, l_extendedprice AS y,
                     l_discount AS z
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                AND l_discount IS NOT NULL),
m AS (SELECT avg(x) AS mx, avg(y) AS my, avg(z) AS mz FROM base),
g AS (SELECT sum((x - mx) * (y - my)) AS sxy,
             sum((x - mx) * (z - mz)) AS sxz,
             sum((y - my) * (z - mz)) AS syz,
             sum((x - mx) * (x - mx)) AS sxx,
             sum((y - my) * (y - my)) AS syy,
             sum((z - mz) * (z - mz)) AS szz,
             cast(count(*) AS bigint) AS n
      FROM base, m),
r AS (SELECT CASE WHEN sxx > 0 AND syy > 0
                  THEN sxy / sqrt(sxx * syy) END AS rxy,
             CASE WHEN sxx > 0 AND szz > 0
                  THEN sxz / sqrt(sxx * szz) END AS rxz,
             CASE WHEN syy > 0 AND szz > 0
                  THEN syz / sqrt(syy * szz) END AS ryz,
             n
      FROM g)
SELECT round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
       round(ryz, 6) AS r_yz,
       CASE WHEN (1 - rxz * rxz) * (1 - ryz * ryz) > 0
            THEN round((rxy - rxz * ryz)
                       / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
            END AS partial_r,
       n
FROM r
"""
    o["stats_pct_rank"] = """
WITH c AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
SELECT o_custkey, n_orders,
       round((rank() OVER (ORDER BY n_orders)
              + (count(*) OVER (PARTITION BY n_orders) - 1) / 2.0)
             / (SELECT count(*) FROM c), 6) AS pct_rank
FROM c
"""
    o["stats_kendall"] = """
WITH daily AS (SELECT o_orderpriority,
                      date_diff('day', DATE '1970-01-01',
                                cast(o_orderdate AS date)) AS day,
                      cast(count(*) AS double) AS n
               FROM orders
               WHERE o_orderpriority IS NOT NULL
                 AND o_orderdate IS NOT NULL
               GROUP BY 1, 2),
pairs AS (SELECT a.o_orderpriority AS g,
                 sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END) AS concordant,
                 sum(CASE WHEN b.n < a.n THEN 1 ELSE 0 END) AS discordant,
                 sum(CASE WHEN b.n = a.n THEN 1 ELSE 0 END) AS ties_y
          FROM daily a JOIN daily b
            ON a.o_orderpriority = b.o_orderpriority AND a.day < b.day
          GROUP BY 1),
np AS (SELECT o_orderpriority AS g, cast(count(*) AS bigint) AS n_points,
              count(*) * (count(*) - 1) / 2 AS n0
       FROM daily GROUP BY 1)
SELECT np.g AS o_orderpriority, np.n_points,
       cast(coalesce(p.concordant, 0) AS bigint) AS concordant,
       cast(coalesce(p.discordant, 0) AS bigint) AS discordant,
       CASE WHEN np.n0 * (np.n0 - coalesce(p.ties_y, 0)) > 0
            THEN round((p.concordant - p.discordant)
                       / sqrt(np.n0 * (np.n0 - p.ties_y)), 6)
            END AS tau_b
FROM np LEFT JOIN pairs p ON p.g = np.g
"""
    o["stats_cramers_v"] = """
WITH grid AS (SELECT o_orderstatus AS x, o_orderpriority AS y,
                     count(*) AS obs
              FROM orders
              WHERE o_orderstatus IS NOT NULL
                AND o_orderpriority IS NOT NULL
              GROUP BY 1, 2),
rm AS (SELECT x, sum(obs) AS rtot FROM grid GROUP BY 1),
cm AS (SELECT y, sum(obs) AS ctot FROM grid GROUP BY 1),
t AS (SELECT sum(obs) AS n, count(DISTINCT x) AS nr,
             count(DISTINCT y) AS nc FROM grid),
c2 AS (SELECT greatest(round(sum(cast(g.obs AS double) * g.obs
                              / (rm.rtot * cm.ctot / cast(t.n AS double)))
                          - max(t.n), 6), 0.0) AS chi2,
              cast(max((t.nr - 1) * (t.nc - 1)) AS bigint) AS dof,
              cast(max(t.n) AS bigint) AS n,
              max(least(t.nr, t.nc)) AS minrc
       FROM grid g JOIN rm USING (x) JOIN cm USING (y), t)
SELECT chi2, dof,
       CASE WHEN minrc > 1
            THEN round(sqrt(chi2 / n / (minrc - 1)), 6) ELSE 0.0 END
           AS cramers_v,
       n
FROM c2
"""
    o["stats_jarque_bera"] = """
WITH b AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT g, avg(x) AS mu FROM b GROUP BY 1),
a AS (SELECT b.g, cast(count(*) AS bigint) AS n,
             sum((x - mu) * (x - mu)) AS s2,
             sum((x - mu) * (x - mu) * (x - mu)) AS s3,
             sum((x - mu) * (x - mu) * (x - mu) * (x - mu)) AS s4
      FROM b JOIN m ON b.g = m.g GROUP BY 1),
x AS (SELECT g, n, (s3 / n) / sqrt((s2 / n) * (s2 / n) * (s2 / n)) AS sk,
             (s4 / n) / ((s2 / n) * (s2 / n)) - 3.0 AS ku
      FROM a)
SELECT g AS event_type, n, round(sk, 6) AS skewness,
       round(ku, 6) AS ex_kurtosis,
       round(n / 6.0 * (sk * sk + ku * ku / 4.0), 6) AS jb
FROM x
"""
    o["stats_g_test"] = """
WITH grid AS (SELECT lang, source, cast(count(*) AS bigint) AS obs
              FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
rm AS (SELECT lang, cast(sum(obs) AS bigint) AS rtot FROM grid GROUP BY 1),
cm AS (SELECT source, cast(sum(obs) AS bigint) AS ctot
       FROM grid GROUP BY 1),
t AS (SELECT cast(sum(obs) AS bigint) AS n,
             cast(count(DISTINCT lang) AS bigint) AS nr,
             cast(count(DISTINCT source) AS bigint) AS nc FROM grid)
SELECT round(2.0 * sum(obs * ln(obs / (rm.rtot * cm.ctot
                                       / cast(t.n AS double)))), 6)
         AS g_stat,
       (max(t.nr) - 1) * (max(t.nc) - 1) AS dof,
       max(t.n) AS n
FROM grid JOIN rm USING (lang) JOIN cm USING (source), t
"""
    # Brown–Forsythe: one-way ANOVA on |x − group_median|
    o["stats_levene"] = """
WITH d AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
med AS (SELECT g, quantile_cont(x, 0.5) AS med FROM d GROUP BY 1),
z AS (SELECT d.g, abs(x - med.med) AS z FROM d JOIN med ON d.g = med.g),
s AS (SELECT g, cast(count(*) AS bigint) AS n, sum(z) AS sz,
             sum(z * z) AS szz
      FROM z GROUP BY 1 HAVING count(*) >= 2),
t AS (SELECT sum(n) AS tn, count(*) AS nk, sum(sz) AS tsz FROM s)
SELECT round((max(t.tn) - max(t.nk)) / (max(t.nk) - 1.0)
             * sum(n * (sz / n - t.tsz / t.tn) * (sz / n - t.tsz / t.tn))
             / sum(szz - sz * sz / n), 6) AS bf_stat,
       cast(max(t.nk) - 1 AS bigint) AS df1,
       cast(max(t.tn) - max(t.nk) AS bigint) AS df2,
       cast(max(t.nk) AS bigint) AS k,
       cast(max(t.tn) AS bigint) AS n_total
FROM s, t
"""
    o["stats_anova"] = """
WITH stats AS (SELECT event_type, count(*) AS n, sum(value) AS s,
                      sum(value * value) AS ss
               FROM events
               WHERE value IS NOT NULL AND event_type IS NOT NULL
               GROUP BY 1 HAVING count(*) >= 2),
per AS (SELECT n, s / n AS m, (ss - s * s / n) / (n - 1) AS v
        FROM stats WHERE (ss - s * s / n) / (n - 1) > 0),
tot AS (SELECT count(*) AS k, sum(n) AS n_total, sum(n / v) AS sw,
               sum((n / v) * m) AS swm FROM per),
o AS (SELECT k, n_total,
             sum((n / v) * (m - swm / sw) * (m - swm / sw)) AS num,
             sum(pow(1 - (n / v) / sw, 2) / (n - 1)) AS sh
      FROM per, tot GROUP BY k, n_total)
SELECT round((num / (k - 1)) / (1 + (2.0 * (k - 2) / (k * k - 1)) * sh), 6)
           AS f_stat,
       cast(k - 1 AS bigint) AS dof1,
       round((k * k - 1.0) / (3.0 * sh), 2) AS dof2,
       cast(k AS bigint) AS k, cast(n_total AS bigint) AS n_total
FROM o
"""
    # rank form over integer cents: row_number within group is the rank;
    # 2·sum(rk·v) in hugeint ≡ the Spark side's doubled decimal rank-sum
    o["stats_gini"] = """
WITH base AS (SELECT o_orderpriority AS g,
                     cast(round(o_totalprice * 100) AS bigint) AS v
              FROM orders
              WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rk
      FROM base),
t AS (SELECT g, count(*) AS n, sum(cast(v AS hugeint)) AS s,
             2 * sum(cast(rk AS hugeint) * v) AS t2
      FROM r GROUP BY g)
SELECT g AS o_orderpriority, n,
       round(cast(t2 AS double) / (n * cast(s AS double)) - (n + 1.0) / n,
             6) AS gini,
       round(cast(s AS double) / (n * 100.0), 6) AS mean_value
FROM t
"""
    o["stats_basket_lift"] = """
WITH present AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
nb AS (SELECT cast(count(DISTINCT b) AS double) AS n FROM present),
ic AS (SELECT i, count(*) AS ni FROM present GROUP BY 1),
p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_pairs
      FROM present a JOIN present b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT item_a, item_b, n_pairs,
       round(n_pairs / nb.n, 6) AS support,
       round(n_pairs / cast(ia.ni AS double), 6) AS confidence,
       round(n_pairs * nb.n / (cast(ia.ni AS double) * ib.ni), 6) AS lift
FROM p JOIN ic ia ON p.item_a = ia.i JOIN ic ib ON p.item_b = ib.i, nb
"""
    o["stats_linreg"] = """
WITH base AS (SELECT l_returnflag AS g, cast(l_quantity AS double) AS x,
                     cast(l_extendedprice AS double) AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
m AS (SELECT g, avg(x) AS mx, avg(y) AS my FROM base GROUP BY 1),
s AS (SELECT base.g, count(*) AS n,
             sum((x - mx) * (x - mx)) AS sxx,
             sum((y - my) * (y - my)) AS syy,
             sum((x - mx) * (y - my)) AS sxy,
             max(mx) AS mx, max(my) AS my
      FROM base JOIN m USING (g) GROUP BY base.g)
SELECT g AS l_returnflag, n,
       round(sxy / sxx, 6) AS slope,
       round(my - (sxy / sxx) * mx, 6) AS intercept,
       round((sxy * sxy) / (sxx * syy), 6) AS r2
FROM s
"""
    o["stats_dagostino"] = """
WITH b AS (SELECT event_type AS g, value AS x FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT g, avg(x) AS mu FROM b GROUP BY 1),
a AS (SELECT b.g, cast(count(*) AS bigint) AS n,
             sum((x - mu) * (x - mu)) AS s2,
             sum((x - mu) * (x - mu) * (x - mu)) AS s3,
             sum((x - mu) * (x - mu) * (x - mu) * (x - mu)) AS s4
      FROM b JOIN m ON b.g = m.g GROUP BY 1),
mo AS (SELECT g, n, n::DOUBLE AS nd,
              (s3 / n) / sqrt((s2 / n) * (s2 / n) * (s2 / n)) AS g1,
              (s4 / n) / ((s2 / n) * (s2 / n)) AS b2
       FROM a),
sk AS (SELECT g, n, nd, b2,
              g1 * sqrt((nd + 1) * (nd + 3) / (6.0 * (nd - 2))) AS y,
              3.0 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3)
                / ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9)) AS beta2
       FROM mo),
sk2 AS (SELECT g, n, nd, b2, y,
               sqrt(2.0 * (beta2 - 1)) - 1.0 AS w2
        FROM sk),
sk3 AS (SELECT g, n, nd, b2,
               (1.0 / sqrt(ln(sqrt(w2))))
                 * ln(y / sqrt(2.0 / (w2 - 1))
                      + sqrt((y / sqrt(2.0 / (w2 - 1)))
                             * (y / sqrt(2.0 / (w2 - 1))) + 1)) AS z1
        FROM sk2),
ku AS (SELECT g, n, nd, z1,
              (b2 - 3.0 * (nd - 1) / (nd + 1))
                / sqrt(24.0 * nd * (nd - 2) * (nd - 3)
                       / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5))) AS xk,
              6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9))
                * sqrt(6.0 * (nd + 3) * (nd + 5)
                       / (nd * (nd - 2) * (nd - 3))) AS sb1
       FROM sk3),
ku2 AS (SELECT g, n, nd, z1,
               xk,
               6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1))) AS a
        FROM ku),
ku3 AS (SELECT g, n, z1,
               (1.0 - 2.0 / (9.0 * a)
                - sign((1.0 - 2.0 / a) / (1.0 + xk * sqrt(2.0 / (a - 4))))
                  * pow(abs((1.0 - 2.0 / a) / (1.0 + xk * sqrt(2.0 / (a - 4)))),
                        1.0 / 3.0))
                 / sqrt(2.0 / (9.0 * a)) AS z2
        FROM ku2)
SELECT g AS event_type, n,
       CASE WHEN n > 8 THEN round(z1, 6) END AS skew_z,
       CASE WHEN n > 8 THEN round(z2, 6) END AS kurt_z,
       CASE WHEN n > 8 THEN round(z1 * z1 + z2 * z2, 6) END AS k2
FROM ku3
"""
    o["stats_logrank"] = """
WITH per AS (SELECT user_id,
                    cast(max(epoch_ms(ts)) - min(epoch_ms(ts)) AS DOUBLE) AS t,
                    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      = 1 AS g1
             FROM events
             WHERE user_id IS NOT NULL AND ts IS NOT NULL
             GROUP BY user_id),
pt AS (SELECT t, sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS d1,
              cast(count(*) AS bigint) AS dj
       FROM per GROUP BY t),
rk AS (SELECT t, d1, dj,
              sum(d1) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS n1j,
              sum(dj) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS nj
       FROM pt),
ag AS (SELECT sum(d1)::BIGINT AS n1, sum(dj - d1)::BIGINT AS n2,
              sum(dj::DOUBLE * n1j / nj) AS e1,
              sum(CASE WHEN nj > 1
                       THEN dj::DOUBLE * (n1j::DOUBLE / nj)
                            * (1 - n1j::DOUBLE / nj) * (nj - dj) / (nj - 1)
                       ELSE 0 END) AS vs,
              sum(d1)::DOUBLE AS o1
       FROM rk)
SELECT n1, n2, round(e1, 6) AS expected1, round(vs, 6) AS var_sum,
       round((o1 - e1) * (o1 - e1) / nullif(vs, 0), 6) AS chi2
FROM ag
"""
    o["stats_cronbach"] = """
WITH d AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
           WHERE embedding IS NOT NULL),
g AS (SELECT cast(count(*) AS bigint) AS n,
             var_samp(v[1]) + var_samp(v[2]) + var_samp(v[3]) + var_samp(v[4])
             + var_samp(v[5]) + var_samp(v[6]) + var_samp(v[7])
             + var_samp(v[8]) AS sv,
             var_samp(v[1] + v[2] + v[3] + v[4] + v[5] + v[6] + v[7] + v[8])
               AS vt
      FROM d)
SELECT n, cast(8 AS int) AS k, round(sv, 6) AS sum_item_var,
       round(vt, 6) AS total_var,
       round((8.0 / 7.0) * (1.0 - sv / nullif(vt, 0)), 6) AS alpha
FROM g
"""
    o["stats_icc"] = """
WITH b AS (SELECT user_id AS g, value AS x FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL),
per AS (SELECT g, count(*)::DOUBLE AS ni, sum(x) AS sx, sum(x * x) AS sxx
        FROM b GROUP BY g),
t AS (SELECT cast(count(*) AS bigint) AS n_groups, sum(ni) AS nn,
             sum(sx) AS tsx, sum(sxx) AS tsxx,
             sum(sx * sx / ni) AS sgm, sum(ni * ni) AS sn2
      FROM per)
SELECT n_groups, cast(nn AS bigint) AS n,
       round((nn - sn2 / nn) / nullif(n_groups - 1, 0), 6) AS k0,
       round((sgm - tsx * tsx / nn) / nullif(n_groups - 1, 0), 6) AS msb,
       round((tsxx - sgm) / nullif(nn - n_groups, 0), 6) AS msw,
       round(((sgm - tsx * tsx / nn) / nullif(n_groups - 1, 0)
              - (tsxx - sgm) / nullif(nn - n_groups, 0))
             / nullif((sgm - tsx * tsx / nn) / nullif(n_groups - 1, 0)
                      + ((nn - sn2 / nn) / nullif(n_groups - 1, 0) - 1)
                        * ((tsxx - sgm) / nullif(nn - n_groups, 0)), 0),
             6) AS icc
FROM t
"""
    o["stats_friedman"] = """
WITH m AS (SELECT (epoch_ms(ts) // 86400000) * 86400000 AS b,
                  event_type AS t, value AS x
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL
             AND value IS NOT NULL),
cells AS (SELECT b, t, avg(x) AS x FROM m GROUP BY b, t),
kt AS (SELECT count(DISTINCT t) AS k FROM cells),
complete AS (SELECT b FROM cells GROUP BY b
             HAVING count(*) = (SELECT k FROM kt)),
kept AS (SELECT cells.* FROM cells JOIN complete USING (b)),
ranked AS (SELECT b, t,
                  rank() OVER (PARTITION BY b ORDER BY x)
                  + (count(*) OVER (PARTITION BY b, x) - 1) / 2.0 AS r
           FROM kept),
rs AS (SELECT t, sum(r) AS rj FROM ranked GROUP BY t),
dims AS (SELECT count(DISTINCT b)::DOUBLE AS bb,
                count(DISTINCT t)::DOUBLE AS kk
         FROM ranked)
SELECT cast(bb AS bigint) AS n_blocks, cast(kk AS bigint) AS k,
       round(12.0 / (bb * kk * (kk + 1)) * (SELECT sum(rj * rj) FROM rs)
             - 3.0 * bb * (kk + 1), 6) AS chi2
FROM dims
"""
    o["stats_risk_ratio"] = """
WITH b AS (SELECT (lang = 'en') AS e, (n_chars >= 2000) AS o FROM documents
           WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
c AS (SELECT sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
             sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
             sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
      FROM b),
x AS (SELECT a, b, c, d,
             a::DOUBLE / nullif(a + b, 0) AS p1,
             c::DOUBLE / nullif(c + d, 0) AS p2,
             sqrt(1.0 / nullif(a, 0) - 1.0 / nullif(a + b, 0)
                  + 1.0 / nullif(c, 0) - 1.0 / nullif(c + d, 0)) AS se
      FROM c)
SELECT a, b, c, d,
       round(p1 / nullif(p2, 0), 6) AS risk_ratio,
       round(exp(ln(p1 / nullif(p2, 0)) - 1.959963984540054 * se), 6)
         AS ci_low,
       round(exp(ln(p1 / nullif(p2, 0)) + 1.959963984540054 * se), 6)
         AS ci_high,
       round(p1 - p2, 6) AS risk_diff,
       round(1.0 / nullif(abs(p1 - p2), 0), 6) AS nnt
FROM x
"""
    o["stats_tost"] = """
WITH b AS (SELECT (event_type = 'view') AS g, value AS x FROM events
           WHERE event_type IN ('view', 'click') AND value IS NOT NULL),
a AS (SELECT sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN NOT g THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN g THEN x END) AS s1,
             sum(CASE WHEN NOT g THEN x END) AS s2,
             sum(CASE WHEN g THEN x * x END) AS q1,
             sum(CASE WHEN NOT g THEN x * x END) AS q2
      FROM b),
x AS (SELECT n1, n2,
             s1 / n1 - s2 / n2 AS diff,
             (q1 - s1 * s1 / n1) / (n1 - 1) / n1 AS a1,
             (q2 - s2 * s2 / n2) / (n2 - 1) / n2 AS a2
      FROM a)
SELECT n1, n2, round(diff, 6) AS mean_diff,
       round(sqrt(a1 + a2), 6) AS se,
       round((a1 + a2) * (a1 + a2)
             / nullif(a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1), 0), 6) AS df,
       round((diff + 10.0) / nullif(sqrt(a1 + a2), 0), 6) AS t_low,
       round((diff - 10.0) / nullif(sqrt(a1 + a2), 0), 6) AS t_high
FROM x
"""
    o["stats_ab_srm"] = """
WITH keys AS (SELECT cast((user_id * 2654435761) % 4294967296 % 2 AS int)
                AS arm
              FROM (SELECT DISTINCT user_id FROM events
                    WHERE user_id IS NOT NULL)),
grid AS (SELECT arm, cast(count(*) AS bigint) AS n FROM keys GROUP BY arm),
tot AS (SELECT sum(n) AS nn FROM grid)
SELECT cast(nn AS bigint) AS n_keys,
       coalesce(max(CASE WHEN arm = 0 THEN n END), 0) AS n_a,
       coalesce(max(CASE WHEN arm = 1 THEN n END), 0) AS n_b,
       round(max(CASE WHEN arm = 0 THEN n END) / nn::DOUBLE, 6) AS share_a,
       round(sum((n - nn / 2.0) * (n - nn / 2.0) / (nn / 2.0)), 6) AS chi2
FROM grid, tot GROUP BY nn
"""
    o["stats_bartlett"] = """
WITH b AS (SELECT event_type AS g, value AS x FROM events
           WHERE event_type IS NOT NULL AND value IS NOT NULL),
per AS (SELECT g, count(*)::DOUBLE AS ni, var_samp(x) AS vi
        FROM b GROUP BY g HAVING count(*) >= 2),
t AS (SELECT cast(count(*) AS int) AS k, sum(ni) AS nn,
             sum((ni - 1) * vi) AS ssw,
             sum((ni - 1) * ln(vi)) AS slog,
             sum(1.0 / (ni - 1)) AS sinv
      FROM per)
SELECT k, cast(nn AS bigint) AS n,
       round(ssw / nullif(nn - k, 0), 6) AS pooled_var,
       round(((nn - k) * ln(ssw / nullif(nn - k, 0)) - slog)
             / nullif(1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1)), 0),
             6) AS chi2
FROM t
"""
    o["stats_poisson_rate"] = f"""
WITH b AS (SELECT epoch_ms(ts) < {MCNEMAR_SPLIT_MS} AS pre, epoch_ms(ts) AS t,
                  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS hit
           FROM events WHERE ts IS NOT NULL),
g AS (SELECT sum(CASE WHEN pre THEN hit END)::BIGINT AS k1,
             sum(CASE WHEN NOT pre THEN hit END)::BIGINT AS k2,
             max(CASE WHEN pre THEN t END) - min(CASE WHEN pre THEN t END)
               AS t1,
             max(CASE WHEN NOT pre THEN t END)
               - min(CASE WHEN NOT pre THEN t END) AS t2
      FROM b),
x AS (SELECT k1, k2, t1, t2,
             k1 / nullif(t1 / 3600000.0, 0) AS r1,
             k2 / nullif(t2 / 3600000.0, 0) AS r2
      FROM g)
SELECT k1, k2, t1 AS t1_ms, t2 AS t2_ms,
       round(r1, 6) AS rate1, round(r2, 6) AS rate2,
       round(r1 / nullif(r2, 0), 6) AS rate_ratio,
       round((r1 - r2) / nullif(sqrt(
           k1 / nullif((t1 / 3600000.0) * (t1 / 3600000.0), 0)
           + k2 / nullif((t2 / 3600000.0) * (t2 / 3600000.0), 0)), 0), 6)
         AS z
FROM x
"""
    o["stats_bhattacharyya"] = """
WITH b AS (SELECT (event_type = 'purchase') AS g,
                  cast(floor(value / 50.0) AS bigint) AS bin
           FROM events
           WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
grid AS (SELECT bin, sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS np_,
                sum(CASE WHEN NOT g THEN 1 ELSE 0 END)::BIGINT AS nq_
         FROM b GROUP BY bin),
tot AS (SELECT sum(np_) AS tp, sum(nq_) AS tq,
               cast(count(*) AS bigint) AS n_bins
        FROM grid),
s AS (SELECT any_value(tp)::BIGINT AS n_p, any_value(tq)::BIGINT AS n_q,
             any_value(n_bins) AS n_bins,
             sum(sqrt((np_ / tp::DOUBLE) * (nq_ / tq::DOUBLE))) AS bc
      FROM grid, tot)
SELECT n_p, n_q, n_bins, round(bc, 6) AS bc,
       round(-ln(bc), 6) AS b_dist,
       round(sqrt(1.0 - least(bc, 1.0)), 6) AS hellinger
FROM s
"""
    o["stats_jonckheere"] = """
WITH m AS (SELECT ((epoch_ms(ts) // 3600000) % 24) // 6 AS g,
                  cast(floor(value / 10) AS bigint) AS y
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
cells AS (SELECT g, y, cast(count(*) AS bigint) AS n FROM m GROUP BY g, y),
ul AS (SELECT sum(a.n * b.n) AS u_less
       FROM cells a JOIN cells b ON a.g < b.g AND a.y < b.y),
ue AS (SELECT sum(a.n * b.n) AS u_eq
       FROM cells a JOIN cells b ON a.g < b.g AND a.y = b.y),
sz AS (SELECT g, sum(n) AS ng FROM cells GROUP BY g),
tot AS (SELECT sum(ng) AS nn, cast(count(*) AS int) AS n_groups,
               sum(ng * ng) AS sn2,
               sum(ng * ng * (2 * ng + 3)) AS sn23
        FROM sz),
x AS (SELECT nn, n_groups,
             coalesce(u_less, 0) + 0.5 * coalesce(u_eq, 0) AS jt,
             (nn::DOUBLE * nn - sn2) / 4.0 AS mean_jt,
             (nn::DOUBLE * nn * (2 * nn + 3) - sn23) / 72.0 AS var_jt
      FROM tot, ul, ue)
SELECT cast(nn AS bigint) AS n, n_groups, round(jt, 6) AS jt,
       round(mean_jt, 6) AS mean_jt, round(var_jt, 6) AS var_jt,
       round((jt - mean_jt) / nullif(sqrt(var_jt), 0), 6) AS z
FROM x
"""
    o["stats_somers_d"] = """
WITH m AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS cx,
                  cast(floor(value / 100) AS bigint) AS cy
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
cells AS (SELECT cx, cy, cast(count(*) AS bigint) AS n FROM m
          GROUP BY cx, cy),
cc AS (SELECT sum(a.n * b.n) AS concordant
       FROM cells a JOIN cells b ON a.cx < b.cx AND a.cy < b.cy),
dd AS (SELECT sum(a.n * b.n) AS discordant
       FROM cells a JOIN cells b ON a.cx < b.cx AND a.cy > b.cy),
tt AS (SELECT sum(a.n * b.n) AS ties_y
       FROM cells a JOIN cells b ON a.cx < b.cx AND a.cy = b.cy)
SELECT (SELECT cast(count(*) AS bigint) FROM cells) AS n_cells,
       coalesce(concordant, 0)::BIGINT AS concordant,
       coalesce(discordant, 0)::BIGINT AS discordant,
       coalesce(ties_y, 0)::BIGINT AS ties_y,
       round((coalesce(concordant, 0) - coalesce(discordant, 0))
             / nullif((coalesce(concordant, 0) + coalesce(discordant, 0)
                       + coalesce(ties_y, 0))::DOUBLE, 0), 6) AS d_yx
FROM cc, dd, tt
"""
    o["stats_cohens_h"] = """
WITH b AS (SELECT (lang = 'en') AS e, (n_chars >= 2000) AS o FROM documents
           WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
g AS (SELECT sum(CASE WHEN e THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN NOT e THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS k1,
             sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS k2
      FROM b)
SELECT n1, n2,
       round(k1 / nullif(n1, 0)::DOUBLE, 6) AS p1,
       round(k2 / nullif(n2, 0)::DOUBLE, 6) AS p2,
       round(2.0 * asin(sqrt(k1 / nullif(n1, 0)::DOUBLE))
             - 2.0 * asin(sqrt(k2 / nullif(n2, 0)::DOUBLE)), 6) AS h
FROM g
"""
    o["stats_grubbs"] = """
WITH b AS (SELECT event_type AS g, value AS x FROM events
           WHERE event_type IS NOT NULL AND value IS NOT NULL),
ms AS (SELECT g, cast(count(*) AS bigint) AS n, avg(x) AS mu,
              stddev_samp(x) AS sd
       FROM b GROUP BY g),
j AS (SELECT b.g, n, mu, sd, x, round(abs(x - mu), 6) AS dev,
             row_number() OVER (PARTITION BY b.g
                                ORDER BY round(abs(x - mu), 6) DESC,
                                         x DESC) AS rn
      FROM b JOIN ms ON b.g = ms.g)
SELECT g AS event_type, n, round(mu, 6) AS mean, round(sd, 6) AS sd,
       round(x, 6) AS extreme_value,
       round(dev / nullif(sd, 0), 6) AS g
FROM j WHERE rn = 1
"""
    o["stats_gamma"] = """
WITH m AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS cx,
                  cast(floor(value / 100) AS bigint) AS cy
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
cells AS (SELECT cx, cy, cast(count(*) AS bigint) AS n FROM m
          GROUP BY cx, cy),
cc AS (SELECT sum(a.n * b.n) AS concordant
       FROM cells a JOIN cells b ON a.cx < b.cx AND a.cy < b.cy),
dd AS (SELECT sum(a.n * b.n) AS discordant
       FROM cells a JOIN cells b ON a.cx < b.cx AND a.cy > b.cy)
SELECT (SELECT cast(count(*) AS bigint) FROM cells) AS n_cells,
       coalesce(concordant, 0)::BIGINT AS concordant,
       coalesce(discordant, 0)::BIGINT AS discordant,
       round((coalesce(concordant, 0) - coalesce(discordant, 0))
             / nullif((coalesce(concordant, 0)
                       + coalesce(discordant, 0))::DOUBLE, 0), 6) AS gamma
FROM cc, dd
"""
    o["stats_fdr_bh"] = """
WITH m0 AS (SELECT event_type, value::DOUBLE AS v FROM events
            WHERE value IS NOT NULL),
per AS (SELECT event_type, count(*) AS n, sum(v) AS s, sum(v*v) AS ss
        FROM m0 GROUP BY event_type),
tot AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(ss) AS tss,
               count(*) AS m FROM per),
sc AS (SELECT p.event_type, p.n, t.m,
              ((p.s/p.n) - (t.ts - p.s)/(t.tn - p.n))
              / sqrt(((p.ss - p.s*p.s/p.n)/(p.n - 1))/p.n
                     + (((t.tss - p.ss) - (t.ts - p.s)*(t.ts - p.s)/(t.tn - p.n))
                        /(t.tn - p.n - 1))/(t.tn - p.n)) AS z
       FROM per p CROSS JOIN tot t),
pp AS (SELECT event_type, n, m, z,
              2.0 / (1.0 + exp(1.702 * abs(z))) AS p FROM sc),
rk AS (SELECT *, row_number() OVER (ORDER BY p ASC NULLS LAST, event_type ASC) AS p_rank
       FROM pp),
th AS (SELECT *, p_rank * 1.0 / m * 0.10 AS thr FROM rk),
km AS (SELECT *, max(CASE WHEN p <= thr THEN p_rank END) OVER () AS kmax
       FROM th)
SELECT event_type, n::BIGINT AS n, round(z, 6) AS z,
       round(p, 6) AS p_value, p_rank::INT AS p_rank,
       round(thr, 6) AS bh_threshold,
       (p_rank <= coalesce(kmax, 0)) AS rejected
FROM km ORDER BY p_rank
"""
    # Benjamini-Yekutieli: BH with the threshold divided by the harmonic
    # number c(m). The recursive CTE accumulates 1 + 1/2 + ... + 1/m in
    # ASCENDING order — the same fold order as the Spark side's
    # F.aggregate over sequence(1, m), so the doubles agree bit-for-bit.
    o["stats_fdr_by"] = """
WITH RECURSIVE m0 AS (SELECT event_type, value::DOUBLE AS v FROM events
            WHERE value IS NOT NULL),
per AS (SELECT event_type, count(*) AS n, sum(v) AS s, sum(v*v) AS ss
        FROM m0 GROUP BY event_type),
tot AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(ss) AS tss,
               count(*) AS m FROM per),
hr AS (SELECT 1 AS i, 1.0::DOUBLE AS c
       UNION ALL
       SELECT i + 1, c + 1.0 / (i + 1) FROM hr
       WHERE i < (SELECT m FROM tot)),
hc AS (SELECT c FROM hr ORDER BY i DESC LIMIT 1),
sc AS (SELECT p.event_type, p.n, t.m,
              ((p.s/p.n) - (t.ts - p.s)/(t.tn - p.n))
              / sqrt(((p.ss - p.s*p.s/p.n)/(p.n - 1))/p.n
                     + (((t.tss - p.ss) - (t.ts - p.s)*(t.ts - p.s)/(t.tn - p.n))
                        /(t.tn - p.n - 1))/(t.tn - p.n)) AS z
       FROM per p CROSS JOIN tot t),
pp AS (SELECT event_type, n, m, z,
              2.0 / (1.0 + exp(1.702 * abs(z))) AS p FROM sc),
rk AS (SELECT *, row_number() OVER (ORDER BY p ASC NULLS LAST, event_type ASC) AS p_rank
       FROM pp),
th AS (SELECT rk.*, p_rank * 1.0 / (m * hc.c) * 0.10 AS thr
       FROM rk CROSS JOIN hc),
km AS (SELECT *, max(CASE WHEN p <= thr THEN p_rank END) OVER () AS kmax
       FROM th)
SELECT event_type, n::BIGINT AS n, round(z, 6) AS z,
       round(p, 6) AS p_value, p_rank::INT AS p_rank,
       round(thr, 6) AS by_threshold,
       (p_rank <= coalesce(kmax, 0)) AS rejected
FROM km ORDER BY p_rank
"""
    # Holm-Bonferroni step-down: thresholds alpha/(m - i + 1) ascending;
    # the first failing rank (NULL p fails by definition) stops the
    # procedure and every earlier rank is rejected.
    o["stats_holm"] = """
WITH m0 AS (SELECT event_type, value::DOUBLE AS v FROM events
            WHERE value IS NOT NULL),
per AS (SELECT event_type, count(*) AS n, sum(v) AS s, sum(v*v) AS ss
        FROM m0 GROUP BY event_type),
tot AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(ss) AS tss,
               count(*) AS m FROM per),
sc AS (SELECT p.event_type, p.n, t.m,
              ((p.s/p.n) - (t.ts - p.s)/(t.tn - p.n))
              / sqrt(((p.ss - p.s*p.s/p.n)/(p.n - 1))/p.n
                     + (((t.tss - p.ss) - (t.ts - p.s)*(t.ts - p.s)/(t.tn - p.n))
                        /(t.tn - p.n - 1))/(t.tn - p.n)) AS z
       FROM per p CROSS JOIN tot t),
pp AS (SELECT event_type, n, m, z,
              2.0 / (1.0 + exp(1.702 * abs(z))) AS p FROM sc),
rk AS (SELECT *, row_number() OVER (ORDER BY p ASC NULLS LAST, event_type ASC) AS p_rank
       FROM pp),
th AS (SELECT *, 0.05 / (m - p_rank + 1) AS thr FROM rk),
kf AS (SELECT *, min(CASE WHEN p IS NULL OR p > thr THEN p_rank END) OVER () AS kstop
       FROM th)
SELECT event_type, n::BIGINT AS n, round(z, 6) AS z,
       round(p, 6) AS p_value, p_rank::INT AS p_rank,
       round(thr, 6) AS holm_threshold,
       (p_rank < coalesce(kstop, m + 1)) AS rejected
FROM kf ORDER BY p_rank
"""
    # Page's L on per-cell COUNTS (exact integers — engine-stable ranks;
    # ties broken by treatment id); blocks = UTC days, complete only;
    # hypothesized order = lexicographic event_type
    o["stats_page_trend"] = """
WITH m AS (SELECT epoch_ms(ts) // 86400000 AS d, event_type AS g
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
cell AS (SELECT d, g, cast(count(*) AS bigint) AS n FROM m GROUP BY 1, 2),
tot AS (SELECT cast(count(DISTINCT g) AS int) AS k FROM cell),
dc AS (SELECT d, count(*) AS kc FROM cell GROUP BY 1),
kept AS (SELECT cell.d, cell.g, cell.n, tot.k
         FROM cell JOIN dc USING (d) CROSS JOIN tot
         WHERE dc.kc = tot.k),
pos AS (SELECT g, cast(row_number() OVER (ORDER BY g) AS int) AS j
        FROM (SELECT DISTINCT g FROM cell)),
rk AS (SELECT kept.*, pos.j,
              row_number() OVER (PARTITION BY d ORDER BY n ASC, g ASC) AS r
       FROM kept JOIN pos USING (g))
SELECT cast(count(DISTINCT d) AS bigint) AS b, max(k) AS k,
       cast(sum(j * r) AS bigint) AS l_stat,
       round((sum(j * r)
              - count(DISTINCT d) * max(k) * (max(k) + 1.0)
                * (max(k) + 1.0) / 4.0)
             / nullif(sqrt(count(DISTINCT d) * max(k) * max(k)
                           * (max(k) + 1.0)
                           * (max(k) * max(k) - 1.0) / 144.0), 0),
             6) AS z
FROM rk
"""
    o["stats_power_two_prop"] = """
WITH m AS (SELECT event_type, CASE WHEN value >= 900 THEN 1 ELSE 0 END AS cv
           FROM events),
per AS (SELECT event_type, count(*)::DOUBLE AS n, sum(cv)::DOUBLE AS c
        FROM m GROUP BY event_type),
tot AS (SELECT sum(n) AS tn, sum(c) AS tc FROM per),
j AS (SELECT p.event_type, p.n, p.c / p.n AS p1,
             (t.tc - p.c) / (t.tn - p.n) AS p0, t.tc / t.tn AS pbar
      FROM per p CROSS JOIN tot t)
SELECT event_type, n::BIGINT AS n_obs,
       round(p1, 6) AS rate_group, round(p0, 6) AS rate_rest,
       round(p1 - p0, 6) AS delta,
       CAST(ceil(pow(1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
                     + 0.841621 * sqrt(p1*(1.0-p1) + p0*(1.0-p0)), 2)
                 / nullif(pow(p1 - p0, 2), 0)) AS BIGINT)
         AS n_required_per_arm
FROM j ORDER BY event_type
"""
    o["stats_mantel_haenszel"] = f"""
WITH b0 AS (SELECT epoch_ms(ts) // 86400000 AS s,
                   (user_id % 2 = 0) AS e,
                   (event_type = 'purchase') AS o
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_type IS NOT NULL),
cells AS (SELECT s,
  sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
  sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
  sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
  sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM b0 GROUP BY 1),
t AS (SELECT a, b, c, d, (a + b + c + d)::DOUBLE AS n FROM cells),
sums AS (SELECT
  count(*)::BIGINT AS n_strata,
  sum(a)::BIGINT AS sum_a,
  sum(a * d / n) AS rr,
  sum(b * c / n) AS ss,
  sum((a + b) * (a + c) / n) AS ee,
  sum(CASE WHEN a + b + c + d >= 2
        THEN ((a + b)::DOUBLE * (c + d) / n)
             * ((a + c)::DOUBLE * (b + d) / n) / (n - 1)
        ELSE 0 END) AS vv,
  sum(((a + d) / n) * (a * d / n)) AS pr,
  sum(((a + d) / n) * (b * c / n) + ((b + c) / n) * (a * d / n)) AS psqr,
  sum(((b + c) / n) * (b * c / n)) AS qs
  FROM t),
x AS (SELECT n_strata, sum_a, ee, vv,
             rr / nullif(ss, 0) AS orm,
             sqrt(pr / (2 * rr * rr) + psqr / (2 * rr * ss)
                  + qs / (2 * ss * ss)) AS se
      FROM sums)
SELECT n_strata, sum_a,
       round(orm, 6) AS or_mh,
       round(exp(ln(orm) - {1.959963984540054!r} * se), 6) AS ci_low,
       round(exp(ln(orm) + {1.959963984540054!r} * se), 6) AS ci_high,
       round(pow(abs(sum_a - ee) - 0.5, 2) / nullif(vv, 0), 6) AS chi2_mh
FROM x
"""
    o["stats_cochran_q"] = """
WITH base AS (SELECT user_id AS b, event_type AS t,
                     coalesce(value >= 100, false) AS x
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
cell AS (SELECT b, t, max(CASE WHEN x THEN 1 ELSE 0 END) AS x
         FROM base GROUP BY b, t),
kk AS (SELECT count(DISTINCT t)::INT AS k FROM cell),
nb AS (SELECT count(DISTINCT b)::BIGINT AS n_blocks FROM base),
ct AS (SELECT t, sum(x)::BIGINT AS cj FROM cell GROUP BY t),
cs AS (SELECT sum(cj)::BIGINT AS t_succ,
              sum(cj * cj)::BIGINT AS sum_c2 FROM ct),
rt AS (SELECT b, sum(x)::BIGINT AS ri FROM cell GROUP BY b),
rs AS (SELECT sum(ri * ri)::BIGINT AS sum_r2 FROM rt)
SELECT n_blocks, k, t_succ AS total_success,
       round(((k - 1)::HUGEINT
              * (k::HUGEINT * sum_c2 - t_succ::HUGEINT * t_succ))::DOUBLE
             / nullif((k::HUGEINT * t_succ - sum_r2::HUGEINT)::DOUBLE, 0), 6)
         AS q_stat
FROM nb CROSS JOIN kk CROSS JOIN cs CROSS JOIN rs
"""
