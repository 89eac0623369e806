"""text registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    BM25_PHRASE, BM25_QUERIES, BM25_TERMS, F, _FINGERPRINT_ORACLE,
    _QUALITY_ORACLE, _TOKENS_ORACLE, _docs, _langid_oracle, _stoplist_sql,
    analytics, bpe, ranking, selection, testdata, text,
)


def register(q):

    # --- text analysis ---
    q["text_langid"] = lambda spark, sf: text.language_id(_docs(spark, sf))
    q["text_quality"] = lambda spark, sf: text.quality_score(_docs(spark, sf))
    q["text_tokens"] = lambda spark, sf: text.token_stats(_docs(spark, sf))
    q["text_fingerprint"] = lambda spark, sf: text.fingerprint(_docs(spark, sf))
    q["text_winnowing"] = lambda spark, sf: text.winnow_fingerprints(
        _docs(spark, sf), k=8, w=4
    )
    q["text_tfidf_topk"] = lambda spark, sf: text.tfidf_topk(_docs(spark, sf), k=3)

    # --- ranked retrieval + windowed/statistical analytics ---
    q["text_bm25_topk"] = lambda spark, sf: ranking.bm25_topk(
        _docs(spark, sf), BM25_TERMS, k=15
    )
    q["text_scrub_numbers"] = lambda spark, sf: analytics.scrub_numbers(
        testdata.table(spark, sf, "events"), id_col="event_id", text_col="props"
    )
    q["text_bm25_multi"] = lambda spark, sf: ranking.bm25_topk_multi(
        _docs(spark, sf), BM25_QUERIES, k=5
    )
    q["text_bm25_and"] = lambda spark, sf: ranking.bm25_topk_and(
        _docs(spark, sf), BM25_TERMS, k=15
    )
    q["text_bm25_phrase"] = lambda spark, sf: ranking.bm25_topk_phrase(
        _docs(spark, sf), BM25_PHRASE, k=15
    )
    q["text_top_bigrams"] = lambda spark, sf: text.top_bigrams(_docs(spark, sf), k=20)
    q["text_repetition"] = lambda spark, sf: text.repetition_scores(_docs(spark, sf))
    q["text_lm_logprob"] = lambda spark, sf: text.lm_logprob(_docs(spark, sf))

    # --- materialized inverted index + balanced sampling ---
    def _bm25_postings(spark, sf):
        n_docs, avgdl = ranking.write_postings_table(
            _docs(spark, sf), "bm25_postings", buckets=8
        )
        return ranking.bm25_topk_postings(
            spark, "bm25_postings", n_docs, avgdl, BM25_TERMS, k=15
        )

    q["text_bm25_postings"] = _bm25_postings

    q["text_novelty"] = lambda spark, sf: text.ngram_novelty(_docs(spark, sf), n=3)
    q["text_normalize"] = lambda spark, sf: text.normalize_text(_docs(spark, sf))

    # --- data selection (quality / domain relevance — what to KEEP) ---
    q["text_quality_lr"] = lambda spark, sf: selection.quality_score_lr(
        _docs(spark, sf)
    )

    q["text_bigram_pmi"] = lambda spark, sf: text.bigram_pmi(
        _docs(spark, sf), k=20, min_count=5
    )
    q["text_lang_confusion"] = lambda spark, sf: text.langid_confusion(
        _docs(spark, sf)
    )
    # zlib byte counts aren't SQL-expressible, but the raw length and the
    # deflate bound (0 < compressed ≤ raw + 64 for any input) are: the
    # registry projects those checkable columns; the ratio itself stays
    # on text.compression_ratio for direct users, with property tests
    # pinning repetitive < natural < high-entropy ordering
    def _compress_ratio(spark, sf):
        r = text.compression_ratio(_docs(spark, sf))
        return r.filter(F.col("n_bytes").isNotNull()).select(
            "doc_id",
            "n_bytes",
            (
                (F.col("n_compressed") > 0)
                & (F.col("n_compressed") <= F.col("n_bytes") + 64)
                & (
                    F.col("ratio")
                    == F.round(
                        F.try_divide(
                            F.col("n_compressed").cast("double"),
                            F.col("n_bytes"),
                        ),
                        6,
                    )
                )
            ).alias("bounds_ok"),
        )

    q["text_compress_ratio"] = _compress_ratio
    q["text_source_overlap"] = lambda spark, sf: text.source_vocab_overlap(
        _docs(spark, sf)
    )
    q["text_bigram_entropy"] = lambda spark, sf: text.bigram_entropy(
        _docs(spark, sf)
    )

    q["text_rerank_twostage"] = lambda spark, sf: ranking.rerank_topk(
        _docs(spark, sf), BM25_TERMS, n_candidates=50, k=10
    )

    def _bpe(spark, sf):
        # training is iterative (pinned against a pure-Python reference
        # in unit tests), but the decode roundtrip is training-INVARIANT:
        # the oracle pins (n_words, n_chars, roundtrip_ok=true) per doc
        # from the raw corpus, and any encoder/decoder corruption flips
        # roundtrip_ok (was rows-only before round 5)
        docs = _docs(spark, sf)
        merges, vocab = bpe.bpe_train(docs, num_merges=30)
        return bpe.bpe_roundtrip(docs, vocab)

    q["text_bpe_encode"] = _bpe
    q["text_jsd_by_source"] = lambda spark, sf: text.js_divergence_by_group(
        _docs(spark, sf), group="source"
    )
    q["text_lm_bigram"] = lambda spark, sf: text.lm_bigram_logprob(
        _docs(spark, sf), lam=0.8
    )
    q["text_gopher_rules"] = lambda spark, sf: text.gopher_rule_flags(
        testdata.table(spark, sf, "documents")
    )
    q["text_ttr"] = lambda spark, sf: text.vocab_stats_by_group(
        _docs(spark, sf), group="source"
    )
    q["text_burrows_delta"] = lambda spark, sf: text.burrows_delta(
        _docs(spark, sf), top_n=50
    )
    q["text_readability"] = lambda spark, sf: text.readability(_docs(spark, sf))
    q["text_hapax"] = lambda spark, sf: text.hapax_by_source(_docs(spark, sf))
    q["text_yule_k"] = lambda spark, sf: text.yule_k_by_source(_docs(spark, sf))
    q["text_pii_scrub"] = lambda spark, sf: text.pii_scrub(_docs(spark, sf))
    q["text_chunk_sliding"] = lambda spark, sf: text.chunk_sliding(
        _docs(spark, sf), chunk_tokens=64, stride=48
    )
    q["text_vocab_coverage"] = lambda spark, sf: text.vocab_coverage(
        _docs(spark, sf), vocab_size=500
    )


def register_oracles(o):
    # fastText-shaped hashed linear scorer: integer milli-weight fold is
    # exact cross-engine; only the final division/sigmoid is rounded
    o["text_quality_lr"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, cast(len(toks) AS bigint) AS n,
  cast(list_sum(list_transform(toks, t ->
     (cast(concat('0x', substr(md5(t), 1, 15)) AS bigint) % 4096)
     * 2654435761 % 2001 - 1000)) AS bigint) AS lm
  FROM w)
SELECT doc_id, lm AS logit_milli, n AS n_tokens,
       round(lm / (1000.0 * n), 6) AS lr_logit,
       round(1 / (1 + exp(-lm / (1000.0 * n))), 6) AS lr_prob,
       lm > 0 AS keep
FROM s
"""
    # two-stage retrieval: BM25 recall subquery (same arithmetic) + the
    # coverage re-scorer relationally
    _rr_terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    o["text_rerank_twostage"] = f"""
WITH b AS ({ranking.bm25_oracle_sql(BM25_TERMS, k=50)}),
d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
r AS (SELECT b.doc_id, b.score AS bm25_score,
      10.0 * len(list_intersect(d.ws, [{_rr_terms}])) + b.score AS rs
      FROM b JOIN d USING (doc_id))
SELECT doc_id, bm25_score, round(rs, 6) AS rerank_score,
       cast(row_number() OVER (ORDER BY rs DESC, doc_id) AS int) AS rank
FROM r ORDER BY rs DESC, doc_id LIMIT 10
"""
    o["text_bigram_pmi"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
uc AS (SELECT wd, count(*) AS n_w
       FROM (SELECT unnest(words) AS wd FROM w) GROUP BY wd),
ba AS (SELECT bigram, count(*) AS n_pair FROM (
         SELECT words[i] || ' ' || words[i+1] AS bigram
         FROM w, unnest(generate_series(1, cast(len(words)-1 AS bigint))) AS t(i)
         WHERE len(words) >= 2)
       GROUP BY bigram),
bc AS (SELECT bigram, n_pair FROM ba WHERE n_pair >= 5),
tu AS (SELECT sum(n_w) AS t_uni FROM uc),
tb AS (SELECT sum(n_pair) AS t_bi FROM ba),
s AS (SELECT bigram, n_pair,
      round(ln((n_pair / t_bi)
               / ((u1.n_w / t_uni) * (u2.n_w / t_uni))), 6) AS pmi,
      (n_pair / t_bi) / ((u1.n_w / t_uni) * (u2.n_w / t_uni)) AS raw
      FROM bc JOIN uc u1 ON string_split(bigram, ' ')[1] = u1.wd
              JOIN uc u2 ON string_split(bigram, ' ')[2] = u2.wd, tu, tb)
SELECT bigram, n_pair, pmi,
       cast(row_number() OVER (ORDER BY ln(raw) DESC, bigram) AS int) AS rank
FROM s ORDER BY ln(raw) DESC, bigram LIMIT 20
"""
    _lc_scores = ",\n  ".join(
        f"len(list_distinct(list_intersect(words, {_stoplist_sql(lang)})))"
        f" AS s_{lang}"
        for lang in text.LANG_ORDER
    )
    _lc_best = (
        "greatest(" + ", ".join(f"s_{lang}" for lang in text.LANG_ORDER) + ")"
    )
    _lc_case = "CASE " + " ".join(
        f"WHEN s_{lang} = {_lc_best} THEN '{lang}'"
        for lang in text.LANG_ORDER
    ) + " END"
    o["text_lang_confusion"] = f"""
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
           FROM documents),
s AS (SELECT doc_id, {_lc_scores} FROM w),
pred AS (SELECT doc_id, {_lc_case} AS pred_lang FROM s),
conf AS (SELECT d.lang, p.pred_lang, cast(count(*) AS bigint) AS n
         FROM documents d JOIN pred p USING (doc_id)
         WHERE d.lang IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT lang, sum(n) AS rt FROM conf GROUP BY 1)
SELECT conf.lang, pred_lang, n, round(n / t.rt, 6) AS row_share
FROM conf JOIN tot t USING (lang)
"""
    o["text_winnowing"] = """
WITH pos AS (SELECT doc_id, text, greatest(length(text) - 7, 1) AS n_pos
             FROM documents WHERE text IS NOT NULL),
g AS (SELECT doc_id, n_pos, text,
             unnest(generate_series(1, cast(n_pos AS bigint))) AS p FROM pos),
h AS (SELECT doc_id, n_pos, p,
             cast(concat('0x', substr(md5(substr(text, cast(p AS int), 8)), 1, 15)) AS bigint) AS h
      FROM g),
wm AS (SELECT doc_id, p, n_pos,
              min(h) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       FROM h),
mins AS (SELECT DISTINCT doc_id, wmin FROM wm WHERE p <= greatest(n_pos - 3, 1))
SELECT doc_id, cast(count(*) AS int) AS n_fingerprints,
       md5(array_to_string(list_sort(list(wmin)), ',')) AS fp_digest
FROM mins GROUP BY doc_id
"""
    o["text_langid"] = _langid_oracle()
    o["text_quality"] = _QUALITY_ORACLE
    o["text_tokens"] = _TOKENS_ORACLE
    o["text_fingerprint"] = _FINGERPRINT_ORACLE
    # ln() agrees bit-for-bit between JVM and DuckDB on these inputs; score
    # additionally rounded to 6 on both sides
    o["text_tfidf_topk"] = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id, term, tf, df,
         tf * ln((SELECT count(*) FROM documents) / df::DOUBLE) AS score
  FROM tf JOIN dfq USING (term)
),
ranked AS (SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
           FROM scored)
SELECT doc_id, term, tf, df, round(score, 6) AS score, cast(rank AS int) AS rank
FROM ranked WHERE rank <= 3
"""

    o["text_bm25_topk"] = ranking.bm25_oracle_sql(BM25_TERMS, k=15)
    o["text_bm25_multi"] = ranking.bm25_multi_oracle_sql(BM25_QUERIES, k=5)
    o["text_bm25_and"] = ranking.bm25_oracle_sql(BM25_TERMS, k=15, conjunctive=True)
    o["text_bm25_phrase"] = ranking.bm25_oracle_sql(
        sorted(set(BM25_PHRASE.split())), k=15, phrase=BM25_PHRASE
    )
    o["text_top_bigrams"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, cast(len(words)-1 AS bigint)),
                                   i -> words[i] || ' ' || words[i+1])) AS bigram
      FROM w WHERE len(words) >= 2),
c AS (SELECT bigram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
      FROM p GROUP BY bigram)
SELECT bigram, n_occurrences, n_docs,
       cast(row_number() OVER (ORDER BY n_occurrences DESC, bigram ASC) AS int) AS rank
FROM c ORDER BY n_occurrences DESC, bigram ASC LIMIT 20
"""
    o["text_repetition"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
b AS (SELECT doc_id, words,
             list_transform(generate_series(1, cast(len(words)-1 AS bigint)),
                            i -> words[i] || ' ' || words[i+1]) AS bigrams
      FROM w)
SELECT doc_id,
       cast(len(words) AS bigint) AS n_tokens,
       round(cast(len(list_distinct(words)) AS double) / len(words), 6)
         AS uniq_word_frac,
       round(CASE WHEN len(bigrams) > 0
                  THEN 1.0 - cast(len(list_distinct(bigrams)) AS double) / len(bigrams)
                  ELSE 0.0 END, 6) AS dup_bigram_frac
FROM b
"""
    o["text_lm_logprob"] = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
t AS (SELECT sum(cnt) AS total FROM c)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(cnt / total)), 3) AS avg_logp
FROM w JOIN c USING (tok), t
GROUP BY doc_id
"""
    o["text_scrub_numbers"] = """
SELECT event_id, cast(len(regexp_extract_all(props, '[0-9]+')) AS int) AS n_masked,
       md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS scrub_digest
FROM events
"""
    # identical output contract to text_bm25_topk: the postings table is a
    # physical-layout change, not a semantic one
    o["text_bm25_postings"] = ranking.bm25_oracle_sql(BM25_TERMS, k=15)
    o["text_novelty"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(words) >= 3
        THEN list_transform(generate_series(1, cast(len(words)-2 AS bigint)),
                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        ELSE [array_to_string(words, ' ')] END)) AS gram FROM w),
d AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
SELECT doc_id, count(*) AS n_grams,
       cast(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
       round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) / count(*), 6) AS novelty
FROM g JOIN d USING (gram) GROUP BY doc_id
"""
    o["text_normalize"] = """
WITH n AS (SELECT doc_id, text,
                  trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents)
SELECT doc_id, md5(norm) AS norm_digest,
       cast(strlen(norm) AS INT) AS norm_chars,
       cast(strlen(text) - strlen(norm) AS INT) AS removed_chars
FROM n
"""
    o["text_bigram_entropy"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, cast(len(words) - 1 AS bigint)),
                 i -> words[i] || ' ' || words[i + 1])) AS bg
      FROM w WHERE len(words) >= 2),
cnt AS (SELECT doc_id, bg, cast(count(*) AS bigint) AS c
        FROM p GROUP BY 1, 2),
tot AS (SELECT doc_id, cast(sum(c) AS bigint) AS nb FROM cnt GROUP BY 1),
per AS (SELECT cnt.doc_id, max(tot.nb) AS n_bigrams,
               round(-sum((c / cast(nb AS double))
                          * ln(c / cast(nb AS double))), 6) AS entropy,
               round(ln(cast(count(*) AS double)), 6) AS max_entropy
        FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id GROUP BY 1)
SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
       per.entropy, per.max_entropy
FROM documents d LEFT JOIN per USING (doc_id)
"""
    o["text_jsd_by_source"] = """
WITH t AS (SELECT source AS g, unnest(string_split(text, ' ')) AS w
           FROM documents
           WHERE text IS NOT NULL AND source IS NOT NULL),
grid AS (SELECT g, w, count(*) AS c FROM t GROUP BY 1, 2),
gtot AS (SELECT g, sum(c) AS gt FROM grid GROUP BY 1),
corpus AS (SELECT w, sum(c) AS cc FROM grid GROUP BY 1),
ctot AS (SELECT sum(c) AS ct FROM grid)
SELECT g AS source, cast(sum(c) AS bigint) AS n_words,
       round(0.5 * sum((c / gt) * log2(2.0 * (c / gt) / (c / gt + cc / ct)))
           + 0.5 * sum((cc / ct) * log2(2.0 * (cc / ct) / (c / gt + cc / ct)))
           + 0.5 * (1.0 - sum(cc / ct)), 6) AS jsd
FROM grid JOIN gtot USING (g) JOIN corpus USING (w), ctot
GROUP BY g
"""
    o["text_lm_bigram"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE text IS NOT NULL),
s AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM d, unnest(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2),
bi AS (SELECT w1, w2, count(*) AS n_bi FROM s GROUP BY 1, 2),
uni AS (SELECT unnest(w) AS word FROM d),
u AS (SELECT word, count(*) AS n_w FROM uni GROUP BY 1),
tot AS (SELECT sum(n_w) AS t_uni FROM u)
SELECT s.doc_id, count(*) AS n_trans,
       round(avg(ln(0.8 * (bi.n_bi / u1.n_w)
                    + 0.2 * (u2.n_w / tot.t_uni))), 3) AS avg_logp
FROM s
JOIN bi USING (w1, w2)
JOIN u u1 ON s.w1 = u1.word
JOIN u u2 ON s.w2 = u2.word, tot
GROUP BY s.doc_id
"""
    o["text_ttr"] = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
             FROM documents
             WHERE source IS NOT NULL AND text IS NOT NULL),
c AS (SELECT source, w, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT source,
       cast(count(*) AS bigint) AS vocab,
       cast(sum(n) AS bigint) AS total_tokens,
       cast(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS bigint) AS hapax,
       round(count(*) / cast(sum(n) AS double), 6) AS ttr,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
             / cast(count(*) AS double), 6) AS hapax_frac
FROM c GROUP BY 1
"""
    o["text_source_overlap"] = """
WITH st AS (SELECT DISTINCT source AS g,
                   unnest(string_split(text, ' ')) AS t
            FROM documents
            WHERE source IS NOT NULL AND text IS NOT NULL),
v AS (SELECT g, cast(count(*) AS bigint) AS vs FROM st GROUP BY 1),
p AS (SELECT a.g AS source_a, b.g AS source_b,
             cast(count(*) AS bigint) AS n_shared
      FROM st a JOIN st b ON a.t = b.t AND a.g < b.g GROUP BY 1, 2)
SELECT source_a, source_b, n_shared,
       round(n_shared / cast(va.vs + vb.vs - n_shared AS double), 6)
         AS jaccard
FROM p JOIN v va ON p.source_a = va.g JOIN v vb ON p.source_b = vb.g
"""
    o["text_gopher_rules"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
m AS (SELECT doc_id, len(words) AS nw,
             list_sum(list_transform(words, x -> len(x))) AS tc,
             len(list_distinct(words)) AS nd,
             len(list_distinct(list_intersect(words, {_stoplist_sql('en')}))) AS sh
      FROM w),
r AS (SELECT doc_id, nw, sh,
             round(tc / cast(nw AS double), 6) AS mwl,
             round(1.0 - nd / cast(nw AS double), 6) AS df
      FROM m)
SELECT doc_id, cast(nw AS int) AS n_words, mwl AS mean_word_len,
       df AS dup_frac, cast(sh AS int) AS stop_hits,
       nw BETWEEN 10 AND 1000 AS ok_words,
       mwl BETWEEN 2.0 AND 12.0 AS ok_word_len,
       df <= 0.6 AS ok_dup,
       sh >= 1 AS ok_stop,
       (nw BETWEEN 10 AND 1000) AND (mwl BETWEEN 2.0 AND 12.0)
           AND df <= 0.6 AND sh >= 1 AS passes
FROM r
"""
    # --- round 5: training-invariant projections for the formerly
    # rows-only iterative entries (BPE / PCA / zlib) ---
    # BPE decode is lossless for ANY merge table: the oracle pins the
    # whitespace-normalized word/char counts and roundtrip_ok=true from
    # the raw corpus; docs with no non-empty word never enter the encoder
    o["text_bpe_encode"] = """
WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
       cast(len(ws) AS bigint) AS n_words,
       cast(length(array_to_string(ws, ' ')) AS bigint) AS n_chars,
       true AS roundtrip_ok
FROM w WHERE len(ws) > 0
"""
    # zlib byte counts are a library property, but the raw byte length
    # and the deflate bound (0 < compressed <= raw + 64) are checkable
    o["text_compress_ratio"] = """
SELECT doc_id, cast(strlen(text) AS bigint) AS n_bytes, true AS bounds_ok
FROM documents WHERE text IS NOT NULL
"""
    o["text_burrows_delta"] = """
WITH toks AS (SELECT source AS src, tok
              FROM (SELECT source,
                           unnest(string_split_regex(lower(text), '\\s+'))
                             AS tok
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL)
              WHERE tok <> ''),
counts AS (SELECT src, tok, cast(count(*) AS bigint) AS n
           FROM toks GROUP BY src, tok),
totals AS (SELECT src, sum(n) AS tot FROM counts GROUP BY src),
top AS (SELECT tok FROM (SELECT tok, sum(n) AS cn FROM counts GROUP BY tok)
        ORDER BY cn DESC, tok ASC LIMIT 50),
grid AS (SELECT totals.src, top.tok,
                coalesce(counts.n, 0) / totals.tot::DOUBLE AS f
         FROM totals CROSS JOIN top
         LEFT JOIN counts ON counts.src = totals.src
                         AND counts.tok = top.tok),
st AS (SELECT tok, avg(f) AS mu, stddev_samp(f) AS sd FROM grid
       GROUP BY tok),
z AS (SELECT src, grid.tok,
             round((f - mu) / nullif(sd, 0), 6) AS z
      FROM grid JOIN st ON grid.tok = st.tok)
SELECT a.src AS source_a, b.src AS source_b,
       cast(count(*) AS int) AS n_words,
       round(avg(abs(a.z - b.z)), 6) AS delta
FROM z a JOIN z b ON a.tok = b.tok AND a.src < b.src
GROUP BY a.src, b.src
"""
    o["text_readability"] = """
SELECT doc_id,
       cast(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS int) AS n_words,
       cast(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS int)
         AS n_sentences,
       cast(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS int)
         AS n_syllables,
       round(206.835
             - 1.015 * len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             - 84.6 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
                      / nullif(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 0),
             6) AS flesch
FROM documents WHERE text IS NOT NULL
"""
    o["text_hapax"] = """
WITH toks AS (SELECT source, tok
              FROM (SELECT source,
                           unnest(string_split_regex(lower(text), '\\s+')) AS tok
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL)
              WHERE tok <> ''),
per AS (SELECT source, tok, cast(count(*) AS bigint) AS n
        FROM toks GROUP BY source, tok)
SELECT source, sum(n)::BIGINT AS n_tokens,
       cast(count(*) AS bigint) AS vocab,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
             / nullif(count(*), 0)::DOUBLE, 6) AS hapax_ratio
FROM per GROUP BY source
"""
    o["text_pii_scrub"] = """
SELECT doc_id,
       cast(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS int)
         AS n_email,
       cast(len(regexp_extract_all(text,
            '[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}')) AS int) AS n_phone,
       cast(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS int)
         AS n_url,
       cast(len(regexp_extract_all(text, '[0-9]{9,}')) AS int)
         AS n_long_digits,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
            '[REDACTED_EMAIL]', 'g'),
            '[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}', '[REDACTED_PHONE]', 'g'),
            'https?://[^\\s]+', '[REDACTED_URL]', 'g'),
            '[0-9]{9,}', '[REDACTED_LONG_DIGITS]', 'g')) AS scrub_digest
FROM documents WHERE text IS NOT NULL
"""
    o["text_chunk_sliding"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
nn AS (SELECT doc_id, t, len(t) AS n FROM w WHERE len(t) > 0),
ex AS (SELECT doc_id, t, n,
              unnest(generate_series(0, CAST(n - 1 AS BIGINT), 48)) AS start_tok
       FROM nn)
SELECT doc_id, (start_tok // 48)::INT AS chunk_id, start_tok::INT AS start_tok,
       least(64, n - start_tok)::INT AS n_tok,
       md5(array_to_string(list_slice(t, start_tok + 1, start_tok + 64), ' '))
         AS chunk_digest
FROM ex ORDER BY doc_id, chunk_id
"""
    o["text_vocab_coverage"] = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tk AS (SELECT * FROM toks WHERE tok <> ''),
vocab AS (SELECT tok FROM (SELECT tok, count(*) AS cn FROM tk GROUP BY tok
                           ORDER BY cn DESC, tok ASC LIMIT 500)),
m AS (SELECT tk.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM tk LEFT JOIN vocab v ON tk.tok = v.tok)
SELECT doc_id, count(*) AS n_tokens, sum(oov)::BIGINT AS n_oov,
       round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
FROM m GROUP BY doc_id ORDER BY doc_id
"""
    o["text_yule_k"] = """
WITH toks AS (SELECT source, tok
              FROM (SELECT source,
                           unnest(string_split_regex(lower(text), '\\s+')) AS tok
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL)
              WHERE tok <> ''),
per AS (SELECT source, tok, cast(count(*) AS bigint) AS n
        FROM toks GROUP BY source, tok),
agg AS (SELECT source, sum(n)::BIGINT AS n_tokens,
               cast(count(*) AS bigint) AS vocab,
               sum(n * n)::BIGINT AS s2
        FROM per GROUP BY source)
SELECT source, n_tokens, vocab,
       round(1e4 * (s2 - n_tokens)
             / nullif((n_tokens * n_tokens)::DOUBLE, 0), 6) AS yule_k,
       round((s2 - n_tokens)
             / nullif((n_tokens * (n_tokens - 1))::DOUBLE, 0), 6)
         AS simpson_d
FROM agg
"""
