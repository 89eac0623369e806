"""dedup registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    F, _COSINE_PAIRS_ORACLE, _EDGES_CTE, _PAIR_GUARD_FLOOR,
    _PAIR_GUARD_FRAC, _REACH_CTE, _SIMHASH_ORACLE, _docs, _emb,
    _guarded_pairs_cte, _jaccard_oracle, _pair_guard_limit,
    _passage_oracle, _shingles_cte, _stoplist_sql, dedup, embeddings_gemm,
    sampling, selection, text,
)


def register(q):

    # --- dedup ---
    q["dedup_exact"] = lambda spark, sf: dedup.exact_duplicates(_docs(spark, sf))
    # which source copies which: exact-copy pairs bucketed by source
    # pair, at PASSAGE grain (8-word windows — whole-doc grain is the
    # trivial md5 swap, but the synthetic corpus has no full-doc dups,
    # so the passage unit is what actually exercises the matrix)
    def _src_matrix(spark, sf):
        words = F.split(F.col("text"), " ")
        npass = F.ceil(F.size(words) / F.lit(8)).cast("int")
        passages = F.transform(
            F.sequence(F.lit(0), npass - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i * 8 + 1, 8)),
        )
        units = (
            _docs(spark, sf)
            .filter(F.col("text").isNotNull())
            .select("source", F.explode(passages).alias("text"))
        )
        return dedup.cross_source_dup_matrix(units)

    q["dedup_source_matrix"] = _src_matrix
    q["dedup_passages"] = lambda spark, sf: dedup.passage_dup_stats(
        _docs(spark, sf), k=8
    )
    # overlapping windows (stride < k): catches duplicated passages at
    # offsets the non-overlapping pass misses, at a k/stride=2x
    # passage-replication cost (BASELINE.md)
    q["dedup_passages_strided"] = lambda spark, sf: dedup.passage_dup_stats(
        _docs(spark, sf), k=8, stride=4
    )
    q["dedup_ngram_jaccard"] = lambda spark, sf: dedup.ngram_jaccard_pairs(
        _docs(spark, sf), n=3, threshold=0.5,
        stop_shingle_df_limit=_pair_guard_limit(spark, sf),
    )
    # unguarded exact join — opt-in; quadratic inside hot-shingle groups,
    # kept as the semantic baseline (the guarded default drops ubiquitous
    # shingles before pairing)
    q["dedup_ngram_jaccard_raw"] = lambda spark, sf: dedup.ngram_jaccard_pairs(
        _docs(spark, sf), n=3, threshold=0.5
    )
    q["dedup_minhash_lsh"] = lambda spark, sf: dedup.minhash_lsh_pairs(
        _docs(spark, sf), n=3, num_hashes=128, bands=32, threshold=0.5
    )
    q["dedup_simhash"] = lambda spark, sf: dedup.simhash_pairs(
        _docs(spark, sf), max_hamming=6, banded=True
    )
    q["dedup_embedding_cosine"] = lambda spark, sf: dedup.embedding_cosine_pairs(
        _emb(spark, sf), threshold=0.45
    )
    q["dedup_embedding_cosine_gemm"] = lambda spark, sf: embeddings_gemm.embedding_cosine_pairs_gemm(
        _emb(spark, sf), threshold=0.45
    )

    q["dedup_decontaminate"] = lambda spark, sf: dedup.decontaminate(
        _docs(spark, sf).filter(F.col("doc_id") % 10 != 0),
        _docs(spark, sf).filter(F.col("doc_id") % 10 == 0),
        n=4,
    )

    # content-defined chunking: boundary = rolling-hash mask hit, so
    # shared BLOCKS survive insertions that would shift fixed blocks;
    # pairs entry catches block-level reuse below the jaccard threshold
    q["dedup_cdc_chunks"] = lambda spark, sf: dedup.cdc_doc_summary(
        _docs(spark, sf)
    )
    q["dedup_cdc_pairs"] = lambda spark, sf: dedup.cdc_shared_pairs(
        _docs(spark, sf), stop_chunk_df_limit=_pair_guard_limit(spark, sf)
    )

    q["dedup_clusters"] = lambda spark, sf: dedup.connected_components(
        dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        ),
        _docs(spark, sf).select("doc_id"),
    )
    # diameter-independent variant (large-star/small-star) — same result,
    # same oracle; the scale path when near-dup chains run long
    q["dedup_clusters_alternating"] = lambda spark, sf: dedup.connected_components_alternating(
        dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        ),
        _docs(spark, sf).select("doc_id"),
    )

    def _keep_best(spark, sf):
        docs = _docs(spark, sf)
        clusters = dedup.connected_components(
            dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=0.5,
                stop_shingle_df_limit=_pair_guard_limit(spark, sf),
            ),
            docs.select("doc_id"),
        )
        return dedup.keep_best_per_cluster(
            clusters, text.quality_score(docs), score_col="quality"
        )

    q["dedup_keep_best"] = _keep_best
    q["dedup_embedding_srp"] = lambda spark, sf: dedup.embedding_srp_pairs(
        _emb(spark, sf), threshold=0.45
    )
    q["dedup_containment"] = lambda spark, sf: dedup.containment_pairs(
        _docs(spark, sf), n=3, threshold=0.8,
        stop_shingle_df_limit=_pair_guard_limit(spark, sf),
    )
    q["dedup_decontaminate_fuzzy"] = lambda spark, sf: selection.decontaminate_fuzzy(
        _docs(spark, sf).filter(F.col("doc_id") % 10 != 0),
        _docs(spark, sf).filter(F.col("doc_id") % 10 == 0),
    )
    q["dedup_semantic"] = lambda spark, sf: selection.semantic_survivors(
        _emb(spark, sf)
    )

    def _mh_incremental(spark, sf):
        # history (80%) indexed once; the new batch (20%) appended; pairs
        # involving a new doc served from the stored index — history is
        # never re-tokenized
        docs = _docs(spark, sf)
        dedup.write_minhash_index(docs.filter(F.col("doc_id") % 5 != 0), "mh_index")
        dedup.append_minhash_index(docs.filter(F.col("doc_id") % 5 == 0), "mh_index")
        return dedup.minhash_incremental_pairs(
            spark, "mh_index", F.col("doc_id") % 5 == 0, threshold=0.5
        )

    q["dedup_minhash_incremental"] = _mh_incremental

    def _split_leakage(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        splits = sampling.train_val_test_split(
            _docs(spark, sf).select("doc_id"), id_col="doc_id",
            weights={"train": 0.8, "val": 0.1, "test": 0.1},
        )
        return dedup.split_leakage(pairs, splits)

    q["dedup_split_leakage"] = _split_leakage
    q["dedup_family_sizes"] = lambda spark, sf: dedup.duplicate_family_sizes(
        _docs(spark, sf)
    )
    q["dedup_passage_scrub"] = lambda spark, sf: dedup.scrub_duplicate_passages(
        _docs(spark, sf), k=8
    )

    def _emb_decontaminate(spark, sf):
        # embedding-space decontamination: the first 50 vectors act as
        # the "benchmark" set, the rest as the training corpus
        e = _emb(spark, sf)
        return dedup.embedding_srp_join(
            e.filter(F.col("vec_id") >= 50),
            e.filter(F.col("vec_id") < 50),
            threshold=0.45,
        )

    q["dedup_decontaminate_emb"] = _emb_decontaminate
    q["dedup_shingle_profile"] = lambda spark, sf: dedup.shingle_df_profile(
        _docs(spark, sf)
    )
    q["dedup_prefix_hash"] = lambda spark, sf: dedup.prefix_duplicates(
        _docs(spark, sf), k_tokens=8
    )


def register_oracles(o):

    o["dedup_exact"] = (
        # text IS NOT NULL mirrors the operator: md5(NULL) is NULL and
        # would pool every content-less doc into one fake dup group
        "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count "
        "FROM documents WHERE text IS NOT NULL GROUP BY md5(text)"
    )
    # per-hash source grid self-join; integer pair arithmetic on both
    # sides (c*(c-1) is even, so the /2 is exact); the chr(0) sentinel
    # mirrors the operator's NULL-source bucket
    o["dedup_source_matrix"] = """
WITH w AS (SELECT source, string_split(text, ' ') AS words
           FROM documents WHERE text IS NOT NULL),
u AS (SELECT source,
             array_to_string(words[(pos*8+1):(pos*8+8)], ' ') AS unit
      FROM w, unnest(generate_series(0, cast(ceil(len(words)/8.0) AS bigint) - 1))
             AS t(pos)),
g AS (SELECT md5(unit) AS h,
                  coalesce(source, chr(0) || 'unattributed') AS src,
                  count(*) AS c
           FROM u GROUP BY 1, 2),
p AS (SELECT a.src AS sa, b.src AS sb,
             cast(CASE WHEN a.src = b.src THEN a.c * (a.c - 1) / 2
                       ELSE a.c * b.c END AS bigint) AS np
      FROM g a JOIN g b USING (h) WHERE a.src <= b.src),
q AS (SELECT sa, sb, cast(sum(np) AS bigint) AS dup_pairs,
             count(*) AS dup_groups
      FROM p WHERE np > 0 GROUP BY 1, 2)
SELECT nullif(sa, chr(0) || 'unattributed') AS source_a,
       nullif(sb, chr(0) || 'unattributed') AS source_b,
       dup_pairs, dup_groups
FROM q
"""
    o["dedup_ngram_jaccard"] = _jaccard_oracle(0.5, capped=True)
    o["dedup_ngram_jaccard_raw"] = _jaccard_oracle(0.5)
    # 10% of docs (doc_id % 10 = 0) act as the "benchmark" split; the
    # Spark side joins on xxhash64(gram), the oracle on the gram string —
    # identical counts up to 64-bit collisions (same argument as jaccard)
    o["dedup_decontaminate"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(words) >= 4
        THEN list_transform(generate_series(1, cast(len(words)-3 AS bigint)),
                            i -> array_to_string(words[i:i+3], ' '))
        ELSE [array_to_string(words, ' ')] END)) AS gram FROM w),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
SELECT g.doc_id AS doc_id, count(DISTINCT g.gram) AS matched_ngrams
FROM g JOIN bench USING (gram)
WHERE g.doc_id % 10 <> 0
GROUP BY g.doc_id
"""
    # same md5 rolling-hash boundaries + chunk assembly, relationally
    _CDC_CTE = """
d AS (SELECT doc_id, text, length(text) AS L FROM documents),
pos AS (SELECT doc_id, text, unnest(generate_series(1, cast(greatest(L - 7, 1) AS bigint))) AS p FROM d),
hb AS (SELECT doc_id, text, p FROM pos
       WHERE cast(concat('0x', substr(md5(substr(text, cast(p AS int), 8)), 1, 15)) AS bigint) % 32 = 0
         AND p > 1),
sn AS (SELECT doc_id, text, cast(1 AS bigint) AS p FROM d
       UNION ALL SELECT doc_id, text, cast(L + 1 AS bigint) FROM d),
bnd AS (SELECT DISTINCT doc_id, text, p FROM (SELECT * FROM hb UNION ALL SELECT * FROM sn)),
iv AS (SELECT doc_id, text, p AS start,
              lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS nxt FROM bnd),
ch AS (SELECT doc_id, cast(nxt - start AS int) AS len,
              md5(substr(text, cast(start AS int), cast(nxt - start AS int))) AS h
       FROM iv WHERE nxt IS NOT NULL AND nxt > start)
"""
    o["dedup_cdc_chunks"] = f"""
WITH {_CDC_CTE}
SELECT doc_id, cast(count(*) AS int) AS n_chunks,
       round(avg(len), 6) AS avg_chunk_len,
       md5(string_agg(h, ',' ORDER BY h)) AS chunks_digest
FROM ch GROUP BY doc_id
"""
    o["dedup_cdc_pairs"] = f"""
WITH {_CDC_CTE},
c2 AS (SELECT DISTINCT doc_id, h, len FROM ch WHERE len >= 24),
hot AS (SELECT h FROM c2 GROUP BY h
        HAVING count(*) > greatest({_PAIR_GUARD_FLOOR},
               cast(ceil({_PAIR_GUARD_FRAC} * (SELECT count(*) FROM documents)) AS bigint))),
cf AS (SELECT c2.* FROM c2 ANTI JOIN hot USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS shared_chunks, cast(sum(a.len) AS bigint) AS shared_bytes
FROM cf a JOIN cf b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    # LSH at 128 hashes / 32 bands has ~1 recall at j≥0.5 → oracle is the
    # exact pair set (verified empirically on the driver's sf before shipping)
    o["dedup_minhash_lsh"] = _jaccard_oracle(0.5)
    # incremental LSH serves the same exact pair set (recall argument as
    # dedup_minhash_lsh), restricted to pairs touching the new batch
    o["dedup_minhash_incremental"] = f"""
WITH {_shingles_cte(capped=False)}
SELECT doc_a, doc_b,
       round(common / (ca.n_sh + cb.n_sh - common), 6) AS jaccard
FROM p JOIN c ca ON p.doc_a = ca.doc_id JOIN c cb ON p.doc_b = cb.doc_id
WHERE round(common / (ca.n_sh + cb.n_sh - common), 6) >= 0.5
  AND (doc_a % 5 = 0 OR doc_b % 5 = 0)
"""
    # LSH recall ≈ 1 at 128/32 for j ≥ 0.5 (same argument as
    # dedup_minhash_lsh) → oracle is the exact cross-set pair set
    o["dedup_decontaminate_fuzzy"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(words) >= 3
        THEN list_transform(generate_series(1, cast(len(words)-2 AS bigint)),
                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        ELSE [array_to_string(words, ' ')] END)) AS sh FROM w),
c AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
p AS (SELECT a.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS common
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
      GROUP BY 1, 2)
SELECT p.doc_id, p.bench_id,
       round(common / (ca.n_sh + cb.n_sh - common), 6) AS jaccard
FROM p JOIN c ca ON p.doc_id = ca.doc_id JOIN c cb ON p.bench_id = cb.doc_id
WHERE round(common / (ca.n_sh + cb.n_sh - common), 6) >= 0.5
"""
    # SRP-LSH recall ≈ 1 at the verified threshold (dedup_embedding_srp's
    # oracle is the exact pair set) → components over exact cosine pairs
    o["dedup_semantic"] = """
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb
          FROM nn a JOIN nn b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45),
edges AS (SELECT va AS s, vb AS d FROM pairs UNION ALL SELECT vb, va FROM pairs),
reach(node, root) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e2.d, r.root FROM reach r JOIN edges e2 ON e2.s = r.node)
SELECT node AS vec_id, min(root) AS rep_id, node = min(root) AS survivor
FROM reach GROUP BY node
"""
    o["dedup_simhash"] = _SIMHASH_ORACLE
    o["dedup_embedding_cosine"] = _COSINE_PAIRS_ORACLE
    o["dedup_embedding_cosine_gemm"] = _COSINE_PAIRS_ORACLE
    o["dedup_clusters"] = f"""
WITH RECURSIVE {_shingles_cte(capped=True)},{_guarded_pairs_cte(0.5)},{_EDGES_CTE},{_REACH_CTE}
SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
"""
    o["dedup_clusters_alternating"] = o["dedup_clusters"]
    o["dedup_family_sizes"] = """
WITH fam AS (SELECT md5(text) AS h, cast(count(*) AS bigint) AS sz
             FROM documents WHERE text IS NOT NULL GROUP BY 1)
SELECT sz AS family_size, cast(count(*) AS bigint) AS n_families,
       cast(sz * count(*) AS bigint) AS n_docs,
       cast((sz - 1) * count(*) AS bigint) AS n_excess
FROM fam GROUP BY 1
"""
    # keep-best composes two already-oracled stages (components over the
    # guarded 0.5-jaccard graph + the quality score); qw/qs names avoid
    # the shingle CTE's w/s/c/p
    o["dedup_keep_best"] = f"""
WITH RECURSIVE {_shingles_cte(capped=True)},{_guarded_pairs_cte(0.5)},{_EDGES_CTE},{_REACH_CTE},
cl AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
qw AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
qn AS (SELECT doc_id, len(words) AS nw, len(list_distinct(words)) AS nd,
              len(list_distinct(list_intersect(words, {_stoplist_sql('en')}))) AS sh
       FROM qw),
qs AS (SELECT doc_id,
              round(0.4*(sh/nw) + 0.3*(nd/nw) + 0.3*least(nw/100.0, 1.0), 6)
                AS quality
       FROM qn),
j AS (SELECT cl.doc_id AS doc_id, cluster_id, quality,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY quality DESC NULLS LAST,
                                         cl.doc_id ASC) AS rn
      FROM cl LEFT JOIN qs ON cl.doc_id = qs.doc_id)
SELECT doc_id, cluster_id, quality, rn = 1 AS keep FROM j
"""
    # passage grouping key: the oracle groups by the passage STRING, the
    # Spark side by its xxhash64 — identical counts barring a 64-bit
    # collision; DuckDB list slices are 1-based inclusive and clamp at
    # the end, matching F.slice's remainder window
    o["dedup_passages"] = _passage_oracle(k=8, stride=8)
    o["dedup_passages_strided"] = _passage_oracle(k=8, stride=4)
    # banded SRP-LSH recalls every pair at cosine >= 0.45 on this data
    # (collision prob ≈ 0.9997 at the threshold, ->1 above; a miss would
    # fail this exact-pair-set gate)
    o["dedup_embedding_srp"] = _COSINE_PAIRS_ORACLE
    o["dedup_containment"] = f"""
WITH {_shingles_cte(capped=True)},
sized AS (SELECT doc_a, doc_b, common, ca.n_sh AS na, cb.n_sh AS nb
          FROM p JOIN c ca ON p.doc_a = ca.doc_id
                 JOIN c cb ON p.doc_b = cb.doc_id)
SELECT doc_inner, doc_outer, containment FROM (
  SELECT doc_a AS doc_inner, doc_b AS doc_outer,
         round(common / na, 6) AS containment FROM sized
  UNION ALL
  SELECT doc_b, doc_a, round(common / nb, 6) FROM sized
) WHERE containment >= 0.8
"""
    # same windows/canonical-copy rule; the grouping hash differs (md5 vs
    # xxhash64) which is immaterial — it only keys the df aggregate, and
    # both are collision-free at test scale
    o["dedup_passage_scrub"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE text IS NOT NULL),
n AS (SELECT doc_id, w, cast(ceil(len(w) / 8.0) AS int) AS np FROM d),
p AS (SELECT doc_id, i AS pos, array_to_string(w[i*8+1:i*8+8], ' ') AS passage,
             doc_id * 1048576 + i AS ck
      FROM n, unnest(generate_series(0, np - 1)) AS t(i)),
h AS (SELECT md5(passage) AS ph, count(*) AS cnt, min(ck) AS mn
      FROM p GROUP BY 1),
j AS (SELECT p.*, h.cnt, h.mn FROM p JOIN h ON md5(p.passage) = h.ph),
k AS (SELECT doc_id,
             sum(CASE WHEN cnt = 1 OR ck = mn THEN 1 ELSE 0 END) AS n_kept,
             sum(CASE WHEN cnt > 1 AND ck <> mn THEN 1 ELSE 0 END) AS n_removed,
             coalesce(string_agg(CASE WHEN cnt = 1 OR ck = mn THEN passage END,
                                 ' ' ORDER BY pos), '') AS clean
      FROM j GROUP BY doc_id)
SELECT doc_id, cast(n_kept AS bigint) AS n_kept,
       cast(n_removed AS bigint) AS n_removed,
       cast(strlen(clean) AS int) AS clean_len, md5(clean) AS clean_digest
FROM k
"""
    # exact cross cosine pair set — the oracle IS full recall, so a
    # banding/prefilter miss on the Spark side fails the gate
    o["dedup_decontaminate_emb"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  greatest(sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[])),
                           1e-300) AS nrm
           FROM embeddings)
SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM e a, e b
WHERE a.vec_id >= 50 AND b.vec_id < 50
  AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
"""
    o["dedup_split_leakage"] = f"""
WITH {_shingles_cte(capped=True)},{_guarded_pairs_cte(0.5)},
sp AS (SELECT doc_id,
              CASE WHEN slot < 800 THEN 'train'
                   WHEN slot < 900 THEN 'val' ELSE 'test' END AS split
       FROM (SELECT doc_id,
                    (doc_id * 2654435761) % 4294967296 % 1000 AS slot
             FROM documents)),
j AS (SELECT least(a.split, b.split) AS split_a,
             greatest(a.split, b.split) AS split_b
      FROM pairs p JOIN sp a ON p.doc_a = a.doc_id
      JOIN sp b ON p.doc_b = b.doc_id)
SELECT split_a, split_b, cast(count(*) AS bigint) AS n_pairs,
       split_a <> split_b AS is_leak
FROM j GROUP BY 1, 2
"""
    o["dedup_shingle_profile"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(words) >= 3
        THEN list_transform(generate_series(1, cast(len(words)-2 AS bigint)),
                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        ELSE [array_to_string(words, ' ')] END)) AS sh FROM w),
lim AS (SELECT greatest(10,
               cast(ceil(0.005 * (SELECT count(*) FROM documents)) AS bigint))
               AS df_limit),
dfc AS (SELECT sh, cast(count(*) AS bigint) AS df FROM s GROUP BY sh),
pro AS (SELECT sum(df)::BIGINT AS n_instances,
               cast(count(*) AS bigint) AS n_distinct,
               sum(CASE WHEN df > (SELECT df_limit FROM lim)
                   THEN 1 ELSE 0 END)::BIGINT AS n_stop,
               sum(CASE WHEN df > (SELECT df_limit FROM lim)
                   THEN df END) AS stop_inst,
               max(df)::BIGINT AS max_df,
               quantile_cont(df, 0.99) AS p99
        FROM dfc)
SELECT (SELECT cast(count(*) AS bigint) FROM documents) AS n_docs,
       n_instances, n_distinct, (SELECT df_limit FROM lim) AS df_limit,
       n_stop,
       round(coalesce(stop_inst, 0) / n_instances::DOUBLE, 6)
         AS stop_instance_share,
       max_df, round(p99, 6) AS p99_df
FROM pro
"""
    o["dedup_prefix_hash"] = """
WITH p AS (SELECT doc_id,
                  md5(array_to_string(list_slice(
                      string_split(lower(text), ' '), 1, 8), ' ')) AS prefix_hash
           FROM documents)
SELECT prefix_hash, count(*) AS n_docs,
       min(doc_id) AS keep_doc_id, max(doc_id) AS max_doc_id
FROM p GROUP BY prefix_hash HAVING count(*) > 1 ORDER BY prefix_hash
"""
