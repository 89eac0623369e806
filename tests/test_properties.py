"""Property-based tests (hypothesis) — beyond the reference's example-based
suites: the parser never crashes un-typed, and temporal bucketing matches an
independent model for arbitrary data/interval choices."""
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nsdb_spark.sql.errors import SQLParseError, StatementValidationError
from nsdb_spark.sql.parser import parse


# ---------------------------------------------------------------- parser fuzz


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_untyped(s):
    """Arbitrary input either parses or raises SQLParseError — never any
    other exception type (the HTTP 400 mapping depends on this)."""
    try:
        parse(s)
    except SQLParseError:
        pass


@given(
    metric=st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True),
    limit=st.integers(min_value=1, max_value=10**6),
    ts=st.integers(min_value=0, max_value=2**60),
    desc=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_roundtrip_simple_select_shape(metric, limit, ts, desc):
    """Generated valid SELECTs parse into the expected AST fields."""
    order = "desc" if desc else ""
    stmt = parse(
        f"select * from {metric} where timestamp >= {ts} "
        f"order by timestamp {order} limit {limit}"
    )
    assert stmt.metric == metric
    assert stmt.limit.value == limit
    assert stmt.order.descending is desc
    assert stmt.condition.expression.value.value == ts


# ------------------------------------------------------------- bucket model


@pytest.fixture(scope="module")
def bucket_engine_factory(spark):
    import tempfile

    from nsdb_spark.engine import NsdbEngine
    from nsdb_spark.model import Bit

    def make(timestamps, shard_interval):
        eng = NsdbEngine(spark, tempfile.mkdtemp(prefix="wh_prop_"))
        eng.warehouse.init_metric("default", "default", "pm", shard_interval)
        eng.insert_bits(
            "default", "default", "pm",
            [Bit(t, 1, {}, {"k": "a"}) for t in timestamps],
        )
        return eng

    return make


@given(
    data=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=12, unique=True
    ),
    interval_s=st.integers(min_value=1, max_value=400),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_temporal_count_matches_python_model(bucket_engine_factory, data, interval_s):
    """Backward-aligned bucket counts == an independent pure-python model
    (SURVEY.md §4.3 semantics: axis from shard bounds, first bucket
    truncated, empty buckets zero-filled)."""
    shard_interval = 100_000
    interval = interval_s * 1000
    eng = bucket_engine_factory(data, shard_interval)
    out = eng.execute(f"select count(*) from pm group by interval {interval_s}s")
    got = [(r[0], r[1], r[3]) for r in out.collect()]  # (ub, lb, count)

    lower = (min(data) // shard_interval) * shard_interval
    upper = (max(data) // shard_interval) * shard_interval + shard_interval
    n = -((upper - lower) // -interval)
    model = []
    for k in range(n - 1, -1, -1):
        ub = upper - k * interval
        lb = max(upper - (k + 1) * interval, lower)
        cnt = sum(
            1
            for t in data
            if min((upper - t) // interval, n - 1) == k
        )
        model.append((ub, lb, cnt))
    assert got == model
    assert sum(c for _, _, c in got) == len(data)


# --------------------------------------------------------------- cdc tiling


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=200,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_chunks_always_tile_exactly(spark, texts):
    """For ANY printable-ASCII corpus, a document's CDC chunks tile it
    exactly: start at 1, lengths sum to len(text), no gaps/overlaps —
    the invariant downstream shared-chunk joins rely on."""
    from nsdb_spark.operators import dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    by_doc = {}
    for r in dedup.cdc_chunks(docs).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, t in enumerate(texts):
        rows = sorted(by_doc.get(d, []), key=lambda r: r["chunk_idx"])
        if len(t) == 0:
            assert rows == []
            continue
        assert rows[0]["start"] == 1
        pos = 1
        for r in rows:
            assert r["start"] == pos  # contiguous, no gap/overlap
            pos += r["length"]
        assert pos == len(t) + 1


@given(
    corpora=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # source
            st.integers(min_value=1, max_value=12),  # token count
        ),
        min_size=1,
        max_size=30,
    ),
    alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_domain_mixture_invariants(spark, corpora, alpha):
    """For ANY multi-source corpus and temperature: copy indexes are
    dense per doc, rates are uniform within a source, alpha=1 is the
    identity mixture (every rate exactly 1 → exactly one copy of every
    doc), and expected emitted tokens equal the budget."""
    from nsdb_spark.operators import selection

    rows = [
        (i, " ".join(["w"] * n), src) for i, (src, n) in enumerate(corpora)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = selection.domain_mixture(docs, alpha=alpha).collect()
    by_doc, rate_by_source = {}, {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
        rate_by_source.setdefault(r["source"], set()).add(r["rate"])
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
    for rates in rate_by_source.values():
        assert len(rates) == 1
    if alpha == 1.0:
        # tokens^1 weighting reproduces the corpus exactly once
        assert sorted(by_doc) == [r[0] for r in rows]
        assert all(idxs == [1] for idxs in by_doc.values())


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quality_lr_permutation_invariant_and_bounded(spark, texts):
    """The LR score is a bag-of-words mean: permuting a document's
    tokens never changes it, and the logit is always within the weight
    range [-1, 1]."""
    from nsdb_spark.operators import selection

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    shuffled = spark.createDataFrame(
        [(i, " ".join(reversed(t.split(" ")))) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: (r["logit_milli"], r["n_tokens"])
         for r in selection.quality_score_lr(docs).collect()}
    b = {r["doc_id"]: (r["logit_milli"], r["n_tokens"])
         for r in selection.quality_score_lr(shuffled).collect()}
    assert a == b
    for lm, n in a.values():
        assert -1000 * n <= lm <= 1000 * n


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 60)),  # (start, span)
        min_size=0,
        max_size=15,
    ),
    points=st.lists(st.integers(0, 260), min_size=0, max_size=20),
    bucket=st.sampled_from([1, 7, 16, 64]),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_matches_bruteforce_any_bucket(spark, intervals, points, bucket):
    """For ANY interval set, point set, and cell size, the bucketed
    rewrite returns exactly the BETWEEN-join pairs."""
    from nsdb_spark.operators import temporal_join

    iv = spark.createDataFrame(
        [(i, s, s + sp) for i, (s, sp) in enumerate(intervals)] or [(99, 1, 0)],
        "iv_id long, s long, e long",
    )
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)] or [(99, -1)],
        "pt_id long, t long",
    )
    got = {
        (r["pt_id"], r["iv_id"])
        for r in temporal_join.interval_join(pts, iv, "t", "s", "e", bucket).collect()
    }
    expect = {
        (pi, ii)
        for pi, t in ((i, t) for i, t in enumerate(points)) or []
        for ii, (s, sp) in enumerate(intervals)
        if s <= t <= s + sp
    }
    if not points:
        expect = set()
    assert got == expect
