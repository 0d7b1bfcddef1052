"""Mergeable sketches: HLL union across sources, quantile-sketch rank
bounds — the 100 TB property keys (verdict r5 next-round #6).

Mergeability is what makes a sketch a distributed-systems primitive: a
100 TB scan computes per-partition sketches map-side, merges them in one
tiny reduce, and a LAKE of per-source/per-day sketches rolls up without
touching raw data again. These keys verify the property itself against
exact twins:

- q_hll_union: union of per-source DataSketches HLL sketches vs the
  exact distinct count of the union (relative-error bound), alongside
  the single-pass global sketch under the same bound. (Exact estimate
  equality between the two does NOT hold in general: a union of
  small coupon-mode sketches can stay exact while the single-pass
  sketch has promoted to dense HLL mode — measured here at 500
  digests/lgK=12 — so the contract is the error bound, not estimate
  identity.)
- q_quantile_sketch: approx_percentile's rank guarantee (|rank/n - q| <=
  1/accuracy) measured against the actual rank of the returned value,
  alongside the exact interpolated percentile.

The sketch estimates themselves can't be replayed by DuckDB, so the
oracle pins the EXACT columns (hash-checked) plus the bound-holds flags
as literals — if Spark's sketch ever exceeds its error bound, the flag
flips and the hash match breaks. This is the q_sketch_error pattern with
the bound as the contract instead of the raw estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

HLL_LGK = 12  # DataSketches lgConfigK: 4096 registers, ~1.6% rel. error
PCT_ACCURACY = 100  # approx_percentile accuracy: rank error <= n/100


@query(
    "q_hll_union",
    oracle="""
    SELECT COUNT(DISTINCT source) AS n_sources,
           COUNT(DISTINCT md5(text)) AS exact_union,
           1 AS est_within_5pct,
           1 AS single_pass_within_5pct
    FROM documents
    """,
)
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL union across sources: per-source DataSketches HLL sketches of
    the content digest, merged with hll_union_agg, vs the exact distinct
    digest count of the whole corpus. Emits the exact count (hash-checked)
    plus two property flags: the MERGED estimate lands within 5% of exact
    (generous vs the ~1.6% expected at lgK=12), and the single-pass
    global sketch does too — i.e. merging per-source sketches is as good
    as sketching the union, which is precisely why a per-source/per-day
    sketch lake can replace global distinct scans. (The two estimates are
    not bit-identical in general: small coupon-mode sketches union
    exactly while the single-pass sketch may already be dense HLL.)

    Scale: each sketch is 4 KB regardless of input size; per-source
    sketches aggregate map-side and the union reduces |sources| * 4 KB —
    the exact twin's countDistinct, by contrast, shuffles every distinct
    digest. At 100 TB the sketch path is the only affordable one; this key
    proves swapping it in keeps the promised accuracy."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    per_src = docs.groupBy("source").agg(
        F.hll_sketch_agg("h", F.lit(HLL_LGK)).alias("sk")
    )
    merged = per_src.agg(
        F.count("*").alias("n_sources"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "est_union"
        ),
    )
    exact = docs.agg(
        F.countDistinct("h").alias("exact_union"),
        F.hll_sketch_estimate(F.hll_sketch_agg("h", F.lit(HLL_LGK))).alias(
            "est_global"
        ),
    )
    return merged.crossJoin(exact).select(
        "n_sources",
        "exact_union",
        (
            F.abs(F.col("est_union") - F.col("exact_union")) * 20
            <= F.col("exact_union")
        )
        .cast("int")
        .alias("est_within_5pct"),
        (
            F.abs(F.col("est_global") - F.col("exact_union")) * 20
            <= F.col("exact_union")
        )
        .cast("int")
        .alias("single_pass_within_5pct"),
    )


@query(
    "q_quantile_sketch",
    oracle="""
    SELECT 50 AS qpct, quantile_cont(o_totalprice, 0.50) AS exact_value,
           1 AS rank_ok
    FROM orders
    UNION ALL
    SELECT 90, quantile_cont(o_totalprice, 0.90), 1 FROM orders
    UNION ALL
    SELECT 99, quantile_cont(o_totalprice, 0.99), 1 FROM orders
    ORDER BY qpct
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch vs exact at matched rank error: approx_percentile
    (Greenwald-Khanna QuantileSummaries — mergeable, single-pass) at
    accuracy={PCT_ACCURACY} against the exact interpolated percentile,
    per quantile in (p50, p90, p99). Emits the exact value (hash-checked)
    and a flag that the sketch's answer satisfies its rank contract:
    |rank(v)/n - q| <= 1/accuracy (+1 rank rounding slack), measured by
    actually ranking the sketch's returned value against the data.

    Scale: the sketch is one scan + driver-sized merge; the exact
    percentile needs a per-group sort. The rank verification broadcasts
    the 3-row quantile frame against the fact scan — one pass, no
    shuffle of the fact side. The flag (not the estimate) is the oracle
    contract, so the key stays hash-checkable while the estimator remains
    a true sketch."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x")
    )
    qs = [0.5, 0.9, 0.99]
    agg = o.agg(
        F.approx_percentile(
            "x", F.array(*[F.lit(q) for q in qs]), F.lit(PCT_ACCURACY)
        ).alias("av"),
        F.percentile("x", F.array(*[F.lit(q) for q in qs])).alias("ev"),
        F.count("*").alias("n"),
    )
    per_q = agg.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(int(q * 100)) for q in qs]).alias("qpct"),
                F.col("av").alias("approx_value"),
                F.col("ev").alias("exact_value"),
            )
        ).alias("z"),
        "n",
    ).select("z.qpct", "z.approx_value", "z.exact_value", "n")
    ranked = (
        o.crossJoin(F.broadcast(per_q))
        .groupBy("qpct", "approx_value", "exact_value", "n")
        .agg(F.sum(F.when(F.col("x") <= F.col("approx_value"), 1).otherwise(0))
             .alias("rank"))
    )
    rank_ok = (
        F.abs(F.col("rank") * 100 - F.col("qpct") * F.col("n")) * PCT_ACCURACY
        <= 100 * F.col("n") + 100 * PCT_ACCURACY
    )
    return ranked.select(
        "qpct",
        "exact_value",
        rank_ok.cast("int").alias("rank_ok"),
    ).orderBy("qpct")


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters: partition-local mergeable frequency sketch +
# exact candidate recount — the two-pass shape that finds heavy keys at
# 100 TB without a full GROUP BY over an unbounded key universe
# --------------------------------------------------------------------------
MG_K = 64  # counters per partition summary; threshold phi = 1/(MG_K+1)
HH_COLD_MOD = 5003  # cold-key universe (prime, ~5k distinct)

# Deterministic skewed key stream (the synth_urls pattern — the oracle
# replays it): even event_ids collapse onto 3 hot keys (~16.7% of the
# stream each), odd ones spread over ~5k cold keys (~0.01% each) — the
# classic heavy-hitter shape (a few keys above phi, a long tail below).
_HH_ITEM = (
    "CASE WHEN event_id % 2 = 0 THEN 'hot_' || CAST(event_id % 3 AS {s}) "
    "ELSE 'cold_' || CAST(event_id % {m} AS {s}) END"
)


def _mg_partitions(it):
    """Partition-local Misra-Gries: one K-counter summary per partition,
    maintained with the MERGEABLE update (Agarwal et al., 'Mergeable
    Summaries'): per Arrow batch, value_counts() pre-aggregates
    vectorized, the batch summary adds counter-wise, and on overflow
    every counter drops by the (K+1)-th largest value (zeros evicted) —
    so the summary never exceeds K entries and every item with true
    partition count > N_p/(K+1) survives with a positive counter."""
    import heapq
    from collections import Counter

    import pandas as pd

    counters: Counter = Counter()
    for pdf in it:
        batch = pdf["item"].value_counts()
        for item, c in batch.items():
            counters[item] += int(c)
        if len(counters) > MG_K:
            kth = heapq.nlargest(MG_K + 1, counters.values())[-1]
            counters = Counter(
                {w: c - kth for w, c in counters.items() if c > kth}
            )
    if counters:
        yield pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
        )


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH it AS (
        SELECT {_HH_ITEM.format(s="VARCHAR", m=HH_COLD_MOD)} AS item
        FROM events
    ),
    t AS (SELECT COUNT(*) AS n_total FROM it)
    SELECT item, COUNT(*) AS n_events,
           round(100.0 * COUNT(*) / (SELECT n_total FROM t), 4) AS share_pct
    FROM it GROUP BY item
    HAVING COUNT(*) > (SELECT n_total FROM t) / {MG_K + 1}.0
    ORDER BY n_events DESC, item
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a partition-local Misra-Gries sketch + exact
    candidate recount — the frequent-items member of the mergeable-sketch
    family (q_hll_union counts distincts; this finds the keys that
    dominate). Pass 1 (mapInPandas, ZERO shuffle): each partition folds
    its items into a {MG_K}-counter MG summary (vectorized value_counts
    per Arrow batch + the mergeable-summaries combine). Pass 2: the
    union of summary keys — bounded by partitions x {MG_K}, layout-
    dependent but always a SUPERSET of the true heavy hitters — is
    broadcast back for an exact recount, and the final filter keeps keys
    above phi = 1/{MG_K + 1} of the stream. Completeness is a theorem,
    not a hope: a key with global share > phi has share >= its global
    share in at least one partition (a maximum is never below a weighted
    average), and per-partition MG guarantees any key with local count >
    N_p/({MG_K + 1}) survives that partition's summary — so the exact
    recount sees every true heavy hitter and the result is IDENTICAL to
    the oracle's full GROUP BY ... HAVING, independent of partitioning.
    The key stream is synthesized deterministically from event_id (3 hot
    keys carrying half the stream, ~{HH_COLD_MOD} cold keys sharing the
    rest — the oracle replays the synthesis, the synth_urls pattern).

    Scale: the full GROUP BY the oracle runs shuffles the ENTIRE key
    universe (unbounded at 100 TB — billions of URLs/users/n-grams);
    the sketch path shuffles only |partitions| x {MG_K} summary rows
    plus the broadcast-filtered recount of <= that many candidate keys
    — the recount aggregate is partial-aggregable and its map side
    discards every cold key at the scan. State is {MG_K} counters per
    task regardless of data volume; summaries are mergeable, so the
    same code rolls up per-day sketch files without touching raw data.

    Reference scope: extension surface (BASELINE.json north star)."""
    events = load_table(spark, sf_dir, "events")
    items = events.selectExpr(
        _HH_ITEM.format(s="STRING", m=HH_COLD_MOD) + " AS item"
    )
    summaries = items.mapInPandas(
        _mg_partitions, schema="item string, mg_count long"
    )
    candidates = summaries.select("item").distinct()
    totals = items.agg(F.count("*").alias("n_total"))
    return (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_events") > F.col("n_total") / (MG_K + 1))
        .select(
            "item",
            "n_events",
            F.round(
                F.lit(100.0) * F.col("n_events") / F.col("n_total"), 4
            ).alias("share_pct"),
        )
        .orderBy(F.desc("n_events"), "item")
    )
