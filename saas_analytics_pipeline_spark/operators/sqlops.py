"""SQL-surface completions: exact medians + modes, full-frame window value
functions, ordered string aggregation, regexp fan-out, nearest-in-time
as-of joins.

These close the tail of the ANSI/analytic function surface a warehouse
user expects beyond the SURVEY section-2 core (percentiles, ntile,
first/last were partially covered; this module adds the exact-median /
modal-bucket, first_value/last_value/nth_value frame semantics, ordered
string_agg, regexp_extract_all fan-out, and the *nearest* as-of variant —
q_asof_payment is backward-only, matching DuckDB's ASOF JOIN; nearest
needs both directions).

Scale notes (100 TB):
- q_median_mode: exact `percentile` is the audit/oracle twin; at scale the
  same shape runs on mergeable `approx_percentile` (documented swap, same
  as q_percentiles / q_winsorize). The modal bucket is a two-level count
  argmax — both aggregations are map-side combinable.
- q_window_firstlast: one shuffle on user_id; the unbounded frame is fine
  because per-user cardinality is bounded (event streams), never a global
  window.
- q_string_agg: collect_set runs per group with bounded distinct values
  (langs <= 5); at 100 TB an unbounded-cardinality string_agg would be a
  design smell, not an engine problem.
- q_regex_extract_all: scan-local explode; the only shuffle carries the
  (bucket, count) partials.
- q_asof_nearest: sort-based windows within user partitions — the classic
  distributed as-of plan (co-partition by key, per-partition ordered scan),
  no range join and no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table


@query(
    "q_median_mode",
    oracle="""
    WITH hours AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    modal AS (
        SELECT event_type, hr AS mode_hour
        FROM (SELECT event_type, hr,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY cnt DESC, hr ASC) AS rn
              FROM hours)
        WHERE rn = 1
    ),
    med AS (
        SELECT event_type,
               median(value) AS median_value,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    )
    SELECT m.event_type, m.median_value, md.mode_hour, m.n_events
    FROM med m JOIN modal md ON m.event_type = md.event_type
    """,
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of value + modal hour-of-day per event type.

    The mode is an explicit count-argmax with a deterministic tie-break
    (highest count, then smallest hour) rather than the engines' native
    ``mode()`` whose tie behavior differs. Exact ``percentile`` is the
    oracle twin; swap `approx_percentile` at 100 TB (mergeable sketch)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value"),
        F.count("*").alias("n_events"),
    )
    hours = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("hr"))
    modal = (
        hours.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("hr").alias("mode_hour"))
    )
    return med.join(modal, "event_type").select(
        "event_type", "median_value", "mode_hour", "n_events"
    )


@query(
    "q_window_firstlast",
    oracle="""
    SELECT DISTINCT user_id,
        first_value(event_type) OVER w AS first_et,
        nth_value(event_type, 2) OVER w AS second_et,
        last_value(event_type) OVER w AS last_et,
        COUNT(*) OVER w AS n_events
    FROM events
    WHERE user_id % 20 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value(2) / last_value over the full per-user frame
    (subset user_id%20=0 to bound output): the journey's entry, second
    step, and exit event in one windowed pass.

    The frame is explicitly UNBOUNDED..UNBOUNDED — last_value under the
    default frame (..CURRENT ROW) is a classic SQL footgun; this pins the
    intended semantics identically in both engines. One shuffle on
    user_id; per-user frames are bounded so no global window exists."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_et"),
        F.nth_value("event_type", 2).over(w).alias("second_et"),
        F.last("event_type").over(w).alias("last_et"),
        F.count("*").over(w).alias("n_events"),
    ).distinct()


@query(
    "q_string_agg",
    oracle="""
    SELECT source,
           string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs_csv,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation: per-source sorted CSV of
    languages. Spark has no ordered string_agg — the portable form is
    collect_set -> array_sort -> concat_ws, which also makes the result
    deterministic under any partitioning (an unordered string_agg is not).
    Distinct-set cardinality is bounded (|langs|), so the collected set
    cannot blow a group."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs_csv"),
        F.countDistinct("lang").alias("n_langs"),
        F.count("*").alias("n_docs"),
    )


@query(
    "q_regex_extract_all",
    oracle="""
    WITH nums AS (
        SELECT CAST(unnest(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS k
        FROM events
    )
    SELECT (k // 10) * 10 AS bucket,
           COUNT(*) AS n,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM nums GROUP BY 1
    """,
)
def q_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all fan-out: pull every integer out of the
    semi-structured props payload, explode, and histogram by decade.

    Scale: extraction + explode are scan-local (no shuffle until the
    bucket counts); only (bucket, partial-count) aggregates move. This is
    the generic untyped-extraction path when from_json is too strict —
    the typed twin is q_json_extract."""
    ev = load_table(spark, sf_dir, "events")
    nums = ev.select(
        F.explode(F.expr(r"regexp_extract_all(props, '[0-9]+', 0)")).alias("s")
    ).select(F.col("s").cast("long").alias("k"))
    return nums.groupBy(
        (F.floor(F.col("k") / 10) * 10).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "q_asof_nearest",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, ts, event_type,
            last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END
                       IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS back_ms,
            first_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END
                        IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                AS fwd_ms
        FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN back_ms IS NOT NULL
                     AND (fwd_ms IS NULL
                          OR epoch_ms(ts) - back_ms <= fwd_ms - epoch_ms(ts))
                THEN 'back' ELSE 'fwd' END AS direction,
           least(coalesce(epoch_ms(ts) - back_ms, 9223372036854775807),
                 coalesce(fwd_ms - epoch_ms(ts), 9223372036854775807))
               // 1000 AS gap_s
    FROM seq
    WHERE event_type = 'error'
      AND least(coalesce(epoch_ms(ts) - back_ms, 9223372036854775807),
                coalesce(fwd_ms - epoch_ms(ts), 9223372036854775807))
          <= 3600000
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each error event pairs with its closest
    click by the same user within 1h, in EITHER direction (ties prefer the
    earlier/backward click). q_asof_payment covers the standard backward
    as-of (DuckDB ASOF JOIN semantics); nearest-neighbor-in-time is the
    other shape telemetry correlation needs.

    Scale: implemented as two IGNORE NULLS window scans (last click
    before, first click after) inside user_id partitions — the canonical
    distributed as-of plan: co-partition both event kinds by key once,
    one ordered pass, no range join, no per-row Python, and the 1h band
    only filters output (never drives a join blow-up)."""
    ev = load_table(spark, sf_dir, "events")
    click_ms = F.when(
        F.col("event_type") == "click", F.unix_millis("ts")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    big = F.lit(9223372036854775807)
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(click_ms, ignorenulls=True).over(back).alias("back_ms"),
        F.first(click_ms, ignorenulls=True).over(fwd).alias("fwd_ms"),
    )
    back_gap = F.coalesce(F.unix_millis("ts") - F.col("back_ms"), big)
    fwd_gap = F.coalesce(F.col("fwd_ms") - F.unix_millis("ts"), big)
    gap_ms = F.least(back_gap, fwd_gap)
    return (
        seq.where(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("back_ms").isNotNull() & (back_gap <= fwd_gap), "back"
            )
            .otherwise("fwd")
            .alias("direction"),
            F.floor(gap_ms / 1000).cast("long").alias("gap_s"),
            gap_ms.alias("_gap_ms"),
        )
        .where(F.col("_gap_ms") <= 3600000)
        .drop("_gap_ms")
    )
