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


@query(
    "q_percentile_disc",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN value END) AS p50_disc,
           MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                    THEN value END) AS p95_disc,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN value END) AS p99_disc
    FROM ranked GROUP BY event_type
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc semantics: the smallest
    ACTUAL value with cumulative share >= p — row ceil(p*n) of the sorted
    group) per event type, completing the quantile family next to the
    interpolated q_percentiles and the sketched q_approx_percentiles.
    Discrete quantiles are what SLA/limit policies want: a value that
    really occurred, not an interpolation between two.

    Implemented via explicit rank selection (identical semantics in both
    engines — native percentile_disc null/tie handling differs) with an
    event_id tie-break so equal values rank deterministically.

    Scale: one shuffle on event_type; at 100 TB swap approx_percentile
    (mergeable sketch) exactly as q_percentiles documents — the exact
    rank-selection form stays as the audit twin."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    n = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            n.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    def pick(p: float, alias: str):
        at = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == at, F.col("value"))).alias(alias)
    return ranked.groupBy("event_type").agg(
        pick(0.50, "p50_disc"), pick(0.95, "p95_disc"), pick(0.99, "p99_disc")
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH seg AS (
        SELECT user_id, value,
               epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                   - epoch_ms(ts) AS dur_ms
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(ROUND(value * dur_ms, 3) AS DECIMAL(28,3)))
                AS DOUBLE)
               / CAST(SUM(dur_ms) AS DOUBLE) AS twa_value,
           CAST(SUM(dur_ms) AS BIGINT) AS observed_ms,
           COUNT(*) AS n_segments
    FROM seg
    WHERE dur_ms IS NOT NULL AND dur_ms > 0
    GROUP BY user_id
    HAVING user_id % 25 = 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user (subset user_id%25=0):
    each reading holds until the next one, so it weighs by its holding
    duration — the correct mean for irregularly-sampled telemetry
    (a plain AVG over-counts burst periods). The last reading of each
    user has no successor and drops out (no duration).

    Determinism: value*duration products are rounded to 3 dp and summed
    as DECIMAL(28,3) — exact cross-row accumulation, no float-order
    dependence; both divisions are single double ops on exact operands.

    Scale: one shuffle on user_id for the lead() window (bounded per-user
    frames), then a map-side-combinable per-user aggregate. This is the
    hypertable time_weight() shape re-expressed as lead + weighted sums."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias(
            "dur_ms"
        ),
    ).where(F.col("dur_ms").isNotNull() & (F.col("dur_ms") > 0))
    return (
        seg.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.round(F.col("value") * F.col("dur_ms"), 3).cast(
                        "decimal(28,3)"
                    )
                ).cast("double")
                / F.sum("dur_ms").cast("double")
            ).alias("twa_value"),
            F.sum("dur_ms").cast("long").alias("observed_ms"),
            F.count("*").alias("n_segments"),
        )
        .where(F.col("user_id") % 25 == 0)
    )


@query(
    "q_rank_dense",
    oracle="""
    WITH banded AS (
        SELECT c_mktsegment,
               c_custkey,
               CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band
        FROM customer WHERE c_custkey % 50 = 0
    )
    SELECT c_mktsegment, c_custkey, bal_band,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY bal_band DESC, c_custkey) AS rn
    FROM banded
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_band DESC)
    """,
)
def q_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank vs row_number on a deliberately tied ordering
    (account balances banded to 1000s; subset c_custkey%50=0): rank leaves
    gaps after ties, dense_rank does not, row_number breaks ties by the
    explicit c_custkey tie-break — the three ranking semantics side by
    side, pinned against the oracle. row_number over a tied ORDER BY
    without a tie-break would be partition-order-dependent; the explicit
    key makes all three deterministic.

    Scale: one shuffle on c_mktsegment; at 100 TB a global rank would
    instead go through the range-partitioned sort (q_gini contract) —
    here the partitions are the segment enum."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    banded = c.select(
        "c_mktsegment",
        "c_custkey",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias(
            "bal_band"
        ),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("bal_band"))
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("bal_band"), F.asc("c_custkey")
    )
    return banded.select(
        "c_mktsegment",
        "c_custkey",
        "bal_band",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(wt).alias("rn"),
    )




CHAIN_GAP_DAYS = 30  # reorder-chain linkage window


def _chain_sql(edges_src: str) -> str:
    """The shared recursive-CTE text: Spark and DuckDB run the SAME
    recursion (UNION ALL — Spark 4 recursive CTEs do not support UNION
    dedup) over the next-order edge DAG. Time-monotone edges make it
    acyclic, so UNION ALL terminates with depth = longest chain."""
    return f"""
    WITH RECURSIVE edges AS ({edges_src}),
    starts AS (
        SELECT DISTINCT prev_key AS start_key FROM edges
        WHERE prev_key NOT IN (SELECT next_key FROM edges)
    ),
    chain(start_key, cur_key, len) AS (
        SELECT start_key, start_key, 1 FROM starts
        UNION ALL
        SELECT c.start_key, e.next_key, c.len + 1
        FROM chain c JOIN edges e ON e.prev_key = c.cur_key
    ),
    lengths AS (
        SELECT start_key, MAX(len) AS chain_len FROM chain GROUP BY start_key
    )
    SELECT CAST(chain_len AS INT) AS chain_len,
           COUNT(*) AS n_chains
    FROM lengths GROUP BY chain_len
    """


_EDGES_SQL = f"""
        SELECT prev_key, next_key FROM (
            SELECT o_orderkey AS prev_key,
                   LEAD(o_orderkey) OVER w AS next_key,
                   LEAD(o_orderdate) OVER w AS next_date,
                   o_orderdate
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ) WHERE next_key IS NOT NULL
          AND next_date <= o_orderdate + INTERVAL {CHAIN_GAP_DAYS} DAY
"""


@query("q_recursive_chains", oracle=_chain_sql(_EDGES_SQL))
def q_recursive_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-chain lengths via WITH RECURSIVE (Spark 4 recursive CTE):
    consecutive same-customer orders linked when the next arrives within
    {CHAIN_GAP_DAYS} days; chains are walked recursively from their
    starts and reported as a length histogram. IDENTICAL recursive SQL
    runs on both engines — the declarative twin of the gaps-and-islands
    window approach (q_streaks), and the engine feature that replaces
    driver-side iteration loops for hierarchical/chain traversals.

    Scale: the edge list derives from one per-customer window (orders
    shuffle once on custkey); each recursion level is one distributed
    equi-join on the DAG, and the level count is the longest chain, not
    the table size. Edges are time-monotone, so UNION ALL recursion is
    acyclic and row growth is sum-of-chain-lengths (linear in |orders|
    for bounded chains). Cyclic closures (near-dup components) stay on
    the label-propagation operator instead — UNION-dedup recursion is
    not available to bound walks there."""
    o = load_table(spark, sf_dir, "orders")
    o.select("o_orderkey", "o_custkey", "o_orderdate").createOrReplaceTempView(
        "rc_orders"
    )
    return spark.sql(_chain_sql(_EDGES_SQL.replace("FROM orders", "FROM rc_orders")))
