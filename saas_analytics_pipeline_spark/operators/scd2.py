"""SCD2 dimension builds + overlap validation + attribution.

The reference declares SCD2 dims ("SCD2 dims" `/root/reference/README.md:37`;
snapshot config `dbt_project.yml:12,58-60`) and an "SCD2 window overlap
prevention" test (`README.md:58`), plus first/last-touch attribution marts
(`README.md:9,40`). dbt snapshots implement SCD2 by closing the previous
version when a new one arrives; in Spark this is a pure window computation
over the change log: valid_from = change ts, valid_to = lead(ts), is_current
= valid_to IS NULL.

Scale notes: one shuffle on the entity key for the lead/lag window; the
change log is processed per-key in time order. In an incremental production
setting this becomes a MERGE against the open (is_current) slice only —
partition the dim by is_current so the merge touches one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table


def build_scd2(
    changes: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """Generic SCD2 builder from a change log (dbt snapshot semantics).

    Each change row opens a version at its timestamp; the next change for the
    same key closes it. Deterministic ordering via (ts, tiebreak)."""
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn(
            "version_n", F.row_number().over(w)
        )
    )


def scd2_overlaps(scd2: DataFrame, key: str) -> DataFrame:
    """Violation frame: validity windows that intersect a predecessor
    (README.md:58). Empty <=> the dimension is well-formed."""
    w = Window.partitionBy(key).orderBy("valid_from", "version_n")
    return (
        scd2.withColumn("prev_valid_to", F.lag("valid_to").over(w))
        .where(
            F.col("prev_valid_to").isNotNull()
            & (F.col("valid_from") < F.col("prev_valid_to"))
        )
    )


@query(
    "q_scd2_build",
    oracle="""
    SELECT user_id,
           event_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version_n
    FROM events
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build over the events change log: each event versions its user's
    state (ref: README.md:37; dbt_project.yml:58-60). valid_from/valid_to/
    is_current via lead() — the exact dbt snapshot contract."""
    ev = load_table(spark, sf_dir, "events")
    out = build_scd2(ev, "user_id", "ts", "event_id")
    return out.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        "is_current",
        "version_n",
    )


# incremental apply cut: events span 2024-01-01..2024-01-30 (TESTDATA.md);
# mid-month splits the change log into a built dimension + a new batch
SCD2_CUT = "2024-01-16 00:00:00"


@query(
    "q_scd2_incremental",
    oracle="""
    SELECT user_id,
           event_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version_n
    FROM events
    """,
)
def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 apply, certified against the rebuild: the change
    log is split at a mid-range cut; the pre-cut slice is SCD2-built into
    a dimension, the post-cut slice applied as a batch via
    plans/incremental.scd2_apply_increment (close open versions of
    changed keys at their first new ts, append new versions with
    continuing version numbers, pass untouched keys through). The oracle
    is the FULL REBUILD over the whole log — the defining invariant of
    incremental SCD2 (apply == rebuild), so any drift in close
    timestamps, version numbering, or survivor passthrough breaks the
    hash. Promotes the pytest-only incremental path (test_incremental,
    tools/scd2_probe.py: 3.0x over rebuild at 30 versions/key) to a
    driver-verified key.

    Scale: history of unchanged keys never shuffles — the expensive
    slice is (open rows of changed keys) + (the batch), both
    batch-bounded and broadcast; see plans/incremental.py."""
    from saas_analytics_pipeline_spark.plans.incremental import (
        scd2_apply_increment,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    cut = F.lit(SCD2_CUT).cast("timestamp")
    cols = [
        "user_id", "event_id", "event_type",
        "valid_from", "valid_to", "is_current", "version_n",
    ]
    dim0 = build_scd2(
        ev.where(F.col("ts") < cut), "user_id", "ts", "event_id"
    ).select(*cols)
    out = scd2_apply_increment(
        dim0,
        ev.where(F.col("ts") >= cut),
        "user_id",
        "ts",
        attrs=["event_id", "event_type"],
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        "is_current",
        "version_n",
    )


@query(
    "q_scd2_overlap",
    oracle="""
    WITH scd AS (
        SELECT user_id, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events
    ),
    flagged AS (
        SELECT user_id, valid_from, valid_to,
               LAG(valid_to) OVER (PARTITION BY user_id ORDER BY valid_from,
                   valid_to NULLS LAST) AS prev_valid_to
        FROM scd
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE prev_valid_to IS NOT NULL
                            AND valid_from < prev_valid_to) AS n_overlaps
    FROM flagged
    """,
)
def q_scd2_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 overlap-prevention test (ref: README.md:58): count of validity
    windows intersecting their predecessor — 0 for a well-formed build."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd = ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        "valid_from", F.col("valid_to").asc_nulls_last()
    )
    flagged = scd.withColumn("prev_valid_to", F.lag("valid_to").over(w2))
    return flagged.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(
                F.col("prev_valid_to").isNotNull()
                & (F.col("valid_from") < F.col("prev_valid_to")),
                1,
            )
        ).alias("n_overlaps"),
    )


@query(
    "q_attribution",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts, value,
               FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS first_touch
        FROM events
    )
    SELECT first_touch,
           COUNT(*) AS n_purchases,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
    FROM ordered WHERE event_type = 'purchase'
    GROUP BY first_touch
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: purchases credited to the user's first-ever
    event type (ref: attribution/marketing marts README.md:9,40). One window
    shuffle on user_id; purchase value summed per acquiring channel."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        "value",
        F.first("event_type").over(w).alias("first_touch"),
    )
    return (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@query(
    "q_scd2_asof_join",
    oracle="""
    WITH scd AS (
        SELECT user_id, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS signup_gen
        FROM events WHERE event_type = 'signup'
    )
    SELECT s.signup_gen,
           COUNT(*) AS n_purchases,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM events p
    JOIN scd s
      ON p.user_id = s.user_id
     AND p.ts >= s.valid_from
     AND (s.valid_to IS NULL OR p.ts < s.valid_to)
    WHERE p.event_type = 'purchase'
    GROUP BY s.signup_gen ORDER BY s.signup_gen
    """,
)
def q_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 as-of join: purchase events attributed to the signup
    generation (SCD2 version of the user) whose validity window covers the
    purchase timestamp — the query SCD2 exists FOR (ref: snapshots
    dbt_project.yml:58-60, SCD2 dims README.md:37): measure facts against
    the dimension state AT EVENT TIME, not today's.

    Scale: an equi-join on the entity key with the validity range as a
    RESIDUAL predicate — a hash join, NOT a range/nested-loop join: rows
    co-locate by user key and each user's version list is small, so the
    residual scan is bounded. Both branches read ONE events scan
    (filter-pushed on event_type). Validity windows are half-open
    [from, to) per the build contract, so exactly one version matches and
    the join never duplicates facts."""
    ev = load_table(spark, sf_dir, "events")
    scd = build_scd2(
        ev.where(F.col("event_type") == "signup"), "user_id", "ts", "event_id"
    ).select(
        F.col("user_id").alias("s_user"),
        F.col("version_n").alias("signup_gen"),
        "valid_from",
        "valid_to",
    )
    p = ev.where(F.col("event_type") == "purchase")
    cond = (
        (p.user_id == scd.s_user)
        & (p.ts >= scd.valid_from)
        & (scd.valid_to.isNull() | (p.ts < scd.valid_to))
    )
    return (
        p.join(scd, cond)
        .groupBy("signup_gen")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("s_user").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("signup_gen")
    )
