"""Sessionization: 30-minute inactivity-gap sessions over the event stream.

The reference's ops/funnel marts run over the generated event stream
(`/root/reference/README.md:9`; events built at
`/root/reference/data_gen/generate_and_load_script.py:151-169`).
Sessionization is the classic lag-gap-cumsum: flag a new session when the
gap to the previous event exceeds the threshold, then a running sum of flags
numbers the sessions.

Scale notes: exactly one shuffle on user_id; both windows share the same
partitioning/ordering so Spark plans a single Window exchange + sort. The
streaming twin (streaming/jobs.py) uses F.session_window natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

GAP_MINUTES = 30


def sessionize(events: DataFrame, user: str = "user_id", ts: str = "ts") -> DataFrame:
    """Assign session ids: new session when gap > 30 min (deterministic
    tie-break on event_id)."""
    w = Window.partitionBy(user).orderBy(F.col(ts), F.col("event_id"))
    gap_s = F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w))
    is_new = F.when(
        gap_s.isNull() | (gap_s > GAP_MINUTES * 60), 1
    ).otherwise(0)
    return events.withColumn("is_new_session", is_new).withColumn(
        "session_n",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts,
                   event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_n
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_n, COUNT(*) AS n_events,
               date_diff('second', MIN(ts), MAX(ts)) AS duration_s
        FROM numbered GROUP BY user_id, session_n
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events_per_session,
           CAST(SUM(duration_s) AS BIGINT) AS total_duration_s
    FROM sessions
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization summary (ref: ops marts over events,
    README.md:9). lag-gap flag -> running-sum session number -> per-session
    rollup -> global summary."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev)
    per_session = sess.groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
    )
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("n_events").alias("n_events"),
        (F.sum("n_events").cast("double") / F.count("*")).alias(
            "avg_events_per_session"
        ),
        F.sum("duration_s").alias("total_duration_s"),
    )


@query(
    "q_bounce_rate",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, sn, COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sn
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounces,
           round(CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM sessions
    """,
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate: share of single-event sessions — the canonical session
    quality metric, derived from the same lag-gap sessionizer."""
    ev = load_table(spark, sf_dir, "events")
    per_session = sessionize(ev).groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events")
    )
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_bounces"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("bounce_rate"),
    )
