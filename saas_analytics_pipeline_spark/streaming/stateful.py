"""Custom stateful streaming operator: sessionization with explicit state.

``F.session_window`` (streaming/jobs.py) covers plain gap-sessions; this
module is the **custom stateful operator** path for semantics the built-in
can't express (per-session derived metrics, emit-on-close records, state
you want to inspect). It uses ``applyInPandasWithState`` — Arrow-batched
per-key state, the Spark-4 public API for hand-rolled streaming state
(reference has no streaming engine at all; event-time columns generated at
/root/reference/data_gen/generate_and_load_script.py:155,162 are what make
this surface meaningful).

Design for scale:
- state is one tiny tuple per user (open-session start/last/count as epoch
  micros) — state-store size is O(active users), not O(events);
- each micro-batch is vectorized pandas (sort + diff + cumsum), no per-row
  Python loop;
- closed sessions emit immediately (append mode); the trailing open session
  stays in state and closes via event-time timeout when the watermark
  passes ``last + gap`` — identical late-data policy to the watermarked
  window aggs.

The same vectorized core powers a batch ``applyInPandas`` twin
(q_sessionize_pandas) so the exact session semantics are oracle-checked in
batch and reused by the streaming path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

if TYPE_CHECKING:  # pragma: no cover
    pass

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
# open-session state per user: (start_us, last_us, n_events) as epoch micros
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def _sessions_from_sorted_ts(ts_us: "pd.Series") -> pd.DataFrame:
    """Vectorized gap-sessionizer over an ascending epoch-micros series.
    Returns one row per session: start_us, last_us, n."""
    new_flag = ts_us.diff().isna() | (ts_us.diff() > _GAP_US)
    sess_id = new_flag.cumsum()
    agg = ts_us.groupby(sess_id).agg(["min", "max", "count"])
    return agg.rename(columns={"min": "start_us", "max": "last_us", "count": "n"})


def _sessionize_user(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function: one user's new events per batch."""
    user_id = key[0]

    def emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(r[0] * 1000) for r in rows],
                "session_end": [pd.Timestamp(r[1] * 1000) for r in rows],
                "n_events": [r[2] for r in rows],
            }
        )

    if state.hasTimedOut:
        # watermark passed last+gap with no new events: close the session
        start_us, last_us, n = state.get
        state.remove()
        yield emit([(start_us, last_us, n)])
        return

    parts = [pdf for pdf in pdf_iter if len(pdf)]
    if not parts:
        return
    ts_us = (
        pd.concat(parts)["ts"].astype("int64").floordiv(1000).sort_values()
    )  # pandas datetime64[ns] -> epoch micros, ascending
    sessions = _sessions_from_sorted_ts(ts_us).values.tolist()

    if state.exists:
        start_us, last_us, n = state.get
        first = sessions[0]
        if first[0] - last_us <= _GAP_US:  # first new session continues state
            sessions[0] = [start_us, first[1], n + first[2]]
        else:
            sessions.insert(0, [start_us, last_us, n])

    *closed, open_sess = sessions
    state.update(tuple(int(x) for x in open_sess))
    # timeout must stay ahead of the current watermark (Spark rejects
    # timestamps at/behind it — possible for a long-idle user)
    wm_ms = state.getCurrentWatermarkMs()
    timeout_ms = max(int(open_sess[1]) // 1000 + GAP_MINUTES * 60_000, wm_ms + 1)
    state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield emit([tuple(int(x) for x in r) for r in closed])


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionizer: emits one row per CLOSED session (append
    mode); open sessions close via event-time timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _sessionize_batch_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch grouped-map twin: all of one user's events at once."""
    user_id = pdf["user_id"].iloc[0]
    ts_us = pdf["ts"].astype("int64").floordiv(1000).sort_values()
    out = _sessions_from_sorted_ts(ts_us)
    return pd.DataFrame(
        {
            "user_id": user_id,
            "session_start": pd.to_datetime(out["start_us"] * 1000),
            "session_end": pd.to_datetime(out["last_us"] * 1000),
            "n_events": out["n"].astype("int64"),
        }
    )


@query(
    "q_sessionize_pandas",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sn
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           MIN(session_start) AS first_start,
           MAX(session_end) AS last_end
    FROM sessions
    """,
)
def q_sessionize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas) sessionizer — the custom-operator escape
    hatch, oracle-checked against window-function semantics. Shares its
    vectorized core with the stateful streaming op (sessionize_stream), so
    the streaming path's session math is what this oracle certifies.

    Scale: one shuffle on user_id; per-group work is vectorized Arrow
    batches. Gap ties (diff == gap) stay in-session here, in the oracle,
    AND in F.session_window (which merges a window starting exactly at the
    open window's end) — all families use effectively strict >; the tie
    case is pinned by tests/test_operators.py."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.select("user_id", "ts").groupBy("user_id").applyInPandas(
        _sessionize_batch_pdf, schema=SESSION_SCHEMA
    )
    return sessions.agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.min("session_start").alias("first_start"),
        F.max("session_end").alias("last_end"),
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas: the Spark-4 arbitrary-state processor API
# --------------------------------------------------------------------------
class RunningTotalsProcessor:
    """Per-user running event count + value total with explicit ValueState
    (the transformWithState successor to applyInPandasWithState: typed
    state handles, timers, TTL). Emits one updated row per key per batch —
    the change-data stream a serving layer consumes.

    State is one (n, total) pair per user: O(active users), same bound as
    the sessionizer above."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n long, total double")

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming running totals per user via transformWithStateInPandas.

    Requires the python protobuf runtime (the state-server protocol);
    raises ImportError where it is absent — callers fall back to
    applyInPandasWithState (sessionize_stream above) on such clusters."""
    from google.protobuf import descriptor  # noqa: F401  (availability gate)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so import of this module never hard-depends on
    # the processor ABC location
    proc = type(
        "RunningTotals", (StatefulProcessor,), dict(RunningTotalsProcessor.__dict__)
    )()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


# --------------------------------------------------------------------------
# streaming near-dup dedup: keyed state per MinHash band bucket
# --------------------------------------------------------------------------
LSH_HIT_SCHEMA = "doc_id bigint, band int, hit int"
LSH_STATE_SCHEMA = "last_us bigint"  # last sighting per (band, bucket)


def _lsh_bucket_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function for ONE (band, bucket) key: emit a
    hit for every arrival whose previous same-bucket sighting (in-batch or
    in-state) is within the TTL; refresh the state to the newest sighting;
    evict via event-time timeout when the watermark passes last + TTL."""
    from saas_analytics_pipeline_spark.streaming.jobs import LSH_TTL_MIN

    ttl_us = LSH_TTL_MIN * 60 * 1_000_000
    if state.hasTimedOut:
        state.remove()  # eviction only — hits were emitted on arrival
        return

    parts = [pdf for pdf in pdf_iter if len(pdf)]
    if not parts:
        return
    pdf = pd.concat(parts).sort_values(["ts", "doc_id"])
    ts_us = pdf["ts"].astype("int64").floordiv(1000)
    prev_us = ts_us.shift(1)
    last_us = 0
    if state.exists:
        (last_us,) = state.get
        # The state holds only the NEWEST sighting, so a row older than it
        # (out-of-order across micro-batches) has an unknowable event-time
        # predecessor — skip the state comparison for it rather than let a
        # negative delta satisfy <= ttl. Exact equivalence with the batch
        # twin's event-time lag rule therefore requires event-time-ordered
        # ingest across micro-batches (see lsh_dedup_stream's docstring);
        # in-batch disorder is handled by the sort above.
        if int(ts_us.iloc[0]) >= last_us:
            prev_us.iloc[0] = float(last_us)
    hit = ((ts_us - prev_us) <= ttl_us).astype("int32")  # NaN compares False

    last = max(int(ts_us.iloc[-1]), last_us)  # monotone: state is a max
    state.update((last,))
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last // 1000 + LSH_TTL_MIN * 60_000, wm_ms + 1))
    yield pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64").values,
            "band": int(key[0]),
            "hit": hit.values,
        }
    )


def lsh_dedup_stream(docs: DataFrame, watermark: str = "12 hours") -> DataFrame:
    """Streaming NEAR-dup dedup: per-row scan-local MinHash banding
    (dedup.row_band_buckets — bit-identical to the batch banding), then a
    keyed state store per (band, bucket) holding the last sighting, with
    event-time TTL eviction. Emits (doc_id, band, hit) rows; a doc is a
    near-dup candidate when any band hits (max over bands, aggregated by
    the consumer — tests/test_streaming.py proves per-doc equivalence with
    the batch twin q_stream_lsh_dedup/lsh_arrival_flags).

    Ordering contract: the state stores only the newest sighting per
    bucket, so per-doc equivalence with the batch twin's event-time lag
    rule holds for event-time-ordered ingest ACROSS micro-batches (the
    normal log-replay shape); within a micro-batch arrival order is
    irrelevant (rows sort by event time first). A row older than the
    stored sighting compares only against its in-batch predecessor — its
    true event-time predecessor is unknowable from a last-sighting state.

    Scale: state = one 8-byte timestamp per bucket sighted within the TTL
    (bounded by arrival rate x TTL, not corpus size); banding never
    shuffles — only (band, bucket, doc_id, ts) rows reach the state
    exchange. Input must carry (doc_id, ts, text)."""
    from saas_analytics_pipeline_spark.operators.dedup import row_band_buckets

    bands = row_band_buckets(docs, "ts")
    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _lsh_bucket_fn,
            outputStructType=LSH_HIT_SCHEMA,
            stateStructType=LSH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
