"""Statistical monitoring operators: distribution drift (PSI), A/B test
significance, exact metric correlation, and CDC-style snapshot diffing.

These extend the reference's data-quality surface (schema drift
generate_and_load_script.py:157, anomaly sprints README.md:34-41) with the
standing statistical checks a production warehouse runs on every load:

- **population-stability index** (q_psi_drift): the classic score for "has
  this feature's distribution moved since the baseline period" — per-bin
  share shift summed as (cur-base)*ln(cur/base) over pinned bins.
- **two-proportion z-test** (q_ab_test): deterministic hash-bucket
  assignment (same family as q_stratified_split) and the pooled z-score
  for conversion-rate lift — the readout of an experimentation pipeline.
- **exact Pearson correlation** (q_corr_metrics): daily metric pairs
  correlated from BIGINT power sums (n, Σx, Σy, Σxy, Σx², Σy²), so the
  result is bit-deterministic under any partitioning — a float corr()
  over shuffled doubles is not.
- **snapshot diff** (q_snapshot_diff): CDC between two as-of states of a
  per-user accumulator (added/changed/unchanged), the full-outer-join
  pattern used to emit change feeds from snapshot pairs.

Scale notes (100 TB):
- PSI bins and period flags are scan-local; the aggregate is |bins| rows
  and the window runs over that driver-sized frame.
- A/B assignment is a scan-local hash; the only shuffle is the per-user
  conversion rollup (map-side combinable), then a single-row reduce.
- Correlation power sums are partial-aggregable BIGINTs — one shuffle to
  |days| rows, one reduce to a single row; no window over raw facts.
- Snapshot diff shuffles each side once on the key; with both state
  tables bucketed on user_id the full-outer join is co-located. An
  append-only event source means 'removed' cannot occur (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.functions import hash60, hash60_sql
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

# --------------------------------------------------------------------------
# q_psi_drift — population stability index over pinned bins
# --------------------------------------------------------------------------
PSI_EDGES = [50_000, 100_000, 150_000, 200_000, 250_000, 300_000, 400_000]
PSI_SPLIT_DATE = "1998-01-01"  # orders before -> baseline, after -> current


def _psi_bin_spark() -> F.Column:
    b = F.lit(0)
    for e in PSI_EDGES:
        b = b + F.when(F.col("o_totalprice") >= e, 1).otherwise(0)
    return b


def _psi_bin_sql() -> str:
    return " + ".join(
        f"(CASE WHEN o_totalprice >= {e} THEN 1 ELSE 0 END)" for e in PSI_EDGES
    )


@query(
    "q_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT {_psi_bin_sql()} AS bin,
               CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT_DATE}'
                    THEN 1 ELSE 0 END AS is_base
        FROM orders
    ),
    agg AS (
        SELECT bin,
               CAST(SUM(is_base) AS BIGINT) AS n_base,
               CAST(SUM(1 - is_base) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin
    ),
    shares AS (
        SELECT bin, n_base, n_cur,
               CAST(n_base + 1 AS DOUBLE)
                   / (SUM(n_base) OVER () + {len(PSI_EDGES) + 1}) AS base_share,
               CAST(n_cur + 1 AS DOUBLE)
                   / (SUM(n_cur) OVER () + {len(PSI_EDGES) + 1}) AS cur_share
        FROM agg
    )
    SELECT bin, n_base, n_cur,
           round(base_share, 6) AS base_share,
           round(cur_share, 6) AS cur_share,
           round((cur_share - base_share) * ln(cur_share / base_share), 6)
               AS psi_part,
           round(SUM((cur_share - base_share) * ln(cur_share / base_share))
                 OVER (), 6) AS psi_total
    FROM shares
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-total distribution, current
    period vs baseline (split at {PSI_SPLIT_DATE}): per pinned price bin,
    the share shift contribution (cur-base)*ln(cur/base), Laplace-smoothed
    (+1 per bin) so empty bins stay finite. PSI > 0.25 is the standard
    "distribution moved, retrain/investigate" alarm.

    Bin edges are pinned module literals shared with the oracle — both
    engines compute ln() on identical integer-ratio doubles, so results
    are bit-identical before the 6-decimal rounding.

    Scale: bin + period flag are scan-local codegen; one map-side
    combinable count-agg to |bins| rows; both share windows run over that
    <=8-row frame. The raw fact table is scanned exactly once."""
    o = load_table(spark, sf_dir, "orders")
    n_bins = len(PSI_EDGES) + 1
    agg = (
        o.select(
            _psi_bin_spark().alias("bin"),
            F.when(
                F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("is_base"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_base").cast("long").alias("n_base"),
            F.sum(1 - F.col("is_base")).cast("long").alias("n_cur"),
        )
    )
    w = Window.partitionBy()
    base_share = (F.col("n_base") + 1).cast("double") / (
        F.sum("n_base").over(w) + n_bins
    )
    cur_share = (F.col("n_cur") + 1).cast("double") / (
        F.sum("n_cur").over(w) + n_bins
    )
    shares = agg.select(
        "bin",
        "n_base",
        "n_cur",
        base_share.alias("b_sh"),
        cur_share.alias("c_sh"),
    )
    psi_part = (F.col("c_sh") - F.col("b_sh")) * F.log(
        F.col("c_sh") / F.col("b_sh")
    )
    return shares.select(
        "bin",
        "n_base",
        "n_cur",
        F.round("b_sh", 6).alias("base_share"),
        F.round("c_sh", 6).alias("cur_share"),
        F.round(psi_part, 6).alias("psi_part"),
        F.round(F.sum(psi_part).over(w), 6).alias("psi_total"),
    )


# --------------------------------------------------------------------------
# q_ab_test — deterministic assignment + two-proportion z-test
# --------------------------------------------------------------------------
AB_SPLIT_PCT = 50  # hash bucket < 50 -> control, else treatment
AB_Z_CRIT = 1.96  # two-sided 95%
AB_CONV_MIN = 14  # converted = "power buyer": >= this many purchase events


@query(
    "q_ab_test",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN {hash60_sql("'ab:' || CAST(user_id AS VARCHAR)")}
                         % 100 < {AB_SPLIT_PCT}
                    THEN 0 ELSE 1 END AS grp,
               CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                         >= {AB_CONV_MIN} THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT
            CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
            CAST(SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT)
                AS conv_control,
            CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
            CAST(SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT)
                AS conv_treatment
        FROM u
    ),
    r AS (
        SELECT *,
               CAST(conv_control AS DOUBLE) / n_control AS rate_c,
               CAST(conv_treatment AS DOUBLE) / n_treatment AS rate_t,
               CAST(conv_control + conv_treatment AS DOUBLE)
                   / (n_control + n_treatment) AS pooled
        FROM c
    ),
    z AS (
        SELECT *,
               CASE WHEN pooled * (1 - pooled) = 0 THEN NULL
                    ELSE (rate_t - rate_c)
                         / sqrt(pooled * (1 - pooled)
                                * (1.0 / n_control + 1.0 / n_treatment))
               END AS zval
        FROM r
    )
    SELECT n_control, conv_control, round(rate_c, 6) AS rate_control,
           n_treatment, conv_treatment, round(rate_t, 6) AS rate_treatment,
           round(rate_t - rate_c, 6) AS lift,
           round(zval, 4) AS z_score,
           abs(zval) > {AB_Z_CRIT} AS significant
    FROM z
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are deterministically assigned to
    control/treatment by content-independent hash bucket (reproducible
    across runs and partitionings — rand() is neither), conversion is
    "user ever purchased", and the lift is scored with the pooled
    two-proportion z-test at the 95% two-sided level.

    All inputs to the z formula are BIGINT counts, so both engines derive
    bit-identical doubles; sqrt/division happen once, in the final
    single-row projection.

    Scale: assignment is scan-local; the per-user conversion rollup is one
    map-side-combinable shuffle on user_id; everything after is a
    single-row reduce. No raw-event window, no second scan."""
    ev = load_table(spark, sf_dir, "events")
    grp = F.when(
        hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 100
        < AB_SPLIT_PCT,
        0,
    ).otherwise(1)
    u = (
        ev.select("user_id", grp.alias("grp"), "event_type")
        .groupBy("user_id", "grp")
        .agg(
            F.when(
                F.count(F.when(F.col("event_type") == "purchase", 1))
                >= AB_CONV_MIN,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
    )
    c = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_control"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treatment"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_treatment"),
    )
    rate_c = F.col("conv_control").cast("double") / F.col("n_control")
    rate_t = F.col("conv_treatment").cast("double") / F.col("n_treatment")
    pooled = (F.col("conv_control") + F.col("conv_treatment")).cast(
        "double"
    ) / (F.col("n_control") + F.col("n_treatment"))
    z = F.when(
        pooled * (1 - pooled) != 0,
        (rate_t - rate_c)
        / F.sqrt(
            pooled
            * (1 - pooled)
            * (1.0 / F.col("n_control") + 1.0 / F.col("n_treatment"))
        ),
    )
    return c.select(
        "n_control",
        "conv_control",
        F.round(rate_c, 6).alias("rate_control"),
        "n_treatment",
        "conv_treatment",
        F.round(rate_t, 6).alias("rate_treatment"),
        F.round(rate_t - rate_c, 6).alias("lift"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > AB_Z_CRIT).alias("significant"),
    )


# --------------------------------------------------------------------------
# q_corr_metrics — exact Pearson correlation from BIGINT power sums
# --------------------------------------------------------------------------
def _corr_from_sums(n, sx, sy, sxy, sxx, syy) -> F.Column:
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    return num / den


def _corr_sql(x: str, y: str) -> str:
    return (
        f"round(CAST(n * s_{x}{y} - s_{x} * s_{y} AS DOUBLE)"
        f" / (sqrt(CAST(n * s_{x}{x} - s_{x} * s_{x} AS DOUBLE))"
        f" * sqrt(CAST(n * s_{y}{y} - s_{y} * s_{y} AS DOUBLE))), 6)"
    )


@query(
    "q_corr_metrics",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
                   AS v,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
                   AS c,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS p,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS r
        FROM events GROUP BY 1
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s_v, CAST(SUM(c) AS BIGINT) AS s_c,
               CAST(SUM(p) AS BIGINT) AS s_p, CAST(SUM(r) AS BIGINT) AS s_r,
               CAST(SUM(v * p) AS BIGINT) AS s_vp,
               CAST(SUM(c * r) AS BIGINT) AS s_cr,
               CAST(SUM(v * v) AS BIGINT) AS s_vv,
               CAST(SUM(c * c) AS BIGINT) AS s_cc,
               CAST(SUM(p * p) AS BIGINT) AS s_pp,
               CAST(SUM(r * r) AS BIGINT) AS s_rr
        FROM daily
    )
    SELECT n AS n_days,
           {_corr_sql('v', 'p')} AS corr_views_purchases,
           {_corr_sql('c', 'r')} AS corr_clicks_revenue
    FROM sums
    """,
)
def q_corr_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between daily metric pairs (views vs purchases,
    clicks vs revenue-cents) computed from exact BIGINT power sums
    (n, Σx, Σy, Σxy, Σx², Σy²) rather than a float corr() aggregate —
    float corr over shuffled doubles depends on partition merge order;
    integer power sums do not, so the result is bit-deterministic and
    both engines agree before rounding.

    Scale: one map-side-combinable agg to |days| rows, one single-row
    reduce of the power sums. Revenue is held as cents-BIGINT the whole
    way; doubles appear only in the final projection. At 100 TB the power
    sums stay partial-aggregable — this is the textbook one-pass
    streaming-corr shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("long")
            .alias("v"),
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("long")
            .alias("c"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("p"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("r"),
        )
    )
    sums = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s_v"),
        F.sum("c").cast("long").alias("s_c"),
        F.sum("p").cast("long").alias("s_p"),
        F.sum("r").cast("long").alias("s_r"),
        F.sum(F.col("v") * F.col("p")).cast("long").alias("s_vp"),
        F.sum(F.col("c") * F.col("r")).cast("long").alias("s_cr"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s_vv"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s_cc"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("s_pp"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("s_rr"),
    )
    n = F.col("n")
    return sums.select(
        n.alias("n_days"),
        F.round(
            _corr_from_sums(
                n, F.col("s_v"), F.col("s_p"), F.col("s_vp"),
                F.col("s_vv"), F.col("s_pp"),
            ),
            6,
        ).alias("corr_views_purchases"),
        F.round(
            _corr_from_sums(
                n, F.col("s_c"), F.col("s_r"), F.col("s_cr"),
                F.col("s_cc"), F.col("s_rr"),
            ),
            6,
        ).alias("corr_clicks_revenue"),
    )


# --------------------------------------------------------------------------
# q_snapshot_diff — CDC between two as-of states
# --------------------------------------------------------------------------
SNAP_T1 = "2024-01-15"  # first snapshot cutoff (exclusive)


@query(
    "q_snapshot_diff",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               CAST(COUNT(CASE WHEN ts < TIMESTAMP '{SNAP_T1}' THEN 1 END)
                    AS BIGINT) AS n1,
               CAST(COUNT(*) AS BIGINT) AS n2,
               CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{SNAP_T1}'
                        THEN CAST(round(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS cents1,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents2
        FROM events GROUP BY user_id
    ),
    tagged AS (
        SELECT CASE WHEN n1 = 0 THEN 'added'
                    WHEN n2 > n1 THEN 'changed'
                    ELSE 'unchanged' END AS status,
               n2 - n1 AS d_events, cents2 - cents1 AS d_cents
        FROM s
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(d_events) AS BIGINT) AS delta_events,
           CAST(SUM(d_cents) AS BIGINT) AS delta_cents
    FROM tagged GROUP BY status
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: the per-user accumulator state (event
    count, value-cents total) as of {SNAP_T1} vs end-of-data, classified
    added / changed / unchanged — the full-outer-join change-feed pattern
    collapsed to one scan because the later snapshot subsumes the earlier
    one (append-only source; 'removed' cannot occur, by construction).

    Scale: both snapshots come from a single pass with conditional
    aggregates — one map-side-combinable shuffle on user_id instead of
    materializing two state tables and full-outer-joining them. When the
    snapshots genuinely are two stored tables (the general case), the
    join form applies; bucket both on user_id to make it co-located.
    Money stays cents-BIGINT throughout — deltas are exact."""
    ev = load_table(spark, sf_dir, "events")
    t1 = F.lit(SNAP_T1).cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    s = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("ts") < t1, 1)).cast("long").alias("n1"),
        F.count("*").cast("long").alias("n2"),
        F.coalesce(F.sum(F.when(F.col("ts") < t1, cents)), F.lit(0))
        .cast("long")
        .alias("cents1"),
        F.sum(cents).cast("long").alias("cents2"),
    )
    tagged = s.select(
        F.when(F.col("n1") == 0, "added")
        .when(F.col("n2") > F.col("n1"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (F.col("n2") - F.col("n1")).alias("d_events"),
        (F.col("cents2") - F.col("cents1")).alias("d_cents"),
    )
    return tagged.groupBy("status").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("d_events").cast("long").alias("delta_events"),
        F.sum("d_cents").cast("long").alias("delta_cents"),
    )


@query(
    "q_chi_square",
    oracle="""
    WITH cells AS (
        SELECT event_type, EXTRACT(isodow FROM ts) AS dow, COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, dow, o,
               SUM(o) OVER (PARTITION BY event_type) AS rt,
               SUM(o) OVER (PARTITION BY dow) AS ct,
               SUM(o) OVER () AS n
        FROM cells
    ),
    terms AS (
        SELECT event_type, o,
               CAST(ROUND(
                   (o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n), 6
               ) AS DECIMAL(18,6)) AS term
        FROM tot
    )
    SELECT event_type,
           CAST(SUM(o) AS BIGINT) AS n_events,
           CAST(SUM(term) AS DOUBLE) AS chi2_contrib
    FROM terms GROUP BY event_type
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit: is event-type volume independent of
    ISO weekday? Emits each event type's contribution to the statistic —
    the per-dimension readout a seasonality monitor alerts on.

    Determinism contract (same pattern as q_corr_metrics): observed/row/
    column/grand totals are exact BIGINT counts; the per-cell
    (o-e)^2/e term is a scalar DOUBLE from those integers (bit-identical
    in both engines), rounded to DECIMAL(18,6) so the cross-cell SUM is
    exact-decimal — no float-summation order dependence under any
    partitioning.

    Scale: one shuffle to the |types|x7 cell grid; every window/total
    runs over that driver-sized frame. The raw fact contributes only
    map-side count partials."""
    ev = load_table(spark, sf_dir, "events")
    dow_raw = F.dayofweek("ts")
    cells = ev.groupBy(
        "event_type",
        F.when(dow_raw == 1, 7).otherwise(dow_raw - 1).cast("long").alias("dow"),
    ).agg(F.count("*").alias("o"))
    tot = cells.select(
        "event_type",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).alias("ct"),
        F.sum("o").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).cast(
        "decimal(18,6)"
    )
    return tot.select("event_type", "o", term.alias("term")).groupBy(
        "event_type"
    ).agg(
        F.sum("o").cast("long").alias("n_events"),
        F.sum("term").cast("double").alias("chi2_contrib"),
    )


@query(
    "q_gini",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
        FROM rev
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           CAST(2 * SUM(i * rev) - (COUNT(*) + 1) * SUM(rev) AS DOUBLE)
               / CAST(COUNT(*) * SUM(rev) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    single-number inequality readout beside q_pareto's decile table.
    Formula: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    revenues ranked ascending with a custkey tie-break.

    Determinism: revenues and the rank-weighted sum are exact DECIMAL
    (i * rev is bigint x decimal); only the final ratio is DOUBLE, from
    two exactly-computed operands.

    Scale: the fact collapses to customer grain first (one map-side
    combinable shuffle); the global rank then runs over the |customers|
    aggregate — a range-partitioned sort at scale (same contract as
    q_ntile/q_mix_interleave: global order only ever over the
    dim-grain frame, never raw facts)."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = rev.select("rev", F.row_number().over(w).alias("i"))
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").cast("double").alias("total_revenue"),
        (
            (2 * F.sum(F.col("i") * F.col("rev"))
             - (F.count("*") + 1) * F.sum("rev")).cast("double")
            / (F.count("*") * F.sum("rev")).cast("double")
        ).alias("gini"),
    )
