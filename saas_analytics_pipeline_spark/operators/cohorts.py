"""Cohort economics + statistical marts: LTV, churn, trend regression,
two-sample KS drift, revenue concentration (HHI).

Extends the declared marts layer (`/root/reference/README.md:9,38` —
"revenue / funnel / operations / attribution marts") with the
cohort-economics and statistical-audit marts a subscription analytics
team builds next: lifetime value by signup cohort, month-over-month
churn, revenue trend slopes, distribution-drift testing, and market
concentration.

Engine portability: every cross-row reduction is an exact
BIGINT/DECIMAL aggregate; doubles appear only in final per-row
projections (one division, then round) — so the DuckDB oracles replay
bit-for-bit under any partitioning/AQE re-plan.

Scale notes (100 TB):
- LTV/churn aggregate the fact to (customer, month) grain FIRST (map-side
  combinable), then every window runs over the cohort x offset / month
  aggregate — thousands of rows, never the raw fact.
- trend slope: OLS reduces to six exact power sums (n, Σx, Σy, Σxy, Σx²)
  per segment — partial-aggregable, bit-deterministic; the regression
  algebra happens in the |segments|-row final projection.
- KS: the CDF grid is QUANTIZED (1k-unit price bins) so the global
  cumulative window runs over a bounded histogram (~hundreds of rows),
  not the raw fact — the exact-KS alternative needs a global sort of all
  values, which does not survive 100x.
- HHI: Σshare² = Σrev²/ (Σrev)² — two exact decimal sums per nation, no
  window at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.functions import money
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table


def _midx(col: str) -> F.Column:
    """Month index YYYY*12+MM — exact integer month arithmetic."""
    return (F.year(col) * 12 + F.month(col)).cast("int")


_MIDX_SQL = "CAST(year({c}) * 12 + month({c}) AS INT)"


@query(
    "q_ltv",
    oracle=f"""
    WITH cm AS (
        SELECT o_custkey AS cust, {_MIDX_SQL.format(c="o_orderdate")} AS midx,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    coh AS (SELECT cust, MIN(midx) AS cohort FROM cm GROUP BY cust),
    g AS (
        SELECT cohort, midx - cohort AS offset_m,
               COUNT(DISTINCT cm.cust) AS n_active,
               SUM(rev) AS rev
        FROM cm JOIN coh ON cm.cust = coh.cust
        GROUP BY 1, 2
    )
    SELECT cohort, offset_m, n_active,
           CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY offset_m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_rev
    FROM g ORDER BY cohort, offset_m
    """,
)
def q_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative revenue per first-order cohort by
    month offset — the mart behind "how much is a month-N customer
    worth". Ref: revenue marts README.md:9,38 + retention shape.

    Scale: the fact collapses to (customer, month) grain map-side; cohort
    assignment is a per-customer MIN re-joined on the customer key; the
    cumulative window runs over the cohort x offset aggregate (bounded by
    months², never fact-sized). Decimal sums keep the running total exact
    under any partitioning."""
    o = load_table(spark, sf_dir, "orders")
    cm = o.groupBy(
        F.col("o_custkey").alias("cust"),
        _midx("o_orderdate").alias("midx"),
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    coh = cm.groupBy("cust").agg(F.min("midx").alias("cohort"))
    g = (
        cm.join(coh, "cust")
        .groupBy("cohort", (F.col("midx") - F.col("cohort")).alias("offset_m"))
        .agg(
            F.countDistinct("cust").alias("n_active"),
            F.sum("rev").alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.select(
            "cohort",
            "offset_m",
            "n_active",
            F.sum("rev").over(w).cast("double").alias("cum_rev"),
        )
        .orderBy("cohort", "offset_m")
    )


@query(
    "q_churn",
    oracle=f"""
    WITH cm AS (
        SELECT DISTINCT o_custkey AS cust,
               {_MIDX_SQL.format(c="o_orderdate")} AS midx
        FROM orders
    ),
    act AS (SELECT midx, COUNT(*) AS n_active FROM cm GROUP BY midx),
    ret AS (
        SELECT a.midx, COUNT(*) AS n_retained
        FROM cm a JOIN cm b ON a.cust = b.cust AND b.midx = a.midx - 1
        GROUP BY a.midx
    )
    SELECT act.midx, act.n_active,
           COALESCE(ret.n_retained, 0) AS n_retained,
           round(1.0 - CAST(COALESCE(ret.n_retained, 0) AS DOUBLE)
                 / CAST(LAG(act.n_active) OVER (ORDER BY act.midx)
                        AS DOUBLE), 6) AS churn_rate
    FROM act LEFT JOIN ret ON act.midx = ret.midx
    ORDER BY act.midx
    """,
)
def q_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month churn: of last month's active customers, the share
    that did NOT order this month. Ref: operations marts README.md:9.

    Scale: the fact collapses to DISTINCT (customer, month) map-side; the
    retention self-join keys on the customer — co-partitioned, carries two
    ints per row; the lag window runs over the |months|-row aggregate
    only."""
    o = load_table(spark, sf_dir, "orders")
    cm = o.select(
        F.col("o_custkey").alias("cust"), _midx("o_orderdate").alias("midx")
    ).distinct()
    act = cm.groupBy("midx").agg(F.count("*").alias("n_active"))
    prev = cm.select("cust", (F.col("midx") + 1).alias("midx"))
    ret = (
        cm.join(prev, ["cust", "midx"])
        .groupBy("midx")
        .agg(F.count("*").alias("n_retained"))
    )
    w = Window.orderBy("midx")
    out = (
        act.join(ret, "midx", "left")
        .withColumn("n_retained", F.coalesce("n_retained", F.lit(0)))
        .withColumn(
            "churn_rate",
            F.round(
                F.lit(1.0)
                - F.col("n_retained").cast("double")
                / F.lag("n_active").over(w).cast("double"),
                6,
            ),
        )
    )
    return out.select("midx", "n_active", "n_retained", "churn_rate").orderBy(
        "midx"
    )


@query(
    "q_trend_slope",
    oracle="""
    WITH daily AS (
        SELECT c.c_mktsegment AS segment,
               date_diff('day', DATE '1992-01-01',
                         CAST(o.o_orderdate AS DATE)) AS x,
               SUM(CAST(round(o.o_totalprice * 100, 0) AS DECIMAL(38,0)))
                   AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    sums AS (
        SELECT segment,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
               SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               CAST(SUM(CAST(x AS BIGINT) * x) AS DECIMAL(38,0)) AS sxx
        FROM daily GROUP BY segment
    )
    SELECT segment, CAST(n AS BIGINT) AS n_days,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_cents_per_day,
           round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 2)
               AS intercept_cents
    FROM sums ORDER BY segment
    """,
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS trend of daily revenue (cents/day): is each market
    segment growing, and how fast. Ref: revenue marts README.md:9 + perf
    hygiene README.md:12.

    Scale: OLS collapses to six exact power sums per segment — BIGINT/
    DECIMAL partials that combine map-side and are bit-deterministic
    under any partitioning (the float regression algebra runs once, in
    the |segments|-row final projection). The customer join carries only
    (custkey, segment); no window anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            .alias("x"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
            ).alias("y")
        )
    )
    sums = daily.groupBy("segment").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("bigint") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return sums.select(
        "segment",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den,
            6,
        ).alias("slope_cents_per_day"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                "double"
            )
            / den,
            2,
        ).alias("intercept_cents"),
    ).orderBy("segment")


KS_P1, KS_P2 = "1-URGENT", "5-LOW"
KS_BIN = 1000


@query(
    "q_ks_test",
    oracle=f"""
    WITH g AS (
        SELECT CAST(floor(o_totalprice / {KS_BIN}) AS BIGINT) AS bin,
               COUNT(*) FILTER (WHERE o_orderpriority = '{KS_P1}') AS c1,
               COUNT(*) FILTER (WHERE o_orderpriority = '{KS_P2}') AS c2
        FROM orders
        WHERE o_orderpriority IN ('{KS_P1}', '{KS_P2}')
        GROUP BY 1
    ),
    cum AS (
        SELECT bin,
               SUM(c1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum1,
               SUM(c2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum2,
               SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        FROM g
    )
    SELECT MAX(round(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE)), 9))
               AS d_stat,
           CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           COUNT(*) AS n_bins
    FROM cum
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between order-value
    distributions of two priority classes, on a quantized CDF grid —
    the distribution-drift test behind "did this cohort's spending shape
    change". Ref: DQ/ops surface README.md:54-59.

    Scale: values quantize to {KS_BIN}-unit bins SCAN-SIDE, so the global
    cumulative window runs over a bounded histogram (hundreds of rows),
    not the fact — exact KS would need a global sort of every value,
    which does not survive 100x. Counts are exact BIGINTs; the only
    doubles are the per-bin CDF divisions, rounded before MAX (order-
    free)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin(KS_P1, KS_P2)
    )
    g = o.groupBy(
        F.floor(F.col("o_totalprice") / KS_BIN).cast("bigint").alias("bin")
    ).agg(
        F.count(F.when(F.col("o_orderpriority") == KS_P1, 1)).alias("c1"),
        F.count(F.when(F.col("o_orderpriority") == KS_P2, 1)).alias("c2"),
    )
    wc = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "bin",
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.agg(
        F.max(
            F.round(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1").cast("double")
                    - F.col("cum2").cast("double")
                    / F.col("n2").cast("double")
                ),
                9,
            )
        ).alias("d_stat"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.count("*").alias("n_bins"),
    )


@query(
    "q_hhi",
    oracle="""
    WITH per_cust AS (
        SELECT n.n_name, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, COUNT(*) AS n_custs,
           round(CAST(SUM(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE)
                 / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)),
                 9) AS hhi
    FROM per_cust GROUP BY n_name ORDER BY n_name
    """,
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue concentration per nation: Σ share² =
    Σrev² / (Σrev)² — how dependent each market is on its top customers
    (the skew rule's business-side mirror,
    data_gen/pseudo_code_rules.txt:2-10).

    Scale: the algebraic identity removes the share computation entirely —
    two exact decimal sums per nation (rev and rev²), both map-side
    combinable; no window, one double division per output row. nation
    (25 rows) broadcasts; the customer join is the one key shuffle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    return (
        per_cust.groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(
                F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,4)"))
                .cast("double")
                / (
                    F.sum("rev").cast("double")
                    * F.sum("rev").cast("double")
                ),
                9,
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )


@query(
    "q_conversion_lag",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_buy
        FROM events GROUP BY user_id
    ),
    lags AS (
        SELECT CAST(floor(date_diff('second', first_view, first_buy)
                          / 3600.0) AS BIGINT) AS lag_hours
        FROM firsts
        WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
          AND first_buy >= first_view
    )
    SELECT lag_hours, COUNT(*) AS n_users
    FROM lags GROUP BY lag_hours ORDER BY lag_hours
    """,
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert histogram: hours between a user's first view and
    first purchase (converters only) — the funnel's latency dimension
    (q_funnel counts WHO converts; this measures HOW LONG it takes).
    Ref: funnel marts README.md:9,38.

    Scale: conditional MINs collapse the event stream to one row per user
    map-side; the lag and its hour bucket are scan-local integer math on
    that user-grain frame; the histogram re-aggregates to |buckets| rows.
    No window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    lag_hours = F.floor(
        (
            F.unix_timestamp("first_buy") - F.unix_timestamp("first_view")
        ).cast("double")
        / 3600.0
    ).cast("bigint")
    return (
        firsts.where(
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
            & (F.col("first_buy") >= F.col("first_view"))
        )
        .select(lag_hours.alias("lag_hours"))
        .groupBy("lag_hours")
        .agg(F.count("*").alias("n_users"))
        .orderBy("lag_hours")
    )


AGE_BANDS = [(0, 180), (181, 365), (366, 730), (731, 100000)]


@query(
    "q_backlog_aging",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    open_orders AS (
        SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(a.max_d AS DATE)) AS age_days,
               CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders CROSS JOIN anchor a
        WHERE o_orderstatus <> 'F'
    )
    SELECT o_orderpriority,
           CASE WHEN age_days <= 180 THEN '0-180'
                WHEN age_days <= 365 THEN '181-365'
                WHEN age_days <= 730 THEN '366-730'
                ELSE '731+' END AS age_band,
           COUNT(*) AS n_orders,
           CAST(SUM(v) AS DOUBLE) AS open_value
    FROM open_orders
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: unfinished orders banded by age at the
    lake's as-of date, per priority, with the open value at risk — the
    operations mart behind "how stale is the backlog". Ref: operations
    marts README.md:9.

    Scale: the anchor (global max date) is a 1-row broadcast; band
    assignment is scan-local integer day math (no float compare can move
    an order across a band); one map-side-combinable aggregate to
    |priorities| x |bands| rows. Exact decimal value sums."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("max_d"))
    age = F.datediff(F.to_date("max_d"), F.to_date("o_orderdate"))
    band = (
        F.when(age <= 180, "0-180")
        .when(age <= 365, "181-365")
        .when(age <= 730, "366-730")
        .otherwise("731+")
    )
    from saas_analytics_pipeline_spark.functions import money

    return (
        o.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(anchor))
        .groupBy("o_orderpriority", band.alias("age_band"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("open_value"),
        )
        .orderBy("o_orderpriority", "age_band")
    )


@query(
    "q_price_variance",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS DECIMAL(38,0)) AS sx,
               SUM(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        AS DECIMAL(38,0))) AS sxx
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5
    )
    SELECT l_partkey, n,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100 AS mean_price,
           sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(sx AS DOUBLE)
               AS cv
    FROM per_part
    ORDER BY cv DESC, l_partkey LIMIT 20
    """,
)
def q_price_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-consistency audit: parts whose line price varies most
    (coefficient of variation from exact integer power sums) — surfaces
    mispriced SKUs / unit mix-ups, the pricing sibling of the negative-
    price DQ rule (README.md:55).

    Scale: per-part n / Σx / Σx² in exact cents — map-side-combinable
    partials; the row-level square is BIGINT x BIGINT cast to DECIMAL
    before the sum (a 30k-line part at 100 TB would overflow a raw long
    sum of squares). The CV algebra (n·Σx² − Σx²) runs once per part on
    exact decimals; cv = sqrt(...)/Σx so the mean never materializes as a
    rounded intermediate. Top-20 is TakeOrderedAndProject with a partkey
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(pc).cast("decimal(38,0)").alias("sx"),
            F.sum((pc * pc).cast("decimal(38,0)")).alias("sxx"),
        )
        .where(F.col("n") >= 5)
    )
    return (
        per_part.select(
            "l_partkey",
            "n",
            # deliberately UNROUNDED doubles: both are pure functions of
            # exact integer sums, so the bit pattern is engine-identical —
            # while round() at a cent-half boundary is NOT (Spark rounds
            # the exact decimal value HALF_UP; DuckDB rounds the scaled
            # double, which can land on the other side of the half)
            (
                F.col("sx").cast("double") / F.col("n").cast("double") / 100
            ).alias("mean_price"),
            (
                F.sqrt(
                    (
                        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                / F.col("sx").cast("double")
            ).alias("cv"),
        )
        .orderBy(F.desc("cv"), "l_partkey")
        .limit(20)
    )
