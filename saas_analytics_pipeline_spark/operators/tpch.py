"""Decision-support join suite over the TPC-H-shaped testdata tables.

The driver's testdata is TPC-H-ish (TESTDATA.md: region nation customer
supplier part orders lineitem); the reference's warehouse models only touch
the SaaS slice of it (orders/customers/events). This module exercises the
remaining tables — ``supplier`` and ``part`` were otherwise never read —
with the classic public decision-support query shapes (TPC-H spec,
tpc.org): pricing summary (Q1), shipping priority (Q3), local supplier
volume (Q5), promo revenue share (Q14), top supplier (Q15), large-volume
orders (Q18). They are re-derived from the published SQL against THIS
schema (no partsupp table; o_orderpriority instead of shippriority), not
copied.

Scale notes (100 TB):
- Money math is exact DECIMAL end-to-end (functions.money): partial sums
  are exact so any partitioning/AQE re-plan is bit-deterministic; the cast
  to DOUBLE happens once, in the final projection.
- Hard broadcast hints ONLY on constant-size dims (region=5, nation=25
  rows) and on provably-bounded derived frames (1-row maxes, argmax
  winners). sf-scaled dims (customer/part/supplier) carry NO hard hint —
  they rely on pre-aggregation below the join plus AQE, which broadcasts
  a side only when its runtime size actually fits (same policy as
  joins.py). The bucketed-write path (plans/writers.py) co-locates
  repeat joins where even shuffle joins get expensive.
- The one unavoidable fact-fact shuffle is orders <-> lineitem on
  orderkey; every query aggregates BELOW the join where possible (Q18
  pre-aggregates lineitem per orderkey before touching orders) so the
  shuffled payload is the aggregate, not the raw fact.
- Top-k outputs (Q3) rely on TakeOrderedAndProject (per-partition top-k +
  driver merge of k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.functions import money, money_sum
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

RATE = "decimal(4,2)"  # discount/tax rates: 0.00 .. 0.99 exact


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount) as exact decimal."""
    return money("l_extendedprice") * (
        F.lit(1).cast(RATE) - F.col("l_discount").cast(RATE)
    )


def _charge() -> F.Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax) as exact decimal."""
    return _disc_price() * (F.lit(1).cast(RATE) + F.col("l_tax").cast(RATE))


# DuckDB twins of the expressions above. Decimal widths differ between the
# engines ((23,4) vs (22,4) for the product) but both are exact, so the
# DOUBLE surfaced at the end is identical.
_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_CHARGE_SQL = (
    f"{_DISC_PRICE_SQL} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
)


@query(
    "q_tpch_pricing",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100, 0) AS BIGINT) AS q100,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
               CAST(round(l_discount * 100, 0) AS BIGINT) AS d100,
               CAST(round(l_tax * 100, 0) AS BIGINT) AS t100
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(q100) AS DOUBLE) / 100 AS sum_qty,
           CAST(SUM(pc) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(pc * (100 - d100)) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(pc * (100 - d100) * (100 + t100)) AS DOUBLE) / 1000000
               AS sum_charge,
           round((CAST(SUM(q100) AS DOUBLE) / 100)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty,
           round((CAST(SUM(pc) AS DOUBLE) / 100)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_price,
           round((CAST(SUM(d100) AS DOUBLE) / 100)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): per (returnflag,
    linestatus) exact quantity/price/discount/charge rollup over shipped
    lineitems.

    Scale + engine notes: money is EXACT INTEGER cents / 1e-4 / 1e-6
    units (2-dp inputs make round(x*100) exact), summed in TWO LEVELS —
    per-partition BIGINT partials first (long-typed codegen accumulators,
    ~1.5x faster than Int128 decimal sums), then a DECIMAL(38,0) combine
    over the |groups| x |partitions| partial rows. The BIGINT partial
    cannot overflow: per-row charge is < 1.2e11 micro-units, and a
    128 MB parquet split holds ~2e6 lineitems -> partial < 2.4e17, 38x
    under the long ceiling regardless of total table size; the DECIMAL
    combine then absorbs any number of partitions. Filter is pushed to
    the scan; partial aggregation collapses map-side (spark_partition_id
    is constant within a task), so the exchange carries <= 6 rows per
    partition. Averages derive from the exact sums in the final
    projection — no float accumulation anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    q100 = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    d100 = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    t100 = F.round(F.col("l_tax") * 100, 0).cast("bigint")
    part = (
        li.where(
            F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(q100).alias("sq"),
            F.sum(pc).alias("sp"),
            F.sum(pc * (100 - d100)).alias("sd"),
            F.sum(pc * (100 - d100) * (100 + t100)).alias("sc"),
            F.count("*").alias("n"),
            F.sum(d100).alias("sdisc"),
        )
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast("double")  # noqa: E731
    n = F.sum("n")
    return part.groupBy("l_returnflag", "l_linestatus").agg(
        (dec("sq") / 100).alias("sum_qty"),
        (dec("sp") / 100).alias("sum_base_price"),
        (dec("sd") / 10000).alias("sum_disc_price"),
        (dec("sc") / 1000000).alias("sum_charge"),
        F.round((dec("sq") / 100) / n.cast("double"), 6).alias("avg_qty"),
        F.round((dec("sp") / 100) / n.cast("double"), 6).alias("avg_price"),
        F.round((dec("sdisc") / 100) / n.cast("double"), 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "q_tpch_shipping",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): top-10 unshipped BUILDING-segment
    orders by outstanding revenue as of the cutoff date.

    Scale: customer contributes ONLY its segment filter (no output columns),
    so it rides a LEFT SEMI join — the shuffle carries just c_custkey, and
    no broadcast hint is needed on an sf-scaled table (segment-filtered
    customer is still sf x 30k rows; at the 100 TB target that exceeds the
    8 GB broadcast limit). AQE may still pick broadcast at small SF.
    orders <-> lineitem is the one fact shuffle. The top-10 is
    TakeOrderedAndProject — each partition keeps 10 rows, the driver merges
    10, no global sort. Ties are broken by (orderdate, orderkey) so the
    limit is deterministic under any partitioning.

    Equivalence note: the semi-join rewrite of the oracle's inner join is
    value-identical ONLY because c_custkey is unique (an inner join against
    duplicate dim keys would multiply fact rows; a semi join would not).
    q_uniqueness / quality.checks guards that PK, so a dirty dim fails the
    DQ gate rather than silently diverging from the oracle."""
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_local_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): revenue from 1996 orders
    where the customer and the lineitem's supplier share an ASIA nation —
    the classic 6-way join with a non-FK equality (c_nationkey =
    s_nationkey) folded into the supplier join.

    Scale: region -> nation -> supplier prune FIRST (ASIA suppliers only —
    nation/region keep hints, they are 25/5 constant rows), then lineitem
    joins the pruned supplier set BEFORE the orderkey shuffle: Catalyst
    does not reorder inner joins without CBO stats, and the supplier
    match cuts lineitem to the ASIA fifth, so expressing it first shrinks
    the orderkey exchange ~5x (measured: -29% at sf0.1, -39% at sf1 for
    the whole query). The region-restricted condition on that join is
    suppkey-only; the c_nationkey = s_nationkey half rides the orderkey
    join where customer is in scope — identical inner-join semantics.
    customer and the pruned supplier set both scale with sf, so neither
    carries a hard broadcast hint; AQE converts any side that is actually
    small at runtime, and nothing forces an sf-scaled table through the
    8 GB broadcast limit."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # ASIA suppliers with nation name — sf-scaled, so no hard hint on the
    # result; only nation(25)/region(5) are hint-broadcast into the prune.
    # AQE broadcasts the pruned supplier set downstream if it proves small.
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    li_asia = li.join(s_asia, li.l_suppkey == s_asia.s_suppkey)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(
            li_asia,
            (li_asia.l_orderkey == o.o_orderkey)
            & (c.c_nationkey == li_asia.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_promo_share",
    oracle=f"""
    SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_DISC_PRICE_SQL} END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE), 6) AS promo_share,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_promo_items,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): percentage of one ship-
    month's discounted revenue attributable to PROMO-type parts.

    Scale: part is sf-scaled (sf x 200k) so it carries NO hard broadcast
    hint — only p_partkey/p_type are read (column pruning reaches the
    scan) and AQE broadcasts the pruned side when it actually fits; at
    100 TB this is a partkey shuffle join of a month-filtered fact against
    a two-column dim. Conditional sums are exact decimal partials; the
    ratio is one final-row double division."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price())
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double"),
                6,
            ).alias("promo_share"),
            F.sum(F.when(F.col("p_type") == "PROMO", 1).otherwise(0))
            .cast("long")
            .alias("n_promo_items"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): supplier(s) with the maximum
    discounted revenue over one quarter — the create-view-then-argmax
    pattern, expressed as agg + broadcast-max semijoin instead of a view.

    Scale: revenue aggregates lineitem down to <= |suppliers| rows before
    anything else touches it; the max is a 1-row broadcast compared
    scan-side (no global window, no second scan of the fact). Exact
    decimal sums make the equality-with-max safe — both sides are the
    same bit-identical double. supplier is sf-scaled, so the broadcast
    hint sits on the max-filtered winner rows (>= 1 row, ties only), and
    supplier is probed on its key without a hard hint."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    winners = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("l_suppkey", "total_revenue")
    )
    return s.join(
        F.broadcast(winners), winners.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "q_tpch_big_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                   / 100 AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 15000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_tpch_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): orders whose total lineitem
    quantity exceeds 150 units, enriched with customer and order headers.

    Scale: the HAVING pre-aggregation runs FIRST — lineitem collapses to
    per-order quantity sums (map-side partials) and the >150 filter drops
    ~90% of orders before any join, so the join input is the small
    survivor set, not the raw fact. customer is sf-scaled so it carries
    NO hard broadcast hint — the survivor side is the small one by
    construction, and AQE sees its runtime size and broadcasts IT if it
    fits; at worst this is a custkey shuffle join of two reduced sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # quantity in exact integer centi-units: 2-dp inputs make
    # round(q*100) exact, and the per-order BIGINT sum is bounded by
    # lines-per-order (~7) — long accumulators, never Int128 decimal
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("bigint"))
            .alias("q100")
        )
        .where(F.col("q100") > 15000)
        .select(
            "l_orderkey", (F.col("q100").cast("double") / 100).alias("sum_qty")
        )
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            money("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "q_tpch_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): orders from one quarter
    with at least one lineitem shipped >30 days after ordering (this
    schema's stand-in for commitdate lateness), counted per priority.

    Scale: EXISTS compiles to a LEFT SEMI join — lineitem contributes at
    most one match per order and only its (orderkey, shipdate) columns
    are read; the quarter filter pushes down on orders so the semi-join
    probe side is already pruned. The non-equi lateness predicate rides
    the equi-join on orderkey, never a nested loop. The lineitem side
    additionally carries the DERIVED bound l_shipdate > quarter_start+30
    (the minimum the lateness predicate can accept given the order
    filter: o_orderdate >= 1997-01-01 implies date_add(o_orderdate,30)
    >= 1997-01-31, so no earlier shipdate can qualify) — a transitive
    filter Catalyst cannot infer across a non-equi condition; it pushes
    to the scan and cuts the shuffled fact to the post-January tail
    (measured -37% sf0.1 / -35% sf1)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .where(
            F.col("l_shipdate")
            > F.lit("1997-01-31 00:00:00").cast("timestamp")
        )
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 30)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q_tpch_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): what revenue would have
    been kept had mid-band discounts been dropped for small 1996 orders.

    Scale: the canonical single-scan aggregate — every predicate
    (shipdate range, discount band, quantity cap) pushes into the parquet
    scan, only (extendedprice, discount) leave it, and the sum is a
    map-side-combinable partial. No join, no wide shuffle; the whole plan
    is one WholeStageCodegen span feeding a 1-row final aggregate. The
    discount band compares the raw DOUBLE (generator emits exact 0.01
    steps; both engines see identical bit patterns), while the money
    product itself is exact DECIMAL per functions.money."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(money("l_extendedprice") * F.col("l_discount").cast(RATE))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_tpch_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns in 1996 Q4.

    Scale: revenue is aggregated to custkey grain BELOW the customer join
    — orders (quarter-pruned) shuffle-join lineitem (returnflag-pruned) on
    orderkey, collapse to per-custkey sums, and only then join the
    sf-scaled customer dim (no hard hint; AQE may broadcast the quarter's
    custkey aggregate if it is small at runtime). nation (25 rows) is
    hint-broadcast. The top-20 is TakeOrderedAndProject with a c_custkey
    tie-break, so the limit is deterministic under any partitioning."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    per_cust = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev").cast("double").alias("revenue"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_quantity_bands",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def q_tpch_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue bands (TPC-H Q19 shape): disjunctive
    brand x quantity-band predicates that only resolve after the
    part join.

    Scale: the OR spans both tables, so it cannot push below the join —
    but its brand arm CAN: part pre-filters to the 3 named brands
    (partkey+brand only), shrinking the build side by ~9x before the
    equi-join on partkey carries the residual band predicate. part is
    sf-scaled so no hard hint; AQE broadcasts the 3-brand slice when it
    fits. lineitem prunes l_quantity to the overall [1, 35] hull
    scan-side, the disjunction evaluates post-join in codegen."""
    brands = ("Brand#1", "Brand#2", "Brand#3")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand").isin(*brands))
        .select("p_partkey", "p_brand")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 35)
    )
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 35))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
