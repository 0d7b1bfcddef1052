"""Decision-support suite, part 2: the remaining TPC-H query shapes.

Completes the 22-query TPC-H-shape coverage started in
:mod:`saas_analytics_pipeline_spark.operators.tpch` (Q1/3/4/5/6/10/14/15/
18/19 there) with the correlated-subquery, multi-EXISTS, and outer-join
shapes: Q2, Q7, Q8, Q9, Q11, Q12, Q13, Q16, Q17, Q20, Q21, Q22. Like part
1, each is re-derived from the published TPC-H SQL (tpc.org) against THIS
schema, not copied — the testdata (TESTDATA.md) has no ``partsupp`` table
and lineitem carries no commit/receipt dates or ship modes, so:

- the supply relation is the *observed* one: ``SELECT DISTINCT l_partkey,
  l_suppkey FROM lineitem`` stands in for partsupp (Q2/Q16);
- ``ps_supplycost`` proxies: Q2 picks the min-``s_acctbal`` supplier
  (correlated-min + equality-join-back shape preserved); Q9 costs a
  lineitem at ``0.10 * p_retailprice * l_quantity``;
- "late" is ``l_shipdate > o_orderdate + 150 days`` (no receipt/commit
  dates) for Q12/Q21; Q12 groups by ``l_returnflag`` (no ship modes);
- Q13's comment filter and Q16's supplier-complaint filter become
  ``o_orderpriority <> '5-LOW'`` and ``s_acctbal < 0``;
- Q22's country-code substring becomes ``c_nationkey`` buckets, and "no
  orders" is date-bounded (every sf customer has *some* order).

Scale notes (100 TB) — same policy as part 1:
- exact DECIMAL money partials everywhere; doubles only in the final
  projection, so AQE re-plans are bit-deterministic;
- hard broadcast hints only on constant-size frames (nation=25, region=5,
  1-row scalar aggregates); sf-scaled dims rely on pruning + AQE;
- correlated subqueries become aggregate-then-join-back (one extra
  pass over an already-aggregated frame, never a per-row subquery);
- EXISTS / NOT EXISTS over the same fact (Q21) become one grouped pass
  computing the per-order supplier counts — the fact shuffles once on
  orderkey instead of three correlated probes;
- top-k outputs use TakeOrderedAndProject with explicit tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.functions import money, money_sum
from saas_analytics_pipeline_spark.operators.tpch import (
    _DISC_PRICE_SQL,
    _disc_price,
)
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

LATE_DAYS = 150  # "kept waiting" threshold; stands in for receipt>commit


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@query(
    "q_tpch_min_cost_supplier",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
               CAST(s.s_acctbal AS DECIMAL(18,2)) AS bal
        FROM pairs j
        JOIN part p ON p.p_partkey = j.l_partkey
        JOIN supplier s ON s.s_suppkey = j.l_suppkey
        WHERE p.p_size IN (5, 15, 25) AND p.p_type = 'LARGE'
    )
    SELECT c.p_partkey, c.p_name, c.s_suppkey, c.s_name,
           CAST(c.bal AS DOUBLE) AS s_acctbal
    FROM cand c
    JOIN (SELECT p_partkey, MIN(bal) AS min_bal FROM cand GROUP BY p_partkey)
        m ON m.p_partkey = c.p_partkey AND c.bal = m.min_bal
    ORDER BY s_acctbal DESC, c.p_partkey, c.s_suppkey
    LIMIT 20
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape): for every size-15
    LARGE part, the supplier(s) achieving the per-part minimum cost —
    the correlated-MIN-subquery joined back on equality. Cost proxy is
    ``s_acctbal`` (no ps_supplycost in this schema); the supply relation
    is the distinct (partkey, suppkey) pairs observed in lineitem.

    Scale: the pair extraction shuffles two int keys, never money or
    text; part prunes FIRST (size+type pushed to its scan) so the
    candidate set is |pruned parts| x avg suppliers-per-part; the min is
    a per-part aggregate of that already-small frame joined back on
    (partkey, exact-decimal bal) — no per-row subquery. Top-20 via
    TakeOrderedAndProject with a full (bal, partkey, suppkey) tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size").isin(5, 15, 25) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", money("s_acctbal").alias("bal")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .join(s, pairs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "bal")
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("bal").alias("min_bal")
    )
    return (
        cand.join(
            min_bal,
            (cand.p_partkey == min_bal.mk) & (cand.bal == min_bal.min_bal),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("bal").cast("double").alias("s_acctbal"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(20)
    )


@query(
    "q_tpch_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral volume shipping (TPC-H Q7 shape): discounted revenue
    flowing between two nations in either direction, per ship year.

    Scale: supplier and customer are each pruned to the TWO target
    nations *before* touching the facts (nation keeps its 25-row hint;
    the pruned dims are ~2/25 of sf-scale and carry no hard hint — AQE
    broadcasts them when they fit). Lineitem joins the pruned supplier
    set BEFORE the orderkey shuffle (Catalyst won't reorder inner joins
    without CBO stats), cutting the exchanged fact to the two-nation
    ~8% slice on top of the date prune. The bilateral OR is applied
    after both nation names are attached; the only fact-fact shuffle is
    the reduced lineitem <-> orders on orderkey."""
    nations = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bilateral = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(bilateral)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE_SQL} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'EUROPE'
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
           COUNT(*) AS n_items
    FROM vol
    GROUP BY o_year
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_3's share of the
    STANDARD-part revenue sold to EUROPE customers, per order year.

    Scale: part prunes to (partkey) with the type predicate pushed to its
    scan; customers prune through nation->region (both constant-size,
    hint-broadcast) to the EUROPE subset. The share's numerator is a
    conditional exact-decimal sum over the SAME aggregated frame as the
    denominator — one grouped pass, no second scan, division once per
    output year. Fact-fact shuffle: lineitem <-> orders on orderkey."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_tpch_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_DISC_PRICE_SQL}
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(4,0))
                      * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit (TPC-H Q9 shape): per supplier nation and
    order year, profit on parts whose name contains 'gear'. With no
    ps_supplycost the unit cost proxies as 10% of p_retailprice.

    Scale: part prunes on the name predicate (pushed as a scan filter)
    to (partkey, retailprice); profit terms are exact DECIMAL products
    ((12,2)x(4,0)x(3,2) — bounded width, no overflow at any sf) summed
    as partials, so re-partitioning never changes the result. Nation is
    hint-broadcast; supplier/part carry no hard hint. Fact-fact shuffle:
    lineitem <-> orders on orderkey."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,0)")
        * F.lit("0.10").cast("decimal(3,2)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(_disc_price() - cost).cast("double").alias("sum_profit"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_important_parts",
    oracle=f"""
    WITH restricted AS (
        SELECT l.l_partkey, {_DISC_PRICE_SQL} AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
    ),
    per_part AS (
        SELECT l_partkey AS p_partkey, SUM(val) AS value_dec
        FROM restricted GROUP BY l_partkey
    )
    SELECT p_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM per_part
    WHERE value_dec > (SELECT SUM(value_dec) * CAST(0.0005 AS DECIMAL(5,4))
                       FROM per_part)
    """,
)
def q_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock parts (TPC-H Q11 shape): parts whose discounted
    revenue through three nations' suppliers exceeds 0.05% of that
    restricted total — the scalar-subquery-in-HAVING shape. Value is
    lineitem revenue (no partsupp availqty/supplycost here).

    Scale: suppliers prune through the 25-row nation broadcast before
    the fact join; the fact aggregates to |parts| rows ONCE and the
    grand total re-aggregates that per-part frame (decimal partials are
    associative, so the two-level sum is exact and scan-free); the 1-row
    total broadcasts back as the HAVING threshold. Exact-decimal
    compare, no doubles until the final projection."""
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit("0.0005").cast("decimal(5,4)")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec") > F.col("threshold"))
        .select("p_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@query(
    "q_tpch_late_priority",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority mix (TPC-H Q12 shape): per return flag (the
    ship-mode stand-in), how many late-shipped 1998 lineitems belonged to
    high- vs low-priority orders. "Late" = shipped more than
    ``LATE_DAYS`` after the order date (no commit/receipt dates here).

    Scale: the ship-year window is pushed to the lineitem scan; the
    lateness predicate needs o_orderdate so it runs right after the one
    orderkey join; conditional BIGINT counts are map-side partials to a
    <=3-row output."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1998-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1999-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_order_counts",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey,
               COALESCE(oc.cnt, 0) AS c_count
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS cnt
            FROM orders
            WHERE o_orderpriority <> '5-LOW'
            GROUP BY o_custkey
        ) oc ON oc.o_custkey = c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_tpch_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): histogram of
    per-customer order counts, zero-order customers included via the
    left outer join. The priority filter stands in for the original
    comment NOT LIKE (this schema has no o_comment).

    Scale: orders pre-aggregate to per-custkey counts BELOW the outer
    join — the join carries |customers| + |active customers| rows, not
    |orders| — and the histogram is a second tiny aggregation over the
    customer-grain frame. This beats the textbook LEFT JOIN + GROUP BY
    customer plan, which shuffles every order row."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    oc = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        c.join(oc, c.c_custkey == oc.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_part_suppliers",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT j.l_suppkey) AS supplier_cnt
    FROM pairs j
    JOIN part p ON p.p_partkey = j.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 15, 25, 35, 45)
      AND j.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier counts by part attributes (TPC-H Q16 shape): distinct
    suppliers per (brand, type, size) over the observed supply relation,
    excluding flagged suppliers (negative balance stands in for the
    complaints filter) — the NOT IN + COUNT DISTINCT shape.

    Scale: the distinct (partkey, suppkey) extraction shuffles two int
    keys; part's brand/type/size predicates push to its scan; the NOT IN
    becomes a left-anti hash join against the flagged-supplier subset
    (no hard hint — it's sf-scaled; AQE broadcasts it when small). The
    count-distinct runs on the already-pruned pair frame."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 15, 25, 35, 45)
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(flagged, pairs.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_small_qty_revenue",
    oracle="""
    WITH agg AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty_sum,
               COUNT(*) AS qty_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
        GROUP BY l.l_partkey
    )
    SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 4) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN agg a ON a.l_partkey = l.l_partkey
    WHERE 2 * CAST(l.l_quantity AS DECIMAL(18,2)) * a.qty_cnt < a.qty_sum
    """,
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): average yearly
    revenue lost if Brand#3 orders below half the part's average quantity
    were not taken — the correlated AVG subquery, aggregate-then-join-
    back, with the average compare cross-multiplied into exact integers
    (``2*qty*cnt < sum``) so no division happens on the comparison path.

    Scale: the per-part averages aggregate the brand-restricted fact
    (brand pushed into part's scan, semi-joined down) to |brand parts|
    rows; joining that tiny frame back probes on partkey. The only
    division is the final 1-row /7.0."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    branded = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    agg = branded.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.sum(money("l_quantity")).alias("qty_sum"),
        F.count("*").alias("qty_cnt"),
    )
    return (
        branded.join(agg, branded.l_partkey == agg.ak)
        .where(
            F.lit(2) * money("l_quantity") * F.col("qty_cnt") < F.col("qty_sum")
        )
        .agg(
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0), 4
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS total_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small %'
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 100
    )
    SELECT s.s_suppkey, s.s_name, CAST(sh.total_qty AS DOUBLE) AS total_qty
    FROM supplier s
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_4'
    """,
)
def q_tpch_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-volume part suppliers (TPC-H Q20 shape): NATION_4 suppliers
    who shipped over 100 units of 'small *' parts during 1997 — the
    nested IN-subquery chain (partkey IN ... , suppkey IN ...) flattened
    to prune-join-aggregate-join. Threshold compares availqty in the
    original; here it bounds observed shipped quantity.

    Scale: part prunes on the name prefix at its scan; the date window
    prunes lineitem at its scan; quantities aggregate to per-suppkey
    partials below the supplier join; nation stays a 25-row broadcast.
    Exact-decimal HAVING; |suppliers|-bounded output."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > F.lit(100).cast("decimal(18,2)"))
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return s.join(shipped, s.s_suppkey == shipped.l_suppkey).select(
        "s_suppkey", "s_name", F.col("total_qty").cast("double").alias("total_qty")
    )


@query(
    "q_tpch_waiting_suppliers",
    oracle=f"""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_6'
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): NATION_6
    suppliers that were the ONLY late supplier on a multi-supplier
    finalized order. The oracle keeps the textbook EXISTS / NOT-EXISTS
    form; the Spark plan computes the same thing with ONE grouped pass
    over the order's lineitems — per order: distinct suppliers and
    distinct LATE suppliers — then keeps late rows where
    ``n_supp > 1 AND n_late = 1``. "Late" = shipped > LATE_DAYS after
    the order date (no receipt/commit dates in this schema).

    Scale: the correlated-EXISTS pair would probe the fact three times;
    the grouped rewrite shuffles lineitem once on orderkey (already
    needed for the orders join), aggregates per order, and joins the
    <=|orders| count frame back to the late rows on the same key — so
    the second pass is co-partitioned. Supplier/nation prune runs last
    on an already-small frame; top-10 via TakeOrderedAndProject."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late"
        ),
    )
    sole_late = (
        lo.where(F.col("is_late"))
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_6")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q_tpch_dormant_customers",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    ),
    avg_bal AS (
        SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_pos
        FROM pool WHERE bal > 0
    )
    SELECT p.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(p.bal) AS DOUBLE) AS totacctbal
    FROM pool p, avg_bal a
    WHERE CAST(p.bal AS DOUBLE) > a.avg_pos
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = p.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY p.c_nationkey
    """,
)
def q_tpch_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers (TPC-H Q22 shape): per nation
    bucket (the country-code substring stand-in), customers whose
    balance beats the pool's positive average but who placed no order
    since 2000 — scalar AVG subquery + NOT EXISTS anti join. The
    dormancy window is date-bounded because every sf customer has some
    lifetime order.

    Scale: the average comes from one exact-decimal (sum, count) row
    broadcast back (double division happens once, identically in both
    engines — never a float accumulation); the NOT EXISTS is a left-anti
    hash join against date-pruned order custkeys (distinct-collapsed
    map-side). Output is <=|nation buckets| rows."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
        .select("c_custkey", "c_nationkey", money("c_acctbal").alias("bal"))
    )
    stats = (
        pool.where(F.col("bal") > 0)
        .agg(
            (F.sum("bal").cast("double") / F.count("*")).alias("avg_pos"),
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(stats))
        .where(F.col("bal").cast("double") > F.col("avg_pos"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )
