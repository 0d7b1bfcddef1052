"""Measured A/B of bucketed co-located joins vs plain shuffle joins.

`plans/writers.py::write_bucketed` is the repo's answer to repeated
fact-fact joins (orders x lineitem on orderkey every day at 100 TB):
bucket BOTH sides on the join key once at write time, and every
subsequent equi-join reads pre-partitioned, pre-sorted buckets — no
Exchange, no Sort, on either side. `tests/test_plans.py::
test_bucketed_join_skips_shuffle` pins the plan shape at sf0.001; this
probe puts a NUMBER on it at sf3 (18 M lineitems, 4.5 M orders):
the same orderkey join + per-order aggregate timed three ways in one
session —

  plain    parquet x parquet   (two Exchanges + two Sorts per run)
  bucketed table x table       (zero Exchanges, zero Sorts)

Broadcast is disabled: at 100 TB neither fact side broadcasts; AQE stays
on (it cannot remove a co-location shuffle, only resize it).

Writes the bucketed tables under /tmp/bucket_probe_wh (one-time cost,
reported separately — the amortization argument IS the point: pay one
shuffle at write, save one per downstream join).

Run:  python tools/bucket_probe.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF3 = ROOT / ".localdata" / "sf3"
WH = Path("/tmp/bucket_probe_wh")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    shutil.rmtree(WH, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bucket-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.warehouse.dir", str(WH))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    from saas_analytics_pipeline_spark.plans.writers import write_bucketed

    o = spark.read.parquet(str(SF3 / "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(str(SF3 / "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )

    t0 = time.perf_counter()
    write_bucketed(o, "bp_orders", "o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "bp_lineitem",
        "o_orderkey",
    )
    write_cost = round(time.perf_counter() - t0, 3)

    def joined(left, right):
        return (
            left.join(right, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                .alias("q100"),
            )
        )

    def timed(mk) -> dict:
        def run():
            mk().write.format("noop").mode("overwrite").save()

        run()  # warm
        times = []
        for _ in range(3):
            t = time.perf_counter()
            run()
            times.append(round(time.perf_counter() - t, 3))
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        return {
            "min_sec": min(times),
            "times": times,
            # pre-execution AQE plan string still shows the Exchanges the
            # run will need; bucketed scans need none before the agg
            "n_exchanges": plan.count("Exchange"),
        }

    plain = timed(lambda: joined(o, li.withColumnRenamed("l_orderkey", "o_orderkey")))
    bucketed = timed(
        lambda: joined(
            spark.table("bp_orders"), spark.table("bp_lineitem")
        )
    )

    # r12: bucketed PARTITIONED tables through the publish protocol —
    # the same A/B on a per-customer fact-fact join across month
    # partitions (publish_partition_overwrite(bucket_col=...) +
    # read_bucketed_partitioned), the daily-ingest layout that used to
    # forfeit co-location
    from saas_analytics_pipeline_spark.plans import publish as P

    of = spark.read.parquet(str(SF3 / "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def year_slice(y):
        return of.where(F.year("o_orderdate") == y).withColumn(
            "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
        )

    a, b = year_slice(1996), year_slice(1997)
    ra, rb = str(WH / "bktp_a"), str(WH / "bktp_b")
    t0 = time.perf_counter()
    P.publish_partition_overwrite(
        spark, a, ra, "mk", bucket_col="o_custkey", n_buckets=32
    )
    P.publish_partition_overwrite(
        spark, b, rb, "mk", bucket_col="o_custkey", n_buckets=32
    )
    part_write_cost = round(time.perf_counter() - t0, 3)

    def cust_join(left, right):
        def rev(t, out):
            return t.groupBy("o_custkey").agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).alias(out)
            )

        return rev(left, "r96").join(rev(right, "r97"), "o_custkey")

    plain_part = timed(lambda: cust_join(a, b))
    bucketed_part = timed(
        lambda: cust_join(
            P.read_bucketed_partitioned(spark, ra, "probe_bktp_a"),
            P.read_bucketed_partitioned(spark, rb, "probe_bktp_b"),
        )
    )

    print(
        json.dumps(
            {
                "plain": plain,
                "bucketed": bucketed,
                "bucket_write_sec": write_cost,
                "speedup": round(plain["min_sec"] / bucketed["min_sec"], 2),
                "partitioned": {
                    "plain": plain_part,
                    "bucketed": bucketed_part,
                    "publish_write_sec": part_write_cost,
                    "speedup": round(
                        plain_part["min_sec"] / bucketed_part["min_sec"], 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
