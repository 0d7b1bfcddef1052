"""Measured A/B of AQE skew-join splitting on a deliberately skewed join.

The driver's synthetic testdata is NOT skewed (top-5% keys own ~9% of
orders — measured via DuckDB), so no bench query ever exercises the AQE
skew path the reference's data rule (top 5% orgs = 50% of orders,
pseudo_code_rules.txt:2-10) makes inevitable in production. This probe
builds the skew the reference describes — a configurable share of all
sf3 orders remapped to ONE hot customer — then times the
orders x customer join as a sort-merge join (broadcast disabled, the
100 TB regime where both sides are too big to broadcast) with
`spark.sql.adaptive.skewJoin.enabled` toggled per pass in one session
(same JVM/JIT state, so the toggle is the only variable).

Thresholds are lowered to scale the 100 TB mechanics to a ~350 MB local
shuffle: splitting triggers when a partition exceeds
max(skewedPartitionThresholdInBytes, median x skewedPartitionFactor),
and split chunks target advisoryPartitionSizeInBytes — the same knobs,
proportionally smaller.

Run (writes nothing to the repo; prints one JSON line per variant):
  python tools/skew_probe.py [hot_share=0.5]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF3 = ROOT / ".localdata" / "sf3"
SKEWED = Path("/tmp/skew_probe_orders.parquet")


def build_skewed_orders(hot_share: float) -> None:
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN hash(o_orderkey) % 1000 < {int(hot_share * 1000)}
                     THEN 1 ELSE o_custkey END AS o_custkey
            )
            FROM read_parquet('{SF3}/orders.parquet')
        ) TO '{SKEWED}' (FORMAT parquet, ROW_GROUP_SIZE 200000)
        """
    )


def main() -> None:
    hot_share = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    build_skewed_orders(hot_share)
    print(
        json.dumps({"hot_share": hot_share, "skewed_file": str(SKEWED)}),
        file=sys.stderr,
    )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # scale the 100 TB thresholds down to a ~350 MB local shuffle:
        # split partitions > 4 MB into ~2 MB chunks (the hot key's pruned
        # (custkey, totalprice) shuffle slice is ~10 MB compressed)
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # both sides "too big to broadcast" — the regime where skew hurts
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    # a DataFrame's AQE plan finalizes on its FIRST execution and is then
    # cached on its queryExecution — build a fresh frame per use so each
    # variant's plan (and the split_applied introspection) is its own
    def build():
        o = spark.read.parquet(str(SKEWED))
        c = spark.read.parquet(str(SF3 / "customer.parquet"))
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,2)")
                ).alias("rev"),
            )
        )

    def run() -> None:
        build().write.format("noop").mode("overwrite").save()

    # warm both code paths before timing either
    for flag in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        run()

    for skew_on in (False, True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(round(time.perf_counter() - t0, 3))
        probe = build()
        rows = {r["c_mktsegment"]: r["n_orders"] for r in probe.collect()}
        final = probe._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "skew_join": skew_on,
                    "min_sec": min(times),
                    "times": times,
                    "row_check": sum(rows.values()),
                    "split_applied": "skew=true" in final,
                }
            )
        )


if __name__ == "__main__":
    main()
