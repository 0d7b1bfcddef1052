"""Measured A/B: incremental SCD2 apply vs full history rebuild.

`plans/incremental.py::scd2_apply_increment` claims O(daily churn), not
O(history): unchanged keys' history never shuffles (anti-join against a
broadcast key set), and the window/version work runs only over (open
rows of changed keys) + (the change batch). This probe measures that
claim on a production-shaped dimension built from sf3:

  history:  `versions` change rows per customer key (parquet)
  batch:    churn_pct of keys get one new change row

and times, in one session:

  rebuild      build_scd2(full change log + batch)   — O(history) window
  incremental  scd2_apply_increment(dim, batch)      — O(churn)

Both paths produce a full corrected dimension frame; the probe also
cross-checks them (same row count, same per-key max version) so the
speedup is between EQUIVALENT results, not a cheaper wrong answer.

Run:  python tools/scd2_probe.py [churn_pct=0.01] [versions=3]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF3 = ROOT / ".localdata" / "sf3"
HIST = Path("/tmp/scd2_probe_hist.parquet")
DIM = Path("/tmp/scd2_probe_dim.parquet")


def main() -> None:
    churn = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    versions = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scd2-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from saas_analytics_pipeline_spark.operators.scd2 import build_scd2
    from saas_analytics_pipeline_spark.plans.incremental import (
        scd2_apply_increment,
    )

    # synthesize a `versions`-per-key change log from sf3 customer
    cust = spark.read.parquet(str(SF3 / "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    )
    changes = (
        cust.crossJoin(spark.range(versions).withColumnRenamed("id", "v"))
        .select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_v"), F.col("v")).alias(
                "segment"
            ),
            F.to_timestamp(
                F.lit("2024-01-01")
            ).alias("_base"),
            "v",
        )
        .select(
            "c_custkey",
            "segment",
            (F.unix_timestamp("_base") + F.col("v") * 86400)
            .cast("timestamp")
            .alias("ts"),
        )
    )
    changes.write.mode("overwrite").parquet(str(HIST))
    hist = spark.read.parquet(str(HIST))
    dim = build_scd2(hist.withColumn("_tb", F.lit(0)), "c_custkey", "ts", "_tb").drop(
        "_tb", "ts"
    )
    dim.write.mode("overwrite").parquet(str(DIM))
    dim = spark.read.parquet(str(DIM))
    n_keys = hist.select("c_custkey").distinct().count()

    batch = (
        hist.where(
            F.abs(F.hash("c_custkey")) % 10_000 < int(churn * 10_000)
        )
        .groupBy("c_custkey")
        .agg(F.max("ts").alias("_mx"))
        .select(
            "c_custkey",
            F.lit("CHURNED").alias("segment"),
            (F.unix_timestamp("_mx") + 86400).cast("timestamp").alias("ts"),
        )
    )
    batch.write.mode("overwrite").parquet("/tmp/scd2_probe_batch.parquet")
    batch = spark.read.parquet("/tmp/scd2_probe_batch.parquet")

    def rebuild():
        log = hist.select("c_custkey", "segment", "ts").unionByName(batch)
        return build_scd2(
            log.withColumn("_tb", F.lit(0)), "c_custkey", "ts", "_tb"
        ).drop("_tb", "ts")

    def incremental():
        return scd2_apply_increment(
            dim, batch, "c_custkey", "ts", ["segment"]
        )

    def timed(mk) -> dict:
        def run():
            mk().write.format("noop").mode("overwrite").save()

        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(round(time.perf_counter() - t0, 3))
        return {"min_sec": min(times), "times": times}

    r, i = timed(rebuild), timed(incremental)

    # equivalence: same total rows and same per-key version frontier
    def frontier(df):
        return df.groupBy("c_custkey").agg(
            F.max("version_n").alias("vmax")
        )

    rb, inc = rebuild(), incremental()
    # full-outer compare: a key missing entirely from one side is a
    # mismatch too (an inner join would silently exclude it)
    mismatch = (
        frontier(rb)
        .join(
            frontier(inc).withColumnRenamed("vmax", "vmax_inc"),
            "c_custkey",
            "full_outer",
        )
        .where(
            "vmax IS NULL OR vmax_inc IS NULL OR vmax != vmax_inc"
        )
        .count()
    )
    rows_equal = rb.count() == inc.count()
    print(
        json.dumps(
            {
                "n_keys": n_keys, "versions": versions,
                "churn_pct": churn,
                "rebuild": r,
                "incremental": i,
                "speedup": round(r["min_sec"] / i["min_sec"], 2),
                "rows_equal": rows_equal,
                "frontier_mismatches": mismatch,
            }
        )
    )
    if not rows_equal or mismatch:
        sys.exit("incremental/rebuild results diverged — see counts above")


if __name__ == "__main__":
    main()
