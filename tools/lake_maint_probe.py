"""Measured claim of the r11 streaming lake-maintenance loop
(streaming/jobs.run_lake_maintenance + plans/publish.maintain_table):
maintenance cost follows the INCREMENT'S accumulated small-file debt,
never the table.

Setup: a month-partitioned orders table with a packed multi-year BASE
(one file per month). Two maintenance rounds, each preceded by a
fragmented increment publish (maxRecordsPerFile caps the writer, the
streaming-ingest debt shape):

  small   1 month  of 1996 fragmented, then maintain_table
  large   6 months of 1996 fragmented, then maintain_table

Recorded per round: the increment's fragmented file count, the
maintenance wall time, and how many partitions OPTIMIZE actually
rewrote. The claim is rewritten == the increment's months only (the
packed base never rewrites) and wall time tracking the debt, not the
table. Gate (exit nonzero): row counts + money sums through
read_current equal the expected slice after every maintenance — a
maintenance that loses rows measures nothing.

Run:  python tools/lake_maint_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FRAG_CAP = 200  # maxRecordsPerFile for the fragmented increment writes
BASE_YEARS = (1992, 1995)
INC_ROUNDS = [("small", 1), ("large", 6)]  # months of 1996 per round


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.session import get_spark
    from saas_analytics_pipeline_spark.sources import load_table

    spark = get_spark("lake-maint-probe")
    base_dir = tempfile.mkdtemp(prefix="lake_maint_probe_")
    root = str(Path(base_dir) / "tbl")
    failures: list[str] = []
    out: dict = {"probe": "lake_maint", "sf_dir": sf_dir}

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    monthly = orders.withColumn(
        "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    )
    base = monthly.where(F.year("o_orderdate").between(*BASE_YEARS))
    P.publish_partition_overwrite(
        spark, base.repartition(F.col("mk")), root, "mk"
    )
    P.publish_stats(spark, root, ["o_orderdate"])
    m0 = P.current_manifest(root)
    out["base"] = {
        "n_partitions": len(m0["partitions"]),
        "n_files": m0["n_files"],
    }

    def expected(upto_month: int):
        sel = base
        if upto_month:
            sel = monthly.where(
                F.year("o_orderdate").between(*BASE_YEARS)
                | F.col("mk").between(199601, 199600 + upto_month)
            )
        row = sel.agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        ).first()
        return row["n"], str(row["s"])

    months_done = 0
    rounds = []
    for label, n_months in INC_ROUNDS:
        lo = 199601 + months_done
        hi = 199600 + months_done + n_months
        inc = monthly.where(F.col("mk").between(lo, hi))
        spark.conf.set("spark.sql.files.maxRecordsPerFile", str(FRAG_CAP))
        try:
            P.publish_partition_overwrite(
                spark, inc.repartition(F.col("mk")), root, "mk"
            )
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        months_done += n_months
        before = P.current_manifest(root)["partitions"]
        frag_files = sum(
            len(fs) for v, fs in before.items() if lo <= int(v) <= hi
        )
        t0 = time.perf_counter()
        P.maintain_table(
            spark, root, retain=1, stats_cols=["o_orderdate"]
        )
        dt = round(time.perf_counter() - t0, 3)
        after = P.current_manifest(root)["partitions"]
        rewritten = sum(
            1 for v in after if after[v] != before.get(v)
        )
        n, s = expected(months_done)
        got = P.read_current(spark, root).agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        ).first()
        if (got["n"], str(got["s"])) != (n, s):
            failures.append(
                f"{label}: content drift after maintenance "
                f"({got['n']},{got['s']}) != ({n},{s})"
            )
        rounds.append(
            {
                "round": label,
                "increment_months": n_months,
                "increment_frag_files": frag_files,
                "maintenance_sec": dt,
                "partitions_rewritten": rewritten,
                "n_files_after": P.current_manifest(root)["n_files"],
            }
        )
        if rewritten > n_months:
            failures.append(
                f"{label}: rewrote {rewritten} partitions > the "
                f"increment's {n_months} months — maintenance touched "
                "the packed base"
            )
    out["rounds"] = rounds
    shutil.rmtree(base_dir, ignore_errors=True)
    out["failures"] = failures
    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
