"""Measured A/B of data LAYOUT: clustered (sorted) vs unclustered parquet
under a selective predicate.

OSS Spark prunes plain parquet at two levels: directory partitions
(PartitionFilters, pinned in tests/test_plans.py) and ROW GROUPS — the
parquet reader skips any row group whose column min/max stats exclude the
pushed predicate. Row-group skipping has no plan-level metric, so the
only honest evidence is a timing A/B on identical bytes:

  unclustered  documents written in shuffled order — every row group
               spans nearly the full doc_id range, min/max excludes
               nothing, every text page decodes
  clustered    the same rows repartitionByRange + sortWithinPartitions on
               doc_id — each row group covers a narrow key range, a tight
               range predicate decodes only the overlapping groups (and
               their text pages — the column that actually costs)

Two measurements, primary first:

  row groups   read DIRECTLY from the parquet footers (pyarrow): how many
               row groups' doc_id min/max overlap the predicate — the
               exact set the pushed filter lets the reader decode. This
               is deterministic and is the skip itself.
  wall clock   the same aggregate timed on both layouts — at sf3 the
               per-job scheduling floor (~0.15 s on local[32]) hides most
               of the decode gap, so the ratio UNDERSTATES the skip;
               recorded anyway for honesty.

This is the Z-order-lite story at 100 TB: sort the lake by its hottest
filter key at write time and selective scans stop paying for the other
99% of the data.

A second section measures TRUE multi-dimension clustering on vanilla
parquet (operators/lake.py write_zordered): orders rewritten sorted by a
morton interleave of bucketed (o_custkey, o_orderdate) vs the same rows
sorted by custkey alone. Footer counts for a single-dimension predicate
on EACH dimension show the Z-curve's trade: the custkey-sorted copy
prunes perfectly on custkey and not at all on date; the Z-ordered copy
prunes substantially on BOTH.

Run:  python tools/layout_probe.py
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
BASE = Path("/tmp/layout_probe")

# ~1% of the doc_id domain: selective enough that clustering matters,
# wide enough that the answer is non-trivial
KEY_LO, KEY_HI = 60_000, 61_500


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    shutil.rmtree(BASE, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("layout-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    docs = spark.read.parquet(str(SF3 / "documents.parquet"))
    n_rows = docs.count()
    # unclustered: round-robin shuffled order (every row group spans the
    # whole key domain), 16 files
    docs.repartition(16).write.mode("overwrite").parquet(
        str(BASE / "unclustered")
    )
    # clustered: range-partitioned + sorted by the hot filter key
    (
        docs.repartitionByRange(16, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(str(BASE / "clustered"))
    )

    def scan(path: str) -> tuple[float, int]:
        df = (
            spark.read.parquet(path)
            .where(F.col("doc_id").between(KEY_LO, KEY_HI))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("text")).alias("s"),
            )
        )
        t0 = time.perf_counter()
        row = df.first()
        return round(time.perf_counter() - t0, 3), int(row.n)

    def best(path: str) -> tuple[float, list[float], int]:
        times, rows = [], 0
        for _ in range(3):
            sec, rows = scan(path)
            times.append(sec)
        return min(times), times, rows

    def rowgroup_overlap(path: Path) -> dict:
        """From the parquet footers: row groups whose doc_id min/max
        overlaps the predicate (== the groups the pushed filter decodes)
        and their byte share of the table."""
        import pyarrow.parquet as pq

        total = hit = 0
        total_bytes = hit_bytes = 0
        for f in sorted(path.glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }["doc_id"]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = rg.column(idx).statistics
                total += 1
                total_bytes += rg.total_byte_size
                if st.min <= KEY_HI and st.max >= KEY_LO:
                    hit += 1
                    hit_bytes += rg.total_byte_size
        return {
            "row_groups": total,
            "row_groups_decoded": hit,
            "bytes_share_decoded": round(hit_bytes / total_bytes, 4),
        }

    # warm the page cache on both layouts before timing
    scan(str(BASE / "unclustered"))
    scan(str(BASE / "clustered"))
    un_min, un_times, un_rows = best(str(BASE / "unclustered"))
    cl_min, cl_times, cl_rows = best(str(BASE / "clustered"))
    un_rg = rowgroup_overlap(BASE / "unclustered")
    cl_rg = rowgroup_overlap(BASE / "clustered")

    # ---- multi-dimension (Z-order) section: orders, 2 predicates ----
    import datetime

    import pyarrow.parquet as pq

    from saas_analytics_pipeline_spark.operators.lake import (
        ZORDER_DATE_BOUND,
        morton_expr,
    )

    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    orders = spark.read.parquet(str(SF3 / "orders.parquet"))
    stats = orders.agg(
        F.max("o_custkey").alias("_mc"),
        F.min("o_orderdate").alias("_d0"),
        F.max("o_orderdate").alias("_d1"),
    )
    coded = (
        orders.join(F.broadcast(stats))
        .withColumn("_bx", F.expr("(o_custkey * 16) div (_mc + 1)"))
        .withColumn(
            "_by",
            F.expr(
                "(datediff(o_orderdate, _d0) * 16)"
                " div (datediff(_d1, _d0) + 1)"
            ),
        )
        .withColumn("_z", morton_expr("_bx", "_by"))
    )
    (
        coded.repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_mc", "_d0", "_d1", "_bx", "_by", "_z")
        .write.mode("overwrite")
        .parquet(str(BASE / "zorder"))
    )
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(str(BASE / "cksort"))
    )

    def footer_touch(path: Path) -> dict:
        """Row groups a custkey-band predicate and (separately) a
        date-band predicate would decode, from the footers alone."""
        ck_ranges, dt_ranges = [], []
        for f in sorted(path.glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            if md.num_row_groups == 0:
                continue
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                ck = rg.column(idx["o_custkey"]).statistics
                dt = rg.column(idx["o_orderdate"]).statistics
                if ck is None or dt is None:
                    continue
                ck_ranges.append((ck.min, ck.max))
                dt_ranges.append((dt.min, dt.max))
        bound = max(hi for _, hi in ck_ranges) // 4
        dbound = datetime.datetime.fromisoformat(ZORDER_DATE_BOUND)

        def naive(v):
            return v.replace(tzinfo=None) if hasattr(v, "replace") else v

        return {
            "row_groups": len(ck_ranges),
            "custkey_band_decoded": sum(
                1 for lo, _ in ck_ranges if lo <= bound
            ),
            "date_band_decoded": sum(
                1 for lo, _ in dt_ranges if naive(lo) < dbound
            ),
        }

    z_touch = footer_touch(BASE / "zorder")
    c_touch = footer_touch(BASE / "cksort")

    print(
        json.dumps(
            {
                "table_rows": n_rows,
                "predicate": f"doc_id BETWEEN {KEY_LO} AND {KEY_HI}",
                "result_rows": cl_rows,
                "rows_equal": un_rows == cl_rows,
                "unclustered": {
                    "min_sec": un_min,
                    "times": un_times,
                    **un_rg,
                },
                "clustered": {"min_sec": cl_min, "times": cl_times, **cl_rg},
                "rowgroup_skip_ratio": (
                    round(
                        un_rg["row_groups_decoded"]
                        / cl_rg["row_groups_decoded"],
                        2,
                    )
                    if cl_rg["row_groups_decoded"]
                    else None
                ),
                "wall_speedup": round(un_min / cl_min, 2) if cl_min else None,
                "zorder": {
                    "predicates": (
                        "custkey <= max div 4 | orderdate < "
                        + ZORDER_DATE_BOUND
                    ),
                    "zordered": z_touch,
                    "custkey_sorted": c_touch,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
