"""Physical-layout writers: partitioned / bucketed marts.

The reference's whole performance stance is layout hygiene — "partitioning,
clustering, and cost-awareness" (`/root/reference/README.md:12,90-91`), raw
data partitioned "by source and date" (`README.md:24`). Spark equivalents:

- date-partitioned fact writes (partition pruning for time-range queries),
- bucketed writes on hot join keys (co-located sort-merge joins with NO
  shuffle at read time — the fix for repeated fact-fact joins at 100 TB),
- target file sizing via repartition before write (avoid small-file storms:
  1000 executors x 32 partitions x daily runs melt a namenode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, date_col: str, target_files_per_day: int = 1
) -> None:
    """Fact-table write partitioned by day. Repartition by the partition
    column first so each day lands in few, large files."""
    out = df.withColumn("dt", F.to_date(date_col))
    out = out.repartition(target_files_per_day * 200, "dt") if target_files_per_day > 1 else out.repartition("dt")
    out.write.mode("overwrite").partitionBy("dt").parquet(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32
) -> None:
    """Bucketed managed table on a join key: subsequent equi-joins between
    tables bucketed on the same key skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
