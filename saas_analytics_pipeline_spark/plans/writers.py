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
    df: DataFrame, table: str, key: str, buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed table on a join key: subsequent equi-joins between
    tables bucketed on the same key skip the shuffle entirely. With
    ``path`` the table is EXTERNAL at that location (bucketing metadata
    still lives in the catalog — needed when the session's warehouse
    dir is cwd-dependent, e.g. a driver run from an arbitrary
    directory); without it, a managed table in the warehouse."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def compact_partitions(
    spark, path: str, target_mb: int = 128, partition_col: str | None = "dt"
) -> int:
    """Small-file compaction: rewrite a parquet dataset into ~target_mb
    files (per partition when partitioned). Streaming/incremental appends
    melt namenodes with small files at 100 TB; periodic compaction is the
    ops counterpart of the incremental writers above. Returns the file
    count target used.

    Sizing comes from the dataset's own on-disk bytes (driver-side listing
    of file metadata only — no data read)."""
    import os

    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        total_bytes += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "_compacted"
    if partition_col and partition_col in df.columns:
        (
            df.repartition(n_files, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (a transactional table format does this natively)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
