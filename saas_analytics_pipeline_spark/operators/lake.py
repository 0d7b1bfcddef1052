"""Lake-mechanics operators: schema evolution on read.

A long-lived corpus lake accumulates parquet written by different pipeline
versions — later generations add columns (a new quality score, a channel
tag) that earlier files don't carry. The reference's contract is a FIXED
schema per source (`/root/reference/models/schema.yml:1-141`); this module
covers the lake reality one step past that contract: reading mixed
generations through Spark's parquet schema merging so old files surface
the new column as NULL, while a TRUE type conflict (the same column
written with incompatible types) is rejected loudly instead of being
silently coerced (pinned by tests/test_lake.py).

Scale notes (100 TB):
- mergeSchema reads each file's FOOTER, not its data — the union schema is
  computed from metadata only, so evolution costs nothing at scan time.
  On lakes with millions of files, footer listing itself is the cost:
  production pins the merged schema in a table catalog (Delta/Iceberg
  semantics) or passes an explicit .schema(...) — the read path below is
  identical either way.
- The per-generation rollup is a partial-aggregable groupBy on a
  scan-derived key; money sums use exact DECIMAL combine.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

# o_channel backfill tag for generation-B rows (deterministic from the key
# so the DuckDB oracle replays it without reading the written files)
_CHANNELS = ("web", "app", "api")


def channel_expr() -> F.Column:
    """The added column of generation B: a sales channel derived from the
    order key (stand-in for a column a newer pipeline version emits)."""
    return (
        F.when(F.col("o_orderkey") % 3 == 0, _CHANNELS[0])
        .when(F.col("o_orderkey") % 3 == 1, _CHANNELS[1])
        .otherwise(_CHANNELS[2])
    )


CHANNEL_SQL = """
    CASE o_orderkey % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'app' ELSE 'api' END
"""


def write_generations(spark: SparkSession, sf_dir: str) -> str:
    """Write the two parquet generations the evolution read merges:
    gen A (even order keys) lacks `o_channel`; gen B (odd keys) carries
    it. Deterministic overwrite under the system temp dir — the test lake
    stores no derived state, so the generations are (re)materialized per
    call, like q_dedup_lsh_incremental's corpus bands."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"saas_lake_evo_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    orders = load_table(spark, sf_dir, "orders")
    gen_a = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    gen_b = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        channel_expr().alias("o_channel"),
    )
    gen_a.write.mode("overwrite").parquet(os.path.join(base, "gen_a"))
    gen_b.write.mode("overwrite").parquet(os.path.join(base, "gen_b"))
    return base


@query(
    "q_schema_evolution",
    oracle=f"""
    WITH merged AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 2 = 1 THEN {CHANNEL_SQL} END
                   AS o_channel
        FROM orders
    )
    SELECT o_orderkey % 2 AS gen,
           COUNT(*) AS n_rows,
           CAST(COUNT(o_channel) AS BIGINT) AS n_with_channel,
           COUNT(DISTINCT o_channel) AS n_channels,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM merged GROUP BY gen ORDER BY gen
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations — the older one
    WITHOUT `o_channel`, the newer one with it — are read through
    `mergeSchema`, and the unified projection is proven by aggregating the
    merged frame per generation: old rows surface o_channel as NULL
    (n_with_channel = 0), new rows carry all three channel values, and the
    money total matches the source exactly (the merge dropped no rows).
    The DuckDB oracle replays the generation split from the source table,
    so a merge that mangled rows or values breaks the hash. The rejected
    case — a true type conflict across generations — is pinned as a caught
    error in tests/test_lake.py.

    Scale: see module docstring — merging costs footer reads only; the
    rollup is 2 groups of partial aggregates."""
    base = write_generations(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen_a"), os.path.join(base, "gen_b")
    )
    return (
        merged.groupBy((F.col("o_orderkey") % 2).alias("gen"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_channel").cast("long").alias("n_with_channel"),
            F.countDistinct("o_channel").alias("n_channels"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("gen")
    )
