"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``saas_analytics_pipeline_spark``; this module
is a thin adapter over its query catalog (qcatalog.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from saas_analytics_pipeline_spark import qcatalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily revenue by customer
    nation — star join (orders -> customer -> nation) + exact-decimal
    aggregation. Driver checks rows > 0.

    Broadcast policy (same as operators/joins.py): only the constant-size
    nation dim (25 rows) carries a hard hint; customer is sf-scaled, so
    AQE decides its join side at runtime — a forced broadcast would blow
    the 8 GB limit at the 100 TB target."""
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.functions import money_sum
    from saas_analytics_pipeline_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            money_sum("o_totalprice", "gross_revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return qcatalog.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins; keys without an oracle (approx sketches,
    streaming-stateful) take the driver's rows-only check."""
    return qcatalog.oracles()
