"""Schema evolution on read: added columns merge (NULL-backfilled on old
files), true type conflicts are rejected loudly — never silently coerced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.operators.lake import write_generations


def test_merge_schema_backfills_added_column_with_nulls(spark, sf_dir):
    """Old-generation rows surface the added column as NULL; new-generation
    rows all carry it; no rows are lost by the merged read."""
    import os

    base = write_generations(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen_a"), os.path.join(base, "gen_b")
    )
    assert "o_channel" in merged.columns
    row = merged.agg(
        F.count("*").alias("n"),
        F.count("o_channel").alias("n_ch"),
        F.sum((F.col("o_orderkey") % 2 == 1).cast("int")).alias("n_odd"),
    ).first()
    from saas_analytics_pipeline_spark.sources import load_table

    assert row.n == load_table(spark, sf_dir, "orders").count()
    assert row.n_ch == row.n_odd  # every odd-key (gen B) row, no others


def test_merge_schema_rejects_true_type_conflict(spark, sf_dir, tmp_path):
    """The same column written as DOUBLE in one generation and STRING in
    another must fail the merged read (Spark refuses to reconcile), not
    coerce silently."""
    from saas_analytics_pipeline_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").limit(100)
    orders.select("o_orderkey", "o_totalprice").write.parquet(
        str(tmp_path / "gen_x")
    )
    orders.select(
        "o_orderkey", F.col("o_totalprice").cast("string").alias("o_totalprice")
    ).write.parquet(str(tmp_path / "gen_y"))
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        spark.read.option("mergeSchema", "true").parquet(
            str(tmp_path / "gen_x"), str(tmp_path / "gen_y")
        ).collect()
