"""Incremental ELT: partition-overwrite idempotency, upsert semantics, and
incremental-SCD2 == full-rebuild equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.operators.scd2 import build_scd2
from saas_analytics_pipeline_spark.plans.incremental import (
    merge_upsert,
    scd2_apply_increment,
    write_day_increment,
)
from saas_analytics_pipeline_spark.plans.publish import read_current
from saas_analytics_pipeline_spark.sources import load_table


def test_write_day_increment_is_idempotent_and_partition_scoped(
    spark, sf_dir, tmp_path
):
    path = str(tmp_path / "orders_inc")
    orders = load_table(spark, sf_dir, "orders")
    days = [
        r["d"]
        for r in orders.select(F.to_date("o_orderdate").alias("d"))
        .distinct()
        .orderBy("d")
        .limit(3)
        .collect()
    ]
    d1, d2, d3 = days

    def day_slice(d):
        return orders.where(F.to_date("o_orderdate") == F.lit(d))

    write_day_increment(spark, day_slice(d1), path, "o_orderdate")
    write_day_increment(spark, day_slice(d2), path, "o_orderdate")
    n_before = read_current(spark, path).count()

    # re-running day 2 must replace, not duplicate, and must not touch day 1
    write_day_increment(spark, day_slice(d2), path, "o_orderdate")
    got = read_current(spark, path)
    assert got.count() == n_before
    assert got.where(F.col("dt") == F.lit(d1)).count() == day_slice(d1).count()

    # a third day appends its own partition
    write_day_increment(spark, day_slice(d3), path, "o_orderdate")
    assert read_current(spark, path).count() == n_before + day_slice(d3).count()


def test_merge_upsert_replaces_and_appends(spark, tmp_path):
    path = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k int, v string, ver int"
    ).write.parquet(path)

    increment = spark.createDataFrame(
        # key 2: two versions in one batch (latest wins); key 4: brand new
        [(2, "b2", 20), (2, "b1", 15), (4, "d", 20)],
        "k int, v string, ver int",
    )
    merged = {
        (r["k"], r["v"], r["ver"])
        for r in merge_upsert(spark, path, increment, "k", "ver").collect()
    }
    assert merged == {(1, "a", 10), (2, "b2", 20), (3, "c", 10), (4, "d", 20)}


def test_merge_upsert_roundtrips_through_published_target(spark, tmp_path):
    """The docstring's documented loop — merge, write back via
    write_day_increment, merge again — must close: the target read
    resolves through the manifest when the path is a published table
    (plain read.parquet on a manifest root would fail; ADVICE r09)."""
    path = str(tmp_path / "pub_target")
    base = spark.createDataFrame(
        [(1, "a", 10, "2024-01-01"), (2, "b", 10, "2024-01-02")],
        "k int, v string, ver int, d string",
    )
    write_day_increment(spark, base, path, "d")

    inc1 = spark.createDataFrame(
        [(2, "b2", 20, "2024-01-02"), (3, "c", 20, "2024-01-03")],
        "k int, v string, ver int, d string",
    ).withColumn("dt", F.to_date("d"))
    merged1 = merge_upsert(spark, path, inc1, "k", "ver")
    write_day_increment(spark, merged1.drop("dt"), path, "d")

    inc2 = spark.createDataFrame(
        [(1, "a2", 30, "2024-01-01")], "k int, v string, ver int, d string"
    ).withColumn("dt", F.to_date("d"))
    merged2 = merge_upsert(spark, path, inc2, "k", "ver")
    got = {(r["k"], r["v"], r["ver"]) for r in merged2.collect()}
    assert got == {(1, "a2", 30), (2, "b2", 20), (3, "c", 20)}


def test_scd2_increment_equals_full_rebuild(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    cut = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    first, second = ev.where(F.col("ts") <= cut), ev.where(F.col("ts") > cut)
    assert second.count() > 0

    cols = [
        "user_id", "event_id", "event_type",
        "valid_from", "valid_to", "is_current", "version_n",
    ]
    dim0 = build_scd2(first, "user_id", "ts", "event_id").select(*cols)
    incremental = scd2_apply_increment(
        dim0, second, "user_id", "ts",
        attrs=["event_id", "event_type"], tiebreak="event_id",
    )
    full = build_scd2(ev, "user_id", "ts", "event_id").select(*cols)

    def as_set(df):
        return {tuple(r) for r in df.select(*cols).collect()}

    assert as_set(incremental) == as_set(full)


def test_compact_partitions_reduces_file_count(spark, sf_dir, tmp_path):
    from saas_analytics_pipeline_spark.plans.writers import compact_partitions
    from saas_analytics_pipeline_spark.sources import load_table
    import glob

    path = str(tmp_path / "frag")
    orders = load_table(spark, sf_dir, "orders")
    # fragment: 64 tiny files
    orders.repartition(64).write.parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 32

    n_rows = spark.read.parquet(path).count()
    compact_partitions(spark, path, target_mb=128, partition_col=None)
    after = len(glob.glob(path + "/*.parquet"))
    assert after < before / 4
    assert spark.read.parquet(path).count() == n_rows
