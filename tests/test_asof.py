"""Generic as-of join cross-validated against pandas merge_asof — the
authoritative public reference implementation of the semantics."""

from __future__ import annotations

import pandas as pd

from saas_analytics_pipeline_spark.operators.asof import asof_join

LEFT = [
    # (key, ts, l_val)
    (1, "2024-01-01 10:00:00", "a"),
    (1, "2024-01-01 11:30:00", "b"),
    (1, "2024-01-01 12:00:00", "c"),
    (2, "2024-01-01 10:15:00", "d"),
    (3, "2024-01-01 09:00:00", "e"),  # key with no right rows at all
]
RIGHT = [
    # (key, ts, price)
    (1, "2024-01-01 09:50:00", 10.0),
    (1, "2024-01-01 11:30:00", 20.0),  # equal-ts match (inclusive)
    (1, "2024-01-01 13:00:00", 30.0),
    (2, "2024-01-01 10:00:00", 40.0),
]


def _spark_frames(spark):
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        LEFT, "key int, ts_s string, l_val string"
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "l_val")
    r = spark.createDataFrame(
        RIGHT, "key int, ts_s string, price double"
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "price")
    return l, r


def _pandas_expected(direction, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["key", "ts", "l_val"])
    rp = pd.DataFrame(RIGHT, columns=["key", "ts", "price"])
    for df in (lp, rp):
        df["ts"] = pd.to_datetime(df["ts"])
    merged = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="key",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    return {
        (row.key, row.ts): None if pd.isna(row.price) else row.price
        for row in merged.itertuples()
    }


def _spark_result(spark, direction, tolerance=None):
    l, r = _spark_frames(spark)
    out = asof_join(
        l, r, ts="ts", by="key", right_payload=["price"],
        direction=direction, tolerance_seconds=tolerance,
    )
    return {(row["key"], row["ts"]): row["asof_price"] for row in out.collect()}


def test_asof_backward_matches_pandas(spark):
    assert _spark_result(spark, "backward") == _pandas_expected("backward")


def test_asof_forward_matches_pandas(spark):
    assert _spark_result(spark, "forward") == _pandas_expected("forward")


def test_asof_backward_tolerance_matches_pandas(spark):
    got = _spark_result(spark, "backward", tolerance=1800)
    want = _pandas_expected("backward", tolerance=1800)
    assert got == want
    assert None in got.values()  # tolerance actually nulled something
