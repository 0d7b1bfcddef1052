"""Generic as-of join: match each left row to the nearest right row at or
before (backward) / at or after (forward) its timestamp, per key group —
the pandas ``merge_asof`` contract, Spark-native.

Implementation is the union + last_value(ignoreNulls) window trick (ref
shape: payment matched within 24h of order,
`/root/reference/data_gen/generate_and_load_script.py:142`): ONE shuffle on
the group key, no range cross-join, no per-key loop — the only as-of form
that survives 100 TB. A range-condition equi-join would re-scan right rows
per left row; the union-window form is linear in |left|+|right| after one
sort.

Tolerance post-filters the match gap, mirroring merge_asof(tolerance=...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join `left` to `right` on time column `ts` within groups `by`.

    Both frames carry `by` and `ts`; `right_payload` names the right
    columns to attach (returned with an `asof_` prefix, plus
    `asof_gap_seconds`). Matches are inclusive of equal timestamps."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    r_types = dict((f.name, f.dataType) for f in right.schema.fields)
    l_side = left.select(
        *left.columns,
        F.lit(1).alias("_kind"),
        *[
            F.lit(None).cast(r_types[p]).alias(f"_r_{p}")
            for p in right_payload
        ],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    l_types = dict((f.name, f.dataType) for f in left.schema.fields)
    left_only = [c for c in left.columns if c not in (by, ts)]
    r_side = right.select(
        F.col(by),
        F.col(ts),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_only],
        F.lit(0).alias("_kind"),
        *[F.col(p).alias(f"_r_{p}") for p in right_payload],
        F.col(ts).cast("timestamp").alias("_r_ts"),
    )
    unioned = l_side.unionByName(r_side)

    order = (
        [F.col(ts).asc(), F.col("_kind").asc()]
        if direction == "backward"
        else [F.col(ts).desc(), F.col("_kind").asc()]
    )
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{p}", ignorenulls=True).over(w).alias(f"asof_{p}")
            for p in right_payload
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    gap = (
        F.unix_timestamp(ts) - F.unix_timestamp("asof_ts")
        if direction == "backward"
        else F.unix_timestamp("asof_ts") - F.unix_timestamp(ts)
    )
    out = (
        filled.where(F.col("_kind") == 1)
        .withColumn("asof_gap_seconds", gap)
        .drop("_kind", "_r_ts", *[f"_r_{p}" for p in right_payload])
    )
    if tolerance_seconds is not None:
        # out-of-tolerance matches null out (merge_asof semantics), row kept
        beyond = F.col("asof_gap_seconds") > tolerance_seconds
        for p in right_payload:
            out = out.withColumn(
                f"asof_{p}", F.when(~beyond, F.col(f"asof_{p}"))
            )
        out = out.withColumn(
            "asof_ts", F.when(~beyond, F.col("asof_ts"))
        ).withColumn(
            "asof_gap_seconds", F.when(~beyond, F.col("asof_gap_seconds"))
        )
    return out
