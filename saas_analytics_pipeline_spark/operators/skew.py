"""Skew-resilient join helpers: salting when AQE can't apply.

The reference deliberately generates heavy key skew (top 5% orgs own 50% of
orders, `/root/reference/data_gen/pseudo_code_rules.txt:2-10`). First-line
defense is AQE skew-join splitting (on in session.py). Salting is the
fallback for cases AQE doesn't cover (e.g. skewed aggregation keys, bucketed
sort-merge joins, or pre-3.0 clusters):

- salted_join: explode the SMALL side by the salt domain, salt the big side
  randomly-but-deterministically (hash of a stable column, not rand(), so
  retries/speculative tasks agree) — classic salt-and-replicate.
- two_phase_agg: partial agg on (key, salt) then final agg on key — caps the
  per-task combine width for hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, stable_col: str, buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a stable column —
    reproducible across task retries (rand() is not)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(stable_col)), F.lit(buckets)).cast("int")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    stable_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side to a small side by replicating the small
    side across `buckets` salts. Output schema = join of the originals."""
    salted_big = with_salt(big, stable_col or key, buckets)
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_cols: dict[str, Column],
    merge_cols: dict[str, Column],
    buckets: int = 16,
    stable_col: str | None = None,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key, salt) partials, then
    groupBy(key) merge. agg_cols build partials; merge_cols re-aggregate
    them (e.g. {'n': count(*)} then {'n': sum('n')})."""
    partial = (
        with_salt(df, stable_col or key, buckets)
        .groupBy(key, "_salt")
        .agg(*[c.alias(a) for a, c in agg_cols.items()])
    )
    return partial.groupBy(key).agg(
        *[c.alias(a) for a, c in merge_cols.items()]
    )
