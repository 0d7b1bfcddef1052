"""Skew-resilient join helpers: salting when AQE can't apply.

The reference deliberately generates heavy key skew (top 5% orgs own 50% of
orders, `/root/reference/data_gen/pseudo_code_rules.txt:2-10`). First-line
defense is AQE skew-join splitting (on in session.py). Salting is the
fallback for cases AQE doesn't cover (e.g. skewed aggregation keys, bucketed
sort-merge joins, or pre-3.0 clusters):

- salted_join: explode the SMALL side by the salt domain, salt the big side
  randomly-but-deterministically (hash of row content, not rand(), so
  retries/speculative tasks agree) — classic salt-and-replicate.
- two_phase_agg: partial agg on (key, salt) then final agg on key — caps the
  per-task combine width for hot keys.

The salt must be (approximately) row-unique, NOT a function of the join/group
key: hashing the key alone puts every row of a hot key in the same salt
bucket, which replicates the small side for zero mitigation. Default is
xxhash64 over ALL columns; pass ``stable_cols`` to pin specific row-level
columns (e.g. a surrogate row id) when rows can be full duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, stable_cols: list[str], buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of row-level columns —
    reproducible across task retries (rand() is not). ``stable_cols`` should
    distinguish rows WITHIN a key; full duplicates share a salt (acceptable:
    exact-dup rows of a hot key are rare, and correctness never depends on
    the spread)."""
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in stable_cols]), F.lit(buckets)).cast(
            "int"
        ),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    stable_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side to a small side by replicating the small
    side across `buckets` salts. Output schema = join of the originals.

    The big side's salt hashes all its columns by default (row-unique in
    practice), so a hot key's rows spread across all `buckets` partitions."""
    salted_big = with_salt(big, stable_cols or big.columns, buckets)
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
    stable_cols: list[str] | None = None,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key, salt) partials, then
    groupBy(key) merge. agg_cols build partials; merge_cols re-aggregate
    them (e.g. {'n': count(*)} then {'n': sum('n')}). Salt spreads a hot
    key's rows across `buckets` partial groups (row-content hash, see
    with_salt)."""
    partial = (
        with_salt(df, stable_cols or df.columns, buckets)
        .groupBy(key, "_salt")
        .agg(*[c.alias(a) for a, c in agg_cols.items()])
    )
    return partial.groupBy(key).agg(
        *[c.alias(a) for a, c in merge_cols.items()]
    )
