"""Query catalog: the driver-facing registry of (Spark query, SQL oracle).

Every operator from SURVEY.md section 2 that has a Key registers here via
the :func:`query` decorator; ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this catalog. Keeping both halves in
one place makes the column-name contract (Spark aliases == oracle aliases)
reviewable side by side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB ANSI SQL twin; None => rows-only check
    doc: str = ""


QUERIES: dict[str, CatalogEntry] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a (spark, sf_dir) -> DataFrame callable plus its oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = CatalogEntry(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# --------------------------------------------------------------------------
# Driver-window ordering
#
# The driver verifies the FIRST 50 entries of queries() per round
# (CORRECTNESS_r01.json == the first 50 registered keys). To accumulate
# driver-verified coverage across rounds we (a) track which keys already
# have a green CORRECTNESS row, (b) put not-yet-verified keys first, with
# an explicit priority list covering the SURVEY section-2 core.
# --------------------------------------------------------------------------

# Keys with a green row in CORRECTNESS_r01.json (hash_match=true), plus the
# two no-oracle sketches whose rows-only check ran. Later rounds are folded
# in automatically by scanning CORRECTNESS_r*.json (see _scan_correctness),
# so the 50-entry window rotates to fresh keys each round without edits.
DRIVER_VERIFIED: dict[str, str] = dict.fromkeys(
    [
        "q_revenue_daily", "q_running_rev", "q_rollup", "q_seasonality",
        "q_distinct_count", "q_approx_distinct", "q_topn_orgs", "q_union_all",
        "q_late_rate", "q_order_limit", "q_except", "q_cube", "q_pivot",
        "q_percentiles", "q_approx_percentiles", "q_ntile", "q_trailing_7d",
        "q_gap_fill", "q_percent_rank", "q_grouping_sets", "q_intersect",
        "q_retention", "q_rfm", "q_funnel_windowed", "q_scalar_subquery",
        "q_month_over_month", "q_new_vs_returning", "q_purchase_gaps",
        "q_active_users", "q_histogram", "q_outliers", "q_decay_score",
        "q_pareto", "q_basket_pairs", "q_heatmap", "q_anomaly_days",
        "q_forecast_naive", "q_abandonment", "q_filter_eq", "q_filter_notnull",
        "q_stg_cast", "q_soft_delete", "q_reject_rows", "q_dedup_latest",
        "q_json_malformed", "q_null_rate",
    ],
    "r01",
)

# Round-2 window: the SURVEY section-2 core (joins, SCD2, sessionize, dedup,
# similarity, text, staging, quality, streaming) plus every oracle whose
# dtype fix needs a fresh driver row. Exactly 50 keys.
WINDOW_PRIORITY: list[str] = [
    # joins (section 2.3)
    "q_join_fk_users_orgs", "q_join_star_orders", "q_join_payments_orders",
    "q_anti_orphans", "q_semi_paid_orders", "q_fx_join", "q_asof_payment",
    "q_skew_join", "q_range_join", "q_null_safe_join",
    # SCD2 / attribution / sessionize (section 2.5)
    "q_scd2_build", "q_scd2_overlap", "q_attribution",
    "q_sessionize", "q_bounce_rate",
    # dedup family (section 2.11)
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash",
    "q_crossmodal_dedup", "q_dedup_cross_source", "q_sketch_error",
    # similarity family (section 2.11)
    "q_similarity", "q_similarity_ann", "q_dedup_embed",
    "q_embedding_centroids",
    # text family core (section 2.11)
    "q_text_stats", "q_lang_id", "q_quality_score", "q_token_count",
    "q_fingerprint",
    # staging section-2 tail
    "q_multiformat_date", "q_money_round", "q_negative_guard", "q_pii_scan",
    "q_date_trunc", "q_ts_diff",
    # data-quality checks (section 2.7)
    "q_uniqueness", "q_payment_recon", "q_audit_recon", "q_freshness",
    # streaming (section 2.9)
    "q_stream_tumbling", "q_stream_session",
    # r01 hash-fails, oracles now CAST-fixed — need fresh green rows
    "q_funnel", "q_skew_check", "q_json_extract", "q_attribution_linear",
    # latent HUGEINT oracles, now CAST-fixed
    "q_variant", "q_udtf_sentences", "q_array_hof",
]


# Keys whose check was UPGRADED after their last driver row (e.g. a
# rows-only query that gained a real SQL oracle), mapped to the LAST round
# whose result predates the upgrade: green rows from rounds <= that value
# don't count, so the window re-runs the key once and the first
# post-upgrade green row re-verifies it permanently (an unconditional
# exclusion would re-queue the key forever, wasting a window slot).
REVERIFY: dict[str, str] = {
    # r03 rows-only; r04 ships a recursive-CTE connected-components oracle
    "q_dedup_clusters": "r03",
    # r04 rewrote the money math to exact integer micro-units (both Spark
    # and oracle): totals are the same exact rationals but the final
    # double can differ in the last ulp from the r02-verified decimal
    # path, so the old green row no longer certifies today's values
    "q_join_payments_orders": "r03",
}


def _scan_correctness() -> dict[str, str]:
    """Fold driver-verified keys from every CORRECTNESS_r*.json next to the
    repo root into DRIVER_VERIFIED: hash_match=true is a green row;
    err='no_oracle' with a recorded row count is the rows-only check (the
    strongest result a no-oracle query can get)."""
    import json
    from pathlib import Path

    verified: dict[str, str] = dict(DRIVER_VERIFIED)
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = p.stem.split("_")[-1]
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                # keep the LATEST green round (files scan in round order)
                # so REVERIFY can tell pre- from post-upgrade results
                verified[key] = rnd
    return verified


def verified_keys() -> dict[str, str]:
    """Driver-verified keys that do NOT need a window slot: keys whose
    latest green CORRECTNESS round postdates any REVERIFY upgrade. The
    single definition of "verified" — ordered_keys and the
    window-coverage test must share it."""
    return {
        k: v
        for k, v in _scan_correctness().items()
        if not (k in REVERIFY and v <= REVERIFY[k])
    }


def ordered_keys() -> list[str]:
    """Window order: priority list (minus keys a later round already
    verified), then remaining unverified keys in registration order, then
    already-driver-verified keys last — so the driver's 50-entry window
    always hits the keys with no green CORRECTNESS row yet."""
    missing = set(WINDOW_PRIORITY) - set(QUERIES)
    if missing:
        raise ValueError(f"WINDOW_PRIORITY names unknown queries: {missing}")
    verified = verified_keys()
    prio = [k for k in WINDOW_PRIORITY if k not in verified]
    seen = set(prio)
    rest = [k for k in QUERIES if k not in seen and k not in verified]
    done = [k for k in QUERIES if k not in seen and k in verified]
    return prio + rest + done


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from saas_analytics_pipeline_spark import marts, staging  # noqa: F401
    from saas_analytics_pipeline_spark.operators import (  # noqa: F401
        audits,
        cohorts,
        corpus,
        dedup,
        joins,
        multimodal,
        retrieval,
        scd2,
        sessionize,
        similarity,
        sqlops,
        stats,
        text,
        tpch,
    )
    from saas_analytics_pipeline_spark.functions import udfs  # noqa: F401
    from saas_analytics_pipeline_spark.quality import checks  # noqa: F401
    from saas_analytics_pipeline_spark.streaming import jobs, stateful  # noqa: F401

    # imported LAST on purpose: ordered_keys sorts unverified keys by
    # registration order, and the driver's window covers only the first
    # 50 — keys that have waited since earlier rounds must verify before
    # this round's additions.
    from saas_analytics_pipeline_spark.operators import tpch2  # noqa: F401


def spark_queries() -> dict[str, SparkQuery]:
    load_all()
    return {k: QUERIES[k].fn for k in ordered_keys()}


def oracles() -> dict[str, str]:
    load_all()
    return {
        k: QUERIES[k].oracle
        for k in ordered_keys()
        if QUERIES[k].oracle is not None
    }
