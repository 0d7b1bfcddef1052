"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Headline set spans the engine's main cost classes: scan+agg, broadcast star
join, shuffle fact-fact join, window (dedup/session/SCD2), rollup, and the
north-star text/embedding ops.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# The original 15-query headline set (r01-r03): totals are comparable
# round-over-round, surfaced as compat_r03_total below.
HEADLINE_CORE = [
    "q_revenue_daily",
    "q_join_star_orders",
    "q_join_payments_orders",
    "q_topn_orgs",
    "q_rollup",
    "q_dedup_latest",
    "q_sessionize",
    "q_scd2_build",
    "q_asof_payment",
    "q_funnel",
    "q_stream_tumbling",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_similarity",
    "q_text_stats",
]

# r04+: the decision-support suite — the 6-way-join / argmax / semi-join
# shapes that dominate at 100x scale; tracked so a future plan regression
# (a lost pushdown, a forced broadcast) shows up as a timing step.
HEADLINE_TPCH = [
    "q_tpch_pricing",
    "q_tpch_shipping",
    "q_tpch_local_volume",
    "q_tpch_promo_share",
    "q_tpch_top_supplier",
    "q_tpch_big_orders",
    "q_tpch_order_priority",
]

# r04+: the LLM-pipeline heavies — inverted-index decontamination, TF-IDF,
# cross-doc duplicate spans, the deterministic training shuffle, and BM25.
# These are first-class deliverables; tracking them catches a regression in
# the text-family plans (a lost pushdown, an accidental text shuffle).
HEADLINE_CORPUS = [
    "q_contamination",
    "q_tf_idf",
    "q_dup_span_fraction",
    "q_train_shuffle",
    "q_bm25",
]

# r06+: the curation heavies — the composed lang/quality/dedup/budget
# funnel (one plan, text dies scan-side) and two-sided incremental
# MinHash-LSH dedup (batch bands vs persisted corpus bands). The two new
# cost shapes of the round; a regression in either (a gate that stops
# fusing, a candidate blowup) shows up as a timing step.
HEADLINE_CURATION = [
    "q_curation_pipeline",
    "q_dedup_lsh_incremental",
]

# r08: the r07/r08 families the scaling record must cover (VERDICT r07 #1
# — the catalog's newest scale claims need a measured sf slope): assign-only
# ANN ingest, zero-shuffle Misra-Gries, iterated joins (fixed and
# converged), scan-side markup strip, and the zero-Exchange bucketed join.
HEADLINE_R08 = [
    "q_similarity_ivf_incremental",
    "q_heavy_hitters",
    "q_pagerank",
    "q_pagerank_converged",
    "q_html_extract",
    "q_bucket_join",
]

# r09: the commit-path families — connected components under the
# convergence contract (the dedup APPLY step, iterated to fixpoint with
# n_iters certified), the publish protocol's replay/retention lifecycle,
# and the registry DAG build through atomic TABLE publishes. Tracked so a
# regression in the iteration discipline or commit overhead shows up as a
# timing step.
HEADLINE_R09 = [
    "q_dedup_clusters_converged",
    "q_publish_lifecycle",
    "q_registry_build",
    # the exact-substring family + the wired ANN loop: the round's new
    # cost shapes (window explode -> hash index; token-touch rewrite
    # join; assign/gauge/refit/fold cycle)
    "q_dup_spans",
    "q_dup_spans_rewrite",
    "q_ann_maintenance",
]

# r10: table-format maintenance — manifest-side file skipping over
# per-file stats, OPTIMIZE bin-packing (fragmented write + pack commit),
# and merge-on-read deletes + purge. Tracked so commit/maintenance
# overhead regressions (an accidental full-table rewrite, a skipped-file
# scan) show up as a timing step.
HEADLINE_R10 = [
    "q_stats_skipping",
    "q_optimize_compact",
    "q_mor_delete",
    "q_schema_evolution_lake",
    "q_txn_commit",
]

# r11: the publish-layer routing + co-location certificates — manifest
# bucket specs (zero-Exchange fact-fact joins through the protocol) and
# predicate-routed reads (partition/stats/compound file pruning). Tracked
# so a lost route or a broken bucket spec shows up as a timing step.
HEADLINE_R11 = [
    "q_bucket_manifest",
    "q_predicate_routing",
    "q_catalog_maintain",
    "q_stream_lake_maint",
]
HEADLINE_R12 = [
    # predicate routing over CATALOG tables (landed late in r11 without a
    # bench row — VERDICT r11 #4)
    "q_catalog_routing",
    # bucketed partitioned fact-fact join through the publish protocol
    "q_bucket_partitioned",
    # file-scoped deletion vectors: GDPR delete -> resubscribe -> optimize
    "q_delete_vectors",
]

HEADLINE_R13 = [
    # bucketed-partitioned OPTIMIZE: registers purged through the
    # bucketed writer, co-location preserved (VERDICT r12 #4). NOTE:
    # the timing covers SEVEN sequential lineage commits (2 publishes,
    # delete, resubscribe, eager p1, OPTIMIZE rewrite, p2) — expect
    # several seconds; the cost is the lifecycle, not a plan regression
    "q_optimize_bucketed",
    # bucketed partitioned facts + bucketed dim inside the catalog unit,
    # one-swap commit + zero-Exchange star join (VERDICT r12 #5)
    "q_catalog_bucketed_partitioned",
    # catalog-table lifecycle: delete -> resubscribe increment, stats-
    # narrowed reconcile, both phases through the co-located readers
    "q_catalog_increment",
]

HEADLINE = (
    HEADLINE_CORE
    + HEADLINE_TPCH
    + HEADLINE_CORPUS
    + HEADLINE_CURATION
    + HEADLINE_R08
    + HEADLINE_R09
    + HEADLINE_R10
    + HEADLINE_R11
    + HEADLINE_R12
    + HEADLINE_R13
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as ent
    from saas_analytics_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = ent.queries()

    def run(df) -> None:
        # noop sink: forces FULL computation of every column (a bare count()
        # would let Catalyst prune the aggregate payload columns)
        df.write.format("noop").mode("overwrite").save()

    # Warm pass (untimed): one run of the whole headline set primes JVM JIT,
    # whole-stage-codegen compilation caches, and parquet footers, so the
    # timed pass measures steady-state throughput — the regime a long-lived
    # cluster actually runs in — rather than first-query JIT compilation.
    for name in HEADLINE:
        run(qs[name](spark, sf_dir))

    # five timed passes, report the per-query MEDIAN (VERDICT r10 #7):
    # the r10 round showed min-of-3 still drifting ±20% round-over-round
    # under co-tenant load spikes on the bench host; the median of five
    # is robust to up to two polluted passes in EITHER direction, so
    # round-over-round deltas mean plan changes, not host weather.
    import statistics

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _pass in range(5):
        for name in HEADLINE:
            t0 = time.perf_counter()
            run(qs[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    timings = {
        name: round(statistics.median(samples[name]), 3)
        for name in HEADLINE
    }
    for name in HEADLINE:
        print(
            f"# {name}: median {timings[name]:.3f}s "
            f"(min {min(samples[name]):.3f}s over 5)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # total over the unchanged r01-r03 15-query set: the
        # round-over-round comparable number (value above now also
        # includes the TPC-H suite added in r04)
        "compat_r03_total": round(
            sum(timings[n] for n in HEADLINE_CORE), 3
        ),
    }
    # Summarize (don't inline) the recorded scaling run: the full per-query
    # exponent block lives in docs/BENCH_SF1.json; embedding it here made the
    # stdout line long enough that the driver's tail capture truncated it
    # mid-JSON and recorded "parsed": null for the round (VERDICT r06 #1).
    # Keep the line compact — one summary object, full record on disk.
    sf1_path = Path(__file__).resolve().parent / "docs" / "BENCH_SF1.json"
    if sf1_path.exists():
        rec = json.loads(sf1_path.read_text())
        exps = rec.get("scaling_exponent", {})
        payload["sf1_scaling_summary"] = {
            "commit": rec.get("commit"),
            "max_slope": max(exps.values()) if exps else None,
            "n_queries": len(exps),
            "superlinear_queries": rec.get("superlinear_queries"),
            "record": "docs/BENCH_SF1.json",
        }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
