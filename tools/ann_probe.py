"""Measured IVF recall/latency curve on the sf3 embedding replica.

`operators/similarity.py::ivf_topk` trades recall for per-query work
(~n_probe/n_cells of the corpus scored per query); pytest pins a recall
FLOOR at one operating point, but the curve — what a capacity/quality
plan actually needs — was never measured. This probe fits one IVF index
over the 60 k sf3 vectors (64-dim), takes a fixed query sample, computes
exact brute-force cosine top-k as ground truth, then sweeps n_probe and
reports recall@k and wall seconds per point (one session; per-point min
of 2 passes after a warm pass).

Recall@k := |approx top-k ∩ exact top-k| / k, averaged over queries —
the standard ANN benchmark metric (same definition as the pytest floor).

Run:  python tools/ann_probe.py [n_cells=16] [n_queries=200]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF3 = ROOT / ".localdata" / "sf3"


def main() -> None:
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from saas_analytics_pipeline_spark.operators.similarity import (
        TOP_K,
        cosine_topk,
        ivf_fit_assign,
        ivf_topk,
    )

    corpus = spark.read.parquet(str(SF3 / "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_corpus = corpus.count()
    queries = corpus.where(
        F.abs(F.hash("vec_id")) % (n_corpus // n_queries) == 0
    ).limit(n_queries)
    queries.cache().count()

    t0 = time.perf_counter()
    assigned, centroids = ivf_fit_assign(corpus, n_cells=n_cells)
    assigned = assigned.cache()
    assigned.count()
    fit_sec = round(time.perf_counter() - t0, 3)

    def topk_set(df):
        rows = df.select("query_id", "vec_id").collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    t0 = time.perf_counter()
    exact = topk_set(cosine_topk(queries, corpus, k=TOP_K))
    exact_sec = round(time.perf_counter() - t0, 3)

    points = []
    # dedupe and cap the sweep at the cell count (n_probe > n_cells is
    # past exhaustive; default n_cells=16 yields 1,2,4,8,16)
    sweep = sorted({p for p in (1, 2, 4, 8, n_cells) if p <= n_cells})
    for n_probe in sweep:
        df = ivf_topk(
            queries, assigned, centroids, k=TOP_K, n_probe=n_probe
        )
        df.write.format("noop").mode("overwrite").save()  # warm
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        approx = topk_set(df)
        recalls = [
            len(approx.get(q, set()) & hits) / len(hits)
            for q, hits in exact.items()
        ]
        points.append(
            {
                "n_probe": n_probe,
                "recall_at_k": round(sum(recalls) / len(recalls), 4),
                "min_sec": round(best, 3),
            }
        )
    print(
        json.dumps(
            {
                "n_corpus": n_corpus,
                "n_queries": len(exact),
                "n_cells": n_cells,
                "k": TOP_K,
                "ivf_fit_sec": fit_sec,
                "exact_baseline_sec": exact_sec,
                "points": points,
            }
        )
    )


if __name__ == "__main__":
    main()
