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
    # incremental maintenance A/B (q_similarity_ivf_incremental): ingesting
    # a new batch must cost ONE assign-only pass against frozen anchors,
    # not a quantizer refit. Times (a) the full KMeans refit over
    # corpus+batch — what a non-incremental index pays per ingest — vs
    # (b) pinned-anchor assignment of just the batch. Both materialize
    # (vec_id, cell/anchor) for their input; min of 2 passes after warm.
    from saas_analytics_pipeline_spark.operators.similarity import (
        IVF_BATCH_MOD,
        assign_cells,
        pinned_anchors,
    )

    batch = corpus.where(F.col("vec_id") % IVF_BATCH_MOD == 0)
    old = corpus.where(F.col("vec_id") % IVF_BATCH_MOD != 0)
    n_batch = batch.count()
    anchors = pinned_anchors(old)
    anchors.cache().count()  # the persisted quantizer: not part of the A/B

    def timed(fn) -> float:
        fn()  # warm
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    refit_sec = timed(
        lambda: ivf_fit_assign(corpus, n_cells=n_cells)[0]
        .select("vec_id", "cell")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    assign_sec = timed(
        lambda: assign_cells(batch, anchors)
        .select("vec_id", "anchor_id")
        .write.format("noop")
        .mode("overwrite")
        .save()
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
                "incremental": {
                    "n_batch": n_batch,
                    "refit_full_sec": refit_sec,
                    "assign_only_sec": assign_sec,
                    "speedup": round(refit_sec / assign_sec, 1)
                    if assign_sec
                    else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
