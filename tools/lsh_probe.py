"""Measured LSH candidate-reduction ratio on the sf3 corpus.

The dedup family's 100 TB argument is that candidates come from shared
LSH buckets, never from all-pairs — docs/SCALE_LINT.md pins the plan
shape, but the RATIO (how many pairs the buckets actually admit vs the
quadratic ceiling) was design prose until now. This probe runs the real
pipeline (`operators/dedup.py::near_dup_pairs` and the same banding its
candidate stage uses) over the 150 k-document sf3 replica and reports:

  possible_pairs    n*(n-1)/2 — what all-pairs would score
  candidate_pairs   distinct pairs sharing >= 1 of the 8 LSH band buckets
  verified_pairs    candidates passing the exact-Jaccard >= 0.7 verify
  wall_sec          full pipeline (signatures -> buckets -> verify)

Run:  python tools/lsh_probe.py
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
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lsh-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from saas_analytics_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        near_dup_pairs,
    )

    docs = spark.read.parquet(str(SF3 / "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    # the candidate stage IS near_dup_pairs' candidate stage — same
    # helper, so this count cannot drift from the shipped pipeline
    cand = lsh_candidate_pairs(docs)
    n_cand = cand.count()

    t0 = time.perf_counter()
    n_verified = near_dup_pairs(docs).count()
    wall = round(time.perf_counter() - t0, 3)

    # incremental-path parity (q_dedup_lsh_incremental's two legs): the
    # incremental candidate set must be exactly the batch candidates that
    # involve >= 1 new-batch doc — i.e. the incremental path skips the
    # old-vs-old work and NOTHING else
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.operators.dedup import (
        incremental_candidates,
    )

    t1 = time.perf_counter()
    # the SAME candidate construction the production key runs
    # (single banding self-join with membership predicates)
    inc_cand = incremental_candidates(docs)
    n_inc = inc_cand.count()
    inc_wall = round(time.perf_counter() - t1, 3)
    n_batch_touching = cand.where(
        (F.col("a") % 3 == 0) | (F.col("b") % 3 == 0)
    ).count()

    possible = n_docs * (n_docs - 1) // 2
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "possible_pairs": possible,
                "candidate_pairs": n_cand,
                "candidate_share": round(n_cand / possible, 8),
                "verified_pairs": n_verified,
                "pipeline_wall_sec": wall,
                "incremental_candidates": n_inc,
                "batch_candidates_touching_new": n_batch_touching,
                "incremental_matches_batch": n_inc == n_batch_touching,
                "incremental_candidate_wall_sec": inc_wall,
            }
        )
    )


if __name__ == "__main__":
    main()
