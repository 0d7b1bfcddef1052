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
    n_cand = lsh_candidate_pairs(docs).count()

    t0 = time.perf_counter()
    n_verified = near_dup_pairs(docs).count()
    wall = round(time.perf_counter() - t0, 3)

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
            }
        )
    )


if __name__ == "__main__":
    main()
