"""Measured Structured-Streaming throughput on the sf3 event stream.

§2.9's jobs are correctness-tested (tests/test_streaming.py) and the
batch twins are driver-verified, but no throughput number existed for
the live path. This probe drives the two representative stateful shapes
over the 3 M-row sf3 events replica as a file-source stream under
Trigger.AvailableNow (the daily-incremental regime the reference's
orchestration implies):

  tumbling   watermarked 1 h tumbling count per event_type
             (built-in streaming agg — JVM state store)
  sessionize applyInPandasWithState custom sessionizer
             (Arrow-batched python state path — the expensive kind)
  lsh_dedup  streaming near-dup dedup over the sf3 documents replica:
             scan-local per-row MinHash banding into keyed
             (band, bucket) state (applyInPandasWithState) — the
             heaviest corpus-path stream (md5-per-shingle compute +
             Arrow state). Docs streamed in doc_id order
             (repartitionByRange) so arrival tracks event time, like
             an ordered ingest log.

Reported per job: wall seconds, input rows/s, output rows. The file is
split into micro-batches via maxFilesPerTrigger=1 over a multi-file
copy (8 parts), so state survives ACROSS micro-batches — a single-batch
run would never exercise state handoff.

Run:  python tools/stream_probe.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF3_EVENTS = ROOT / ".localdata" / "sf3" / "events.parquet"
SF3_DOCS = ROOT / ".localdata" / "sf3" / "documents.parquet"
SRC_DIR = Path("/tmp/stream_probe_events")
DOC_SRC_DIR = Path("/tmp/stream_probe_docs")
CKPT = Path("/tmp/stream_probe_ckpt")

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def main() -> None:
    from pyspark.sql import SparkSession

    shutil.rmtree(SRC_DIR, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stream-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    # 8-file copy so maxFilesPerTrigger=1 yields 8 micro-batches
    src = spark.read.parquet(str(SF3_EVENTS))
    n_rows = src.count()
    src.repartition(8).write.mode("overwrite").parquet(str(SRC_DIR))

    from saas_analytics_pipeline_spark.streaming.jobs import (
        tumbling_counts_stream,
    )
    from saas_analytics_pipeline_spark.streaming.stateful import (
        sessionize_stream,
    )

    def run(name: str, mk, output_mode: str) -> dict:
        events = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(SRC_DIR))
        )
        q = (
            mk(events)
            .writeStream.format("memory")
            .queryName(f"probe_{name}")
            .outputMode(output_mode)
            .option("checkpointLocation", str(CKPT / name))
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.perf_counter()
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        out = spark.table(f"probe_{name}").count()
        batches = len(q.recentProgress)
        return {
            "job": name,
            "wall_sec": wall,
            "rows_per_sec": int(n_rows / wall),
            "micro_batches": batches,
            "output_rows": out,
        }

    results = [
        run("tumbling", tumbling_counts_stream, "complete"),
        run("sessionize", sessionize_stream, "append"),
    ]

    # --- streaming near-dup dedup over the documents replica ---
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.streaming.jobs import DOC_EPOCH
    from saas_analytics_pipeline_spark.streaming.stateful import (
        lsh_dedup_stream,
    )

    shutil.rmtree(DOC_SRC_DIR, ignore_errors=True)
    docs = spark.read.parquet(str(SF3_DOCS))
    n_docs = docs.count()
    # range-partitioned by doc_id: files arrive in event-time order (an
    # ordered ingest log), so the watermark never drops the tail
    docs.repartitionByRange(8, "doc_id").write.mode("overwrite").parquet(
        str(DOC_SRC_DIR)
    )

    doc_stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(DOC_SRC_DIR))
        .select(
            "doc_id",
            F.timestamp_seconds(F.lit(DOC_EPOCH) + F.col("doc_id") * 60).alias(
                "ts"
            ),
            "text",
        )
    )
    q = (
        lsh_dedup_stream(doc_stream)
        .writeStream.format("memory")
        .queryName("probe_lsh_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(CKPT / "lsh_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)
    flagged = (
        spark.table("probe_lsh_dedup")
        .groupBy("doc_id")
        .agg(F.max("hit").alias("dup"))
        .agg(F.sum("dup"))
        .first()[0]
    )
    results.append(
        {
            "job": "lsh_dedup",
            "wall_sec": wall,
            "rows_per_sec": int(n_docs / wall),
            "micro_batches": len(q.recentProgress),
            "output_rows": spark.table("probe_lsh_dedup").count(),
            "input_docs": n_docs,
            "docs_flagged": int(flagged),
        }
    )
    print(json.dumps({"input_rows": n_rows, "jobs": results}))


if __name__ == "__main__":
    main()
