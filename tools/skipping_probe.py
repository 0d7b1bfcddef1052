"""Measured A/B of the r10 table-format maintenance trio
(plans/publish.py): manifest-side FILE skipping, merge-on-read delete
overhead, and OPTIMIZE bin-packing gain.

Three sections, each with an internal equivalence gate (exit nonzero on
any mismatch — a probe that lost rows measures nothing):

  file_skipping   orders clustered by o_orderdate via repartitionByRange
                  (the PRODUCTION clustering path — sampled bounds, not
                  the cert key's replayable ntile) into N files, stats
                  annotated; a 1-week and a 1-month predicate resolve to
                  n_files_scanned / n_files_total straight from the
                  manifest, and the band aggregate is timed against the
                  same aggregate over read_current (full scan + filter).
                  The skip ratio is the claim; identical aggregates are
                  the gate.
  mor_overhead    1% of keys tombstoned via publish_deletes; the full-
                  table aggregate through read_current (tombstone
                  anti-join applied) timed against the pre-delete
                  snapshot's aggregate — the read-side price of leaving
                  deletes unmerged. Gate: visible rows == total - |keys|.
  optimize_gain   the same table published fragmented (maxRecordsPerFile)
                  then bin-packed by optimize_table; full-scan aggregate
                  timed on both layouts + file counts from the manifests.
                  A second OPTIMIZE run after a NARROW key-range delete
                  (stats on the delete key) reports how many partitions
                  the purge actually rewrote — the stats-narrowing claim
                  (operators/lake.py q_mor_delete docstring) measured.
                  Gate: row counts/sums equal across layouts.

Wall-clock caveat (same as layout_probe): at sf0.1 the per-job
scheduling floor on local[32] hides most of the decode gap, so the
timed ratios UNDERSTATE the skip; the file counts are the deterministic
evidence, timings are recorded for honesty.

Run:  python tools/skipping_probe.py [sf_dir]
"""

from __future__ import annotations

import datetime
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_FILES = 64
WEEK = ("1997-03-01 00:00:00", "1997-03-08 00:00:00")
MONTH = ("1997-03-01 00:00:00", "1997-04-01 00:00:00")
FRAG_CAP = 200  # maxRecordsPerFile for the fragmented publish
DEL_MOD = 100  # ~1% tombstoned keys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.session import get_spark
    from saas_analytics_pipeline_spark.sources import load_table

    spark = get_spark("skipping_probe")
    base = Path(tempfile.mkdtemp(prefix="skipping_probe_"))
    out: dict = {"sf_dir": sf_dir, "n_files": N_FILES}
    failures: list[str] = []

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def timed(df):
        t0 = time.perf_counter()
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        ).first()
        return time.perf_counter() - t0, (row["n"], str(row["s"]))

    # -- section 1: file skipping over production clustering ------------
    root = str(base / "clustered")
    clustered = orders.repartitionByRange(
        N_FILES, "o_orderdate"
    ).sortWithinPartitions("o_orderdate")
    P.publish_snapshot(spark, clustered, root, "t1")
    P.publish_stats(spark, root, ["o_orderdate"])
    skip: dict = {}
    for tag, (lo_s, hi_s) in (("week", WEEK), ("month", MONTH)):
        lo = datetime.datetime.fromisoformat(lo_s)
        hi = datetime.datetime.fromisoformat(hi_s)
        pred = F.col("o_orderdate").between(F.lit(lo), F.lit(hi))
        pruned, n_scan, n_total = P.read_skipping(
            spark, root, "o_orderdate", lo, hi
        )
        t_skip, agg_skip = timed(pruned.where(pred))
        t_full, agg_full = timed(P.read_current(spark, root).where(pred))
        if agg_skip != agg_full:
            failures.append(f"file_skipping[{tag}]: {agg_skip} != {agg_full}")
        skip[tag] = {
            "files_scanned": n_scan,
            "files_total": n_total,
            "skip_ratio": round(1 - n_scan / n_total, 3),
            "t_skipping_s": round(t_skip, 3),
            "t_fullscan_s": round(t_full, 3),
            "rows": agg_skip[0],
        }
    out["file_skipping"] = skip

    # -- section 2: merge-on-read read overhead --------------------------
    pre_manifest = P.current_manifest(root)
    keys = orders.where(F.col("o_orderkey") % DEL_MOD == 0).select(
        "o_orderkey"
    )
    n_del = keys.count()
    P.publish_deletes(spark, keys, root, "o_orderkey")
    t_mor, agg_mor = timed(P.read_current(spark, root))
    t_pre, agg_pre = timed(
        P.read_snapshot(spark, root, txid=pre_manifest["txid"])
    )
    if agg_mor[0] != agg_pre[0] - n_del:
        failures.append(
            f"mor_overhead: visible {agg_mor[0]} != {agg_pre[0]} - {n_del}"
        )
    out["mor_overhead"] = {
        "n_tombstoned": n_del,
        "t_with_tombstones_s": round(t_mor, 3),
        "t_pre_delete_s": round(t_pre, 3),
        "overhead_x": round(t_mor / max(t_pre, 1e-9), 2),
    }

    # -- section 3: OPTIMIZE bin-packing + stats-narrowed purge ----------
    root2 = str(base / "fragmented")
    monthly = orders.withColumn(
        "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    )
    conf_key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(conf_key, str(FRAG_CAP))
    try:
        P.publish_partition_overwrite(
            spark, monthly.repartition(F.col("mk")), root2, "mk"
        )
    finally:
        spark.conf.unset(conf_key)
    frag_m = P.current_manifest(root2)
    t_frag, agg_frag = timed(P.read_current(spark, root2))
    P.publish_stats(spark, root2, ["o_orderkey"])
    P.optimize_table(spark, root2)
    opt_m = P.current_manifest(root2)
    t_opt, agg_opt = timed(P.read_current(spark, root2))
    if agg_frag != agg_opt:
        failures.append(f"optimize_gain: {agg_frag} != {agg_opt}")
    out["optimize_gain"] = {
        "files_fragmented": frag_m["n_files"],
        "files_optimized": opt_m["n_files"],
        "t_fragmented_s": round(t_frag, 3),
        "t_optimized_s": round(t_opt, 3),
        "speedup_x": round(t_frag / max(t_opt, 1e-9), 2),
    }

    # -- section 4: stats-narrowed purge on a KEY-banded layout ----------
    # Stats narrow the purge's candidate scan only when the layout
    # correlates with the delete key (same precondition as any skipping).
    # 80 key bands, one file each; a contiguous key-range delete then has
    # stats-candidates ~= 1 band, and the purge rewrites exactly that
    # band — vs the month-partitioned table above, where uniform keys
    # make every file a candidate and the semi-join does all the work.
    root3 = str(base / "banded")
    lo_k, hi_k = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    width = (hi_k - lo_k) // 80 + 1
    banded = orders.withColumn(
        "kb", ((F.col("o_orderkey") - lo_k) / width).cast("int")
    )
    P.publish_partition_overwrite(
        spark, banded.repartition(F.col("kb")), root3, "kb"
    )
    P.publish_stats(spark, root3, ["o_orderkey"])
    del_lo, del_hi = lo_k, lo_k + width // 2  # half of band 0's key range
    m3 = P.current_manifest(root3)
    candidates = sum(
        1
        for f in m3["files"]
        if not (
            m3["stats"][f]["o_orderkey"][1] < del_lo
            or m3["stats"][f]["o_orderkey"][0] > del_hi
        )
    )
    P.publish_deletes(
        spark,
        orders.where(F.col("o_orderkey").between(del_lo, del_hi)).select(
            "o_orderkey"
        ),
        root3,
        "o_orderkey",
    )
    before_parts = P.current_manifest(root3)["partitions"]
    P.optimize_table(spark, root3)
    after_parts = P.current_manifest(root3)["partitions"]
    n_rewritten = sum(
        1 for v in after_parts if after_parts[v] != before_parts.get(v)
    )
    out["stats_narrowed_purge"] = {
        "n_parts_total": len(before_parts),
        "candidate_files_by_stats": candidates,
        "rewritten_parts": n_rewritten,
    }
    if n_rewritten > candidates:
        failures.append(
            f"purge rewrote {n_rewritten} parts > {candidates} candidates"
        )

    shutil.rmtree(base, ignore_errors=True)
    out["failures"] = failures
    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
