"""Lake-mechanics operators: schema evolution on read, range-clustered
layout + min/max pruning, small-file compaction, merge-upsert, and the
r10 table-format maintenance certificates over plans/publish.py (file
stats + manifest-side skipping, OPTIMIZE, merge-on-read deletes,
schema-in-log evolution, multi-table atomic commit).

A long-lived corpus lake accumulates parquet written by different pipeline
versions — later generations add columns (a new quality score, a channel
tag) that earlier files don't carry. The reference's contract is a FIXED
schema per source (`/root/reference/models/schema.yml:1-141`); this module
covers the lake reality one step past that contract: reading mixed
generations through Spark's parquet schema merging so old files surface
the new column as NULL, while a TRUE type conflict (the same column
written with incompatible types) is rejected loudly instead of being
silently coerced (pinned by tests/test_lake.py).

Scale notes (100 TB):
- mergeSchema reads each file's FOOTER, not its data — the union schema is
  computed from metadata only, so evolution costs nothing at scan time.
  On lakes with millions of files, footer listing itself is the cost:
  production pins the merged schema in a table catalog (Delta/Iceberg
  semantics) or passes an explicit .schema(...) — the read path below is
  identical either way.
- The per-generation rollup is a partial-aggregable groupBy on a
  scan-derived key; money sums use exact DECIMAL combine.
- Range clustering (q_layout_cluster) is ONE range shuffle at write time
  that buys every later selective scan a row-group skip: parquet footers
  carry per-row-group min/max, and a clustered layout makes those ranges
  disjoint, so a 1% key predicate decodes ~1% of the bytes. Measured in
  tools/layout_probe.py (docs/PROBES.json): 1/16 row groups = 6.9% of
  bytes under a 1% predicate vs 16/16 on the unclustered copy.
- Compaction (q_compaction_gauge) sizes output files from the row count —
  the driver-side count is a parquet-metadata-only action (the same file
  listing any production compactor does) and the rewrite is one shuffle.
- Merge-upsert (q_merge_upsert) broadcasts the increment's key set so the
  100 TB target side never shuffles (plans/incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.scratch import scratch_path, sf_tag
from saas_analytics_pipeline_spark.sources import load_table

# o_channel backfill tag for generation-B rows (deterministic from the key
# so the DuckDB oracle replays it without reading the written files)
_CHANNELS = ("web", "app", "api")


def channel_expr() -> F.Column:
    """The added column of generation B: a sales channel derived from the
    order key (stand-in for a column a newer pipeline version emits)."""
    return (
        F.when(F.col("o_orderkey") % 3 == 0, _CHANNELS[0])
        .when(F.col("o_orderkey") % 3 == 1, _CHANNELS[1])
        .otherwise(_CHANNELS[2])
    )


CHANNEL_SQL = """
    CASE o_orderkey % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'app' ELSE 'api' END
"""


def write_generations(spark: SparkSession, sf_dir: str) -> str:
    """Write the two parquet generations the evolution read merges:
    gen A (even order keys) lacks `o_channel`; gen B (odd keys) carries
    it. Deterministic overwrite under the system temp dir — the test lake
    stores no derived state, so the generations are (re)materialized per
    call, like q_dedup_lsh_incremental's corpus bands."""
    base = scratch_path("saas_lake_evo", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    gen_a = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    gen_b = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        channel_expr().alias("o_channel"),
    )
    gen_a.write.mode("overwrite").parquet(os.path.join(base, "gen_a"))
    gen_b.write.mode("overwrite").parquet(os.path.join(base, "gen_b"))
    return base


@query(
    "q_schema_evolution",
    oracle=f"""
    WITH merged AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 2 = 1 THEN {CHANNEL_SQL} END
                   AS o_channel
        FROM orders
    )
    SELECT o_orderkey % 2 AS gen,
           COUNT(*) AS n_rows,
           CAST(COUNT(o_channel) AS BIGINT) AS n_with_channel,
           COUNT(DISTINCT o_channel) AS n_channels,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM merged GROUP BY gen ORDER BY gen
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations — the older one
    WITHOUT `o_channel`, the newer one with it — are read through
    `mergeSchema`, and the unified projection is proven by aggregating the
    merged frame per generation: old rows surface o_channel as NULL
    (n_with_channel = 0), new rows carry all three channel values, and the
    money total matches the source exactly (the merge dropped no rows).
    The DuckDB oracle replays the generation split from the source table,
    so a merge that mangled rows or values breaks the hash. The rejected
    case — a true type conflict across generations — is pinned as a caught
    error in tests/test_lake.py.

    Scale: see module docstring — merging costs footer reads only; the
    rollup is 2 groups of partial aggregates."""
    base = write_generations(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen_a"), os.path.join(base, "gen_b")
    )
    return (
        merged.groupBy((F.col("o_orderkey") % 2).alias("gen"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_channel").cast("long").alias("n_with_channel"),
            F.countDistinct("o_channel").alias("n_channels"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("gen")
    )


# ---------------------------------------------------------------------------
# Data layout: range clustering, min/max pruning, small-file compaction
# ---------------------------------------------------------------------------

# clustered write = this many range partitions of orders by o_custkey
CLUSTER_BUCKETS = 8
# selective read: custkeys in the lowest 1/CLUSTER_DIV of the key range
CLUSTER_DIV = 20


def write_clustered(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the range-clustered copy of orders: ONE
    repartitionByRange shuffle on o_custkey + an in-partition sort, so
    every parquet row group covers a narrow disjoint custkey band and the
    footer min/max statistics actually prune. The Z-order-lite layout
    move: pay one shuffle at write time, skip row groups on every later
    selective read (pruning pinned by tests/test_lake.py on the footers
    themselves; measured A/B in tools/layout_probe.py)."""
    base = scratch_path("saas_lake_cluster", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .repartitionByRange(CLUSTER_BUCKETS, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(base)
    )
    return base


@query(
    "q_layout_cluster",
    oracle=f"""
    WITH b AS (
        SELECT max(o_custkey) // {CLUSTER_DIV} AS bound FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders, b WHERE o_custkey <= bound
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q_layout_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered layout round trip: orders are rewritten clustered
    by o_custkey (write_clustered), then a selective band — the lowest
    1/{CLUSTER_DIV} of the key range — is read back and aggregated per
    order status. The DuckDB oracle runs the same band query on the
    SOURCE table, so a clustering write that dropped, duplicated, or
    mangled rows breaks the hash; what the clustered copy buys (row-group
    skipping) is proven on the parquet footers in tests/test_lake.py and
    measured in tools/layout_probe.py.

    Scale: the band bound is derived as a 1-row aggregate broadcast back
    (in production it is a literal tenant/date and reaches the scan as a
    pushed filter — the footer min/max then skip ~{CLUSTER_DIV}x of the
    bytes); the rollup is a partial-aggregable groupBy over the band."""
    base = write_clustered(spark, sf_dir)
    clustered = spark.read.parquet(base)
    bound = clustered.agg(
        F.expr(f"max(o_custkey) div {CLUSTER_DIV}").alias("bound")
    )
    return (
        clustered.join(F.broadcast(bound))
        .where(F.col("o_custkey") <= F.col("bound"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# Z-order clustering: bucket each dimension to 2^ZORDER_BITS cells,
# interleave the bucket bits into a morton code, range-partition + sort on
# it — each written file then covers a narrow band of BOTH dimensions, so
# footer min/max prune on either predicate (a single-key sort prunes only
# its own key; pinned comparatively in tests/test_lake.py).
ZORDER_BITS = 4
ZORDER_FILES = 16
# the 2-d band read: lowest quarter of the custkey range AND the first
# ~quarter of the order-date span (fixed literal, engine-portable)
ZORDER_DATE_BOUND = "1996-09-01 00:00:00"


def morton_expr(bx: str, by: str, bits: int = ZORDER_BITS) -> F.Column:
    """Interleave the low ``bits`` bits of two bucket columns into a
    morton (Z-curve) code — scan-local integer codegen, no UDF. Bit i of
    bx lands at position 2i, bit i of by at 2i+1; the terms are disjoint
    bits so + is |."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({bx}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({by}, {i}) & 1, {2 * i + 1})")
    return F.expr(" + ".join(terms))


def write_zordered(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the Z-ordered copy of orders: bucket o_custkey and
    o_orderdate each to 2^{ZORDER_BITS} range-preserving cells (scaled by
    the data min/max — a 1-row broadcast), interleave into a morton code,
    then ONE repartitionByRange shuffle + in-partition sort on the code.
    The helper columns are dropped before the write; the layout is the
    only thing that changes."""
    base = scratch_path("saas_lake_zorder", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cells = 1 << ZORDER_BITS
    stats = orders.agg(
        F.max("o_custkey").alias("_mc"),
        F.min("o_orderdate").alias("_d0"),
        F.max("o_orderdate").alias("_d1"),
    )
    coded = (
        orders.join(F.broadcast(stats))
        .withColumn(
            "_bx", F.expr(f"(o_custkey * {cells}) div (_mc + 1)")
        )
        .withColumn(
            "_by",
            F.expr(
                f"(datediff(o_orderdate, _d0) * {cells})"
                " div (datediff(_d1, _d0) + 1)"
            ),
        )
        .withColumn("_z", morton_expr("_bx", "_by"))
    )
    # Spark's default parquet timestamp encoding (INT96) carries NO
    # min/max statistics — the whole point of the clustered layout is
    # footer pruning, so write real TIMESTAMP_MICROS (also the testdata's
    # own encoding). Scoped to THIS write: the session conf is saved and
    # restored so an unrelated later write in the same session keeps its
    # own timestamp encoding (e.g. for INT96-expecting consumers).
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            coded.repartitionByRange(ZORDER_FILES, "_z")
            .sortWithinPartitions("_z")
            .drop("_mc", "_d0", "_d1", "_bx", "_by", "_z")
            .write.mode("overwrite")
            .parquet(base)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return base


@query(
    "q_layout_zorder",
    oracle=f"""
    WITH b AS (
        SELECT max(o_custkey) // 4 AS bound FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders, b
    WHERE o_custkey <= bound
      AND o_orderdate < TIMESTAMP '{ZORDER_DATE_BOUND}'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (multi-dimension) clustering round trip: orders are
    rewritten sorted by a morton interleave of bucketed (o_custkey,
    o_orderdate), then a TWO-dimensional band — lowest quarter of the
    custkey range AND orders before {ZORDER_DATE_BOUND} — is read back
    and rolled up per priority. The oracle replays the band on the
    SOURCE table, so a layout rewrite that dropped/duplicated rows
    breaks the hash. What Z-order buys over the single-key sort
    (q_layout_cluster): every written file covers a narrow band of BOTH
    dimensions, so footer min/max prune on either predicate alone —
    pinned comparatively on the actual footers in tests/test_lake.py
    (date-band predicate skips most Z-ordered files but NO custkey-sorted
    files).

    Scale: clustering is one range shuffle at write time; the morton
    code is scan-local integer codegen (no UDF). At 100 TB this is the
    Delta/Iceberg OPTIMIZE ZORDER story with plain parquet + DataFrame
    ops; the band rollup is a partial-aggregable groupBy."""
    base = write_zordered(spark, sf_dir)
    z = spark.read.parquet(base)
    bound = z.agg(F.expr("max(o_custkey) div 4").alias("bound"))
    return (
        z.join(F.broadcast(bound))
        .where(
            (F.col("o_custkey") <= F.col("bound"))
            & (
                F.col("o_orderdate")
                < F.lit(ZORDER_DATE_BOUND).cast("timestamp")
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# fragmented write = this many small files; compaction targets this many
# rows per output file
FRAG_FILES = 64
ROWS_PER_FILE = 4096


@query(
    "q_compaction_gauge",
    oracle=f"""
    SELECT {FRAG_FILES} AS files_before,
           CAST(CEIL(COUNT(*) / {ROWS_PER_FILE}.0) AS BIGINT)
               AS files_after,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    """,
)
def q_compaction_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction gauge: orders are first written FRAGMENTED
    ({FRAG_FILES} files — the many-tiny-files state a streaming or
    per-day ingest leaves behind), then compacted to
    ceil(rows / {ROWS_PER_FILE}) files, and the gauge row reports file
    counts before/after (counted from input_file_name() on the actual
    read-back) plus the row count and exact money checksum of the
    compacted copy. The oracle pins the expected file counts as literals
    derived from the source row count and the checksum from the source
    table — a compaction that lost or duplicated rows, or produced the
    wrong file count, breaks the hash.

    Scale: the sizing count is a parquet-metadata-only driver action
    (the same listing any production compactor does — no data moves);
    the rewrite is one round-robin shuffle, embarrassingly parallel. At
    100 TB the same job runs per partition (dt/source), so the shuffle
    is bounded by a partition, not the table."""
    import math

    base = scratch_path("saas_lake_compact", sf_dir)
    frag_path = os.path.join(base, "frag")
    compact_path = os.path.join(base, "compact")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    orders.repartition(FRAG_FILES).write.mode("overwrite").parquet(frag_path)

    frag = spark.read.parquet(frag_path)
    n_rows = frag.count()  # metadata-only: parquet footer row counts
    k = max(1, math.ceil(n_rows / ROWS_PER_FILE))
    frag.repartition(k).write.mode("overwrite").parquet(compact_path)

    compacted = spark.read.parquet(compact_path).withColumn(
        "_file", F.input_file_name()
    )
    before = (
        frag.select(F.input_file_name().alias("_file"))
        .agg(F.countDistinct("_file").alias("files_before"))
    )
    after = compacted.agg(
        F.countDistinct("_file").alias("files_after"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
    return before.join(F.broadcast(after))


# idempotent partition overwrite: re-run ONE month's load with changed
# rows; only that month's partition may change
OVW_MONTH = "1997-03-01"
OVW_BUMP = 1_000_000


@query(
    "q_partition_overwrite",
    oracle=f"""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS dt,
               CASE WHEN CAST(date_trunc('month', o_orderdate) AS DATE)
                         = DATE '{OVW_MONTH}'
                    THEN o_custkey + {OVW_BUMP} ELSE o_custkey END AS ck,
               o_totalprice
        FROM orders
    )
    SELECT dt, COUNT(*) AS n_rows,
           CAST(SUM(ck) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM m GROUP BY dt ORDER BY dt
    """,
)
def q_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent partition overwrite, certified end to end: orders are
    loaded month-partitioned (plans/incremental.write_day_increment —
    dynamic partitionOverwriteMode), then ONE month ({OVW_MONTH}) is
    re-loaded with corrected rows (custkey bumped by {OVW_BUMP} — the
    backfill shape: re-run one period after a fix). The per-month rollup
    of the read-back lake is hash-checked against an oracle that replays
    the final state from the source: every month must carry its original
    rows EXCEPT the re-run month, which must carry exactly the corrected
    batch — an overwrite that leaked into other partitions, duplicated
    the re-run month, or dropped it breaks the hash. Promotes the
    reference's per-day incremental-load contract
    (`/root/reference/README.md:82,24`) from pytest-only
    (test_incremental) to a driver-verified key.

    Scale: the atomic partition overwrite touches ONLY the partitions
    present in the increment frame — a one-month backfill writes one
    snapshot directory of new files for that month while every other
    month carries over in the manifest by reference; the load itself is
    one shuffle keyed by partition so each period lands in few large
    files, and the commit is a pointer rename (crash-safe, unlike the
    in-place dynamic mode this key used before r09)."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.plans.incremental import (
        write_day_increment,
    )

    base = scratch_path("saas_lake_povw", sf_dir)
    shutil.rmtree(base, ignore_errors=True)  # fresh lineage per run
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").alias("om"),
    )
    # full historical load (all months), then the one-month corrected
    # re-run — dynamic overwrite must replace exactly that partition
    write_day_increment(spark, orders, base, "om")
    rerun = orders.where(
        F.col("om") == F.lit(OVW_MONTH).cast("timestamp")
    ).withColumn("o_custkey", F.col("o_custkey") + F.lit(OVW_BUMP))
    write_day_increment(spark, rerun, base, "om")
    return (
        P.read_current(spark, base)
        .groupBy("dt")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("dt")
    )


# merge-upsert fixture: keys % 5 == 0 arrive in the increment (two
# versions each — latest wins); the custkey bump marks the applied update
UPSERT_BUMP = 1_000_000


@query(
    "q_merge_upsert",
    oracle=f"""
    WITH merged AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderkey % 10 <> 0 AND o_orderkey % 5 <> 0
        UNION ALL
        SELECT o_orderkey, o_custkey + {UPSERT_BUMP}, o_totalprice
        FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT o_orderkey % 10 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM merged GROUP BY bucket ORDER BY bucket
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-upsert into a written parquet target (plans/incremental.py
    merge_upsert — the format-agnostic MERGE): the target snapshot holds
    orders with o_orderkey % 10 != 0; the increment delivers every
    % 5 == 0 key TWICE (two versions, _seq 1 then 2, custkey bumped by
    {UPSERT_BUMP // 2} then {UPSERT_BUMP}) — so odd multiples of 5 are
    UPDATES of existing rows, multiples of 10 are INSERTS, and the
    in-increment dedup window must pick _seq 2. The per-bucket rollup of
    the merged result is hash-checked against an oracle that replays the
    final state from the source table with exact integer arithmetic —
    a merge that dropped survivors, kept stale versions, or applied v1
    instead of v2 breaks the hash.

    Scale: merge_upsert broadcasts the increment's key set so the
    100 TB target side never shuffles; the only wide op is the dedup
    window WITHIN the (small) increment batch."""
    base = scratch_path("saas_lake_upsert", sf_dir)
    target_path = os.path.join(base, "target")
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    (
        orders.where(F.col("o_orderkey") % 10 != 0)
        .select(*cols)
        .write.mode("overwrite")
        .parquet(target_path)
    )
    inc_base = orders.where(F.col("o_orderkey") % 5 == 0)
    versions = [
        inc_base.select(
            "o_orderkey",
            (F.col("o_custkey") + F.lit(bump)).alias("o_custkey"),
            "o_totalprice",
            F.lit(seq).alias("_seq"),
        )
        for seq, bump in ((1, UPSERT_BUMP // 2), (2, UPSERT_BUMP))
    ]
    increment = versions[0].unionByName(versions[1])

    from saas_analytics_pipeline_spark.plans.incremental import merge_upsert

    merged = merge_upsert(spark, target_path, increment, "o_orderkey", "_seq")
    return (
        merged.groupBy((F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# incremental AGGREGATE maintenance: merge late-arriving facts into a
# persisted partial-aggregate mart without rescanning history
# --------------------------------------------------------------------------
LATE_MOD = 10  # o_orderkey % 10 == 0 -> the late-arriving delta batch

_INCR_GRAIN = ["order_month", "o_orderpriority"]


def rollup_partials(orders: DataFrame) -> DataFrame:
    """Mergeable per-(month, priority) partials: COUNT, exact DECIMAL(18,2)
    SUM, and MAX — the algebraic aggregate state an incremental mart
    persists. Partials of partials merge with the SAME three functions
    (sum of counts, sum of sums, max of maxes), which is what makes the
    delta merge below exact rather than approximate."""
    return orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)")).alias("max_price"),
    )


def merge_rollup_partials(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two partial frames at the same grain: union -> re-aggregate
    with the merge functions. count/sum/max are algebraic, so
    merge(state, agg(delta)) == agg(state_rows + delta_rows) exactly —
    the identity q_rollup_incremental hash-certifies."""
    return (
        state.unionByName(delta)
        .groupBy(*_INCR_GRAIN)
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("sum_price").alias("sum_price"),
            F.max("max_price").alias("max_price"),
        )
    )


@query(
    "q_rollup_incremental",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_rev,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS max_price,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-mart maintenance: the monthly revenue rollup
    is maintained from a PERSISTED partial-aggregate state plus a
    late-arriving delta batch — history is never rescanned. State =
    (month, priority) partials (count / exact-decimal sum / max) over the
    on-time facts (o_orderkey % {LATE_MOD} != 0), WRITTEN to parquet and
    read back (the mart a daily job keeps on disk); delta = the late
    facts (% {LATE_MOD} == 0 — late rows land in EVERY month, so the
    merge exercises partial-merge on every group, not just a tail
    partition); merge = union + re-aggregate with the merge functions
    (sum-of-counts, sum-of-sums, max-of-maxes). The hash-green oracle is
    the FULL recompute over all orders — certifying the defining
    invariant of incremental aggregation: merge(state, agg(delta)) ==
    agg(everything). AVG finalizes from merged partials (sum/count) —
    the canonical non-mergeable-unless-partials aggregate.

    Scale: the state is |months x priorities| rows regardless of fact
    volume — the delta scan is the only fact-sized read per refresh
    (measured cousin: incremental SCD2, tools/scd2_probe.py 2.7x at 30
    versions; here the win is unbounded — full recompute scans ALL
    history, merge scans |delta| + |state|). Both aggregations are
    partial-aggregable (map-side combine); DECIMAL sums are exact and
    order-independent, so the merged mart hash-matches the recompute
    bit-for-bit. In production the state table partitions by month and
    the merge rewrites only months present in the delta (dynamic
    partition overwrite — the q_partition_overwrite mechanics).

    Ref: the reference's incremental daily loads (README.md:82,24) move
    ROWS incrementally (merge-upsert, q_merge_upsert); this moves
    AGGREGATES incrementally — the mart-layer sibling."""
    base = scratch_path("saas_lake_incr_rollup", sf_dir)
    state_path = os.path.join(base, "state")
    orders = load_table(spark, sf_dir, "orders")
    ontime = orders.where(F.col("o_orderkey") % LATE_MOD != 0)
    late = orders.where(F.col("o_orderkey") % LATE_MOD == 0)
    # the persisted mart: partials written once by the on-time load
    rollup_partials(ontime).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)
    # the refresh: aggregate ONLY the delta, merge into the state
    merged = merge_rollup_partials(state, rollup_partials(late))
    return merged.select(
        F.col("order_month").cast("date").alias("order_month"),
        "o_orderpriority",
        "n_orders",
        F.col("sum_price").cast("double").alias("total_rev"),
        F.col("max_price").cast("double").alias("max_price"),
        F.round(
            F.col("sum_price").cast("double") / F.col("n_orders"), 4
        ).alias("avg_price"),
    ).orderBy("order_month", "o_orderpriority")


CDC_DEL_MOD = 11  # o_orderkey % 11 == 0 -> a delete (tombstone) event


@query(
    "q_cdc_apply",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey, c_acctbal, c_nationkey FROM customer
        WHERE c_custkey % 7 <> 0
    ),
    chg AS (
        SELECT o_custkey AS k, o_orderkey AS seq,
               CASE WHEN o_orderkey % {CDC_DEL_MOD} = 0
                    THEN 'D' ELSE 'U' END AS op,
               o_totalprice AS bal,
               o_custkey % 25 AS nat
        FROM orders
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                          ORDER BY seq DESC) AS rn
            FROM chg
        ) WHERE rn = 1
    ),
    final AS (
        SELECT c_nationkey AS nat, c_acctbal AS bal, 0 AS from_cdc
        FROM base WHERE c_custkey NOT IN (SELECT k FROM latest)
        UNION ALL
        SELECT nat, bal, 1 AS from_cdc FROM latest WHERE op = 'U'
    )
    SELECT nat AS c_nationkey,
           COUNT(*) AS n_rows,
           CAST(SUM(from_cdc) AS BIGINT) AS n_from_cdc,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM final GROUP BY nat ORDER BY c_nationkey
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log replay with DELETES — merge_upsert's missing half (the
    Debezium-consumer shape): a synthesized change log (one event per
    order on its customer: seq = o_orderkey, every {CDC_DEL_MOD}th a
    tombstone, the rest upsert after-images) applies to the customer
    snapshot (c_custkey % 7 != 0, so some upserts are true INSERTS and
    some tombstones hit absent keys — the no-op case) via
    plans/incremental.apply_cdc: last-writer-wins by sequence number
    INDEPENDENT of arrival order, winning 'D' removes the key, winning
    'U' upserts, untouched keys pass through. The hash-green rollup
    (per-nation row counts, CDC-provenance counts, exact-decimal
    balance totals) certifies the final state against a full SQL
    replay — a consumer that applied ops in arrival order, kept stale
    versions, resurrected tombstones, or dropped insert-upserts breaks
    the hash.

    Scale: the last-writer-wins window is WITHIN the change batch; the
    batch's key set broadcasts into the snapshot anti-join so the
    100 TB base never shuffles (apply_cdc docstring). The provenance
    column costs nothing (literal per side of the union).

    Ref: reference plans per-day incremental loads (README.md:82,24);
    CDC-with-deletes is the production generalization."""
    customers = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = customers.where(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        "c_acctbal",
        "c_nationkey",
        F.lit(0).alias("from_cdc"),
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        (F.col("o_custkey") % 25).alias("c_nationkey"),
        F.lit(1).alias("from_cdc"),
        F.col("o_orderkey").alias("_seq"),
        F.when(F.col("o_orderkey") % CDC_DEL_MOD == 0, "D")
        .otherwise("U")
        .alias("op"),
    )
    from saas_analytics_pipeline_spark.plans.incremental import apply_cdc

    final = apply_cdc(base, changes, "c_custkey", "_seq")
    return (
        final.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("from_cdc").cast("long").alias("n_from_cdc"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# bucketed co-located join, keyed (the bucket_probe / test_plans shape
# promoted to a hash-green result-identity certificate)
# --------------------------------------------------------------------------
_BUCKET_CONFS = {
    # neither side of a 100 TB fact-fact join broadcasts; force the
    # bucket-SMJ regime the certificate is about (scoped + restored)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bucket_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The certified frame: both fact sides written as 32-bucket managed
    tables on the join key (plans/writers.write_bucketed — one shuffle
    each, paid at WRITE time), then the orderkey equi-join + per-priority
    rollup reads pre-partitioned, pre-sorted buckets: zero Exchanges,
    zero Sorts on either side (pinned by tests/test_plans.py both for
    write_bucketed and for this frame)."""
    from saas_analytics_pipeline_spark.plans.writers import write_bucketed

    # sanitized tag (sf_tag strips every non-identifier char, ADVICE r07)
    # + backtick quoting below, so a hostile sf_dir basename can neither
    # break nor inject into the DROP statement
    tag = sf_tag(sf_dir)
    t_orders, t_items = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    base = scratch_path("saas_lake_bucket", sf_dir)
    # EXTERNAL tables at a per-user scratch location (not the
    # cwd-dependent warehouse); a FRESH session's catalog doesn't know a
    # previous session's tables, so drop the entry if present AND clear
    # the leftover location before overwriting
    import shutil

    for t in (t_orders, t_items):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")
        shutil.rmtree(os.path.join(base, t), ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    items = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, t_orders, "o_orderkey", path=os.path.join(base, t_orders))
    write_bucketed(items, t_items, "o_orderkey", path=os.path.join(base, t_items))
    return (
        spark.table(t_orders)
        .join(spark.table(t_items), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_bucket_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join as a KEYED result-identity certificate
    (the q_bloom_prejoin argument applied to bucketing): both fact
    sides are bucketed+sorted on the join key at write time
    (write_bucketed), the orderkey join + rollup then runs with ZERO
    Exchanges and ZERO Sorts on either side (plan pinned in
    tests/test_plans.py; measured 3 Exchanges -> 1 overall and the
    wall-clock win in tools/bucket_probe.py at sf3), and the hash-green
    oracle row certifies the bucketed plan is semantically transparent:
    bit-identical rollup to the plain SQL join, duplicate-key fan-out
    (the testdata's dirty lineitem dupes) included.

    Conf scoping: broadcast is disabled while the frame materializes
    (neither side of a 100 TB fact-fact join broadcasts — the regime
    the certificate is about), eager localCheckpoint, confs restored —
    the q_bloom_prejoin / write_zordered discipline.

    Scale: the bucket write is one shuffle per side paid ONCE;
    every subsequent join on the key reads co-located buckets — the
    amortization a daily orders x lineitem pipeline banks on. The
    rollup is partial-aggregable above the co-located join."""
    prev = {k: spark.conf.get(k, None) for k in _BUCKET_CONFS}
    for k, v in _BUCKET_CONFS.items():
        spark.conf.set(k, v)
    try:
        return bucket_join_frame(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# multi-format connector roundtrip, keyed: every interchange format the
# engine writes must read back bit-identically
# --------------------------------------------------------------------------
_RT_FORMATS = ("parquet", "orc", "json", "csv")
_RT_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double"
)


@query(
    "q_format_roundtrip",
    oracle="""
    WITH h AS (
        SELECT CAST('0x' || substr(md5(
               concat_ws('|', CAST(o_orderkey AS VARCHAR),
                         CAST(o_custkey AS VARCHAR), o_orderstatus,
                         CAST(o_totalprice AS VARCHAR))), 1, 15) AS BIGINT)
               AS rh
        FROM orders
    ),
    agg AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(rh AS HUGEINT)) AS VARCHAR) AS checksum_sum,
               bit_xor(rh) AS checksum_xor
        FROM h
    )
    SELECT f.fmt, a.n_rows, a.checksum_sum, a.checksum_xor
    FROM (VALUES ('csv'), ('json'), ('orc'), ('parquet')) f(fmt)
    CROSS JOIN agg a
    ORDER BY f.fmt
    """,
)
def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format connector certificate: the orders slice is WRITTEN in
    every supported interchange format (parquet / ORC / JSON-lines /
    CSV — ingest.write_table_format), READ BACK under the explicit
    contract schema (load_table_format — JSON/CSV carry none), and
    fingerprinted with the q_table_checksum content hash. The oracle
    expects the SOURCE table's fingerprint once per format, so ANY loss
    in any connector — a double that stopped round-tripping through
    CSV text, a NULL that became '', a row dropped by a malformed-line
    policy, a type the ORC writer narrowed — breaks that format's hash
    row. This certifies the lossless-interchange claim (§2.1 sources/
    sinks) instead of asserting it.

    Scale: per format one truncate-write + one scan + an order-
    insensitive (count, decimal-sum, bit_xor) reduce — both reductions
    commutative+associative, so partitioning- and format-layout-
    independent; no shuffles beyond the 1-row aggregates.

    Ref: reference loads CSV into the warehouse and plans JSON seeds
    (data_gen/generate_and_load_script.py:188, README.md:21-23); this
    pins all four interchange paths."""
    from saas_analytics_pipeline_spark.functions import hash60
    from saas_analytics_pipeline_spark.ingest import (
        load_table_format,
        write_table_format,
    )

    base = scratch_path("saas_lake_fmt_rt", sf_dir)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    row_hash = hash60(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        )
    )
    per_fmt = []
    for fmt in _RT_FORMATS:
        path = os.path.join(base, fmt)
        write_table_format(src, path, fmt)
        back = load_table_format(spark, path, fmt, _RT_SCHEMA)
        per_fmt.append(
            back.agg(
                F.count("*").alias("n_rows"),
                F.sum(row_hash.cast("decimal(38,0)"))
                .cast("string")
                .alias("checksum_sum"),
                F.bit_xor(row_hash).alias("checksum_xor"),
            ).select(F.lit(fmt).alias("fmt"), "*")
        )
    out = per_fmt[0]
    for df in per_fmt[1:]:
        out = out.unionByName(df)
    return out.orderBy("fmt")


# --------------------------------------------------------------------------
# dynamic partition pruning, keyed: the star-schema scan killer — a
# selective dim filter prunes the partitioned fact's scan AT RUNTIME
# --------------------------------------------------------------------------
DPP_BUCKETS = 16  # fact partition key: o_custkey % DPP_BUCKETS


def write_dpp_fact(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the partitioned fact: orders written partitionBy the
    derived o_bucket column (one dynamic-overwrite, the test lake's
    stateless-rematerialization rule). At 100 TB this is the lake's
    standing layout (partition by date/tenant/bucket), not a per-query
    cost."""
    base = scratch_path("saas_lake_dpp", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_bucket", F.col("o_custkey") % DPP_BUCKETS)
        .write.mode("overwrite")
        .partitionBy("o_bucket")
        .parquet(base)
    )
    return base


def dpp_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The certified frame: partitioned fact joined to the FILTERED dim
    on the partition column — Catalyst injects a
    dynamicpruningexpression into the fact scan's PartitionFilters
    (plan-guarded in tests/test_plans.py), so only the dim's surviving
    buckets are listed and read."""
    fact = spark.read.parquet(write_dpp_fact(spark, sf_dir))
    dim = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_regionkey") == 0)
        .select(
            "n_name", (F.col("n_nationkey") % DPP_BUCKETS).alias("o_bucket")
        )
    )
    return (
        fact.join(dim, "o_bucket")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("n_name")
    )


@query(
    "q_dpp_prune",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN nation n ON o.o_custkey % {DPP_BUCKETS} = n.n_nationkey % {DPP_BUCKETS}
                  AND n.n_regionkey = 0
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning as a KEYED result-identity certificate
    (the q_bloom_prejoin / q_bucket_join argument applied to DPP): the
    fact table lives partitioned by a bucket key, the dim side filters
    to a selective slice (region-0 nations -> a few surviving buckets),
    and at planning time Catalyst injects a dynamicpruningexpression
    into the fact scan's PartitionFilters — the runtime twin of static
    partition pruning, fed by the dim's broadcast — so the fact scan
    lists and reads ONLY the surviving buckets instead of all
    {DPP_BUCKETS}. Injection is plan-guarded in tests/test_plans.py;
    the hash-green oracle row certifies pruning is semantically
    transparent (bit-identical rollup to the unpartitioned SQL join).

    Scale: THE star-schema mechanism at 100 TB — a date/tenant-
    partitioned fact joined through a filtered dimension reads the
    matching partitions only; without DPP the scan is full regardless
    of the dim filter. Pairs with q_bloom_prejoin (row-level runtime
    filtering) — DPP kills whole partitions, the bloom filter kills
    surviving rows.

    Ref: reference partitions raw by source/date (README.md:24);
    partition-wise cost hygiene (README.md:90-91)."""
    return dpp_join_frame(spark, sf_dir).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Atomic publish certificate: manifest/rename commit, torn writer invisible
# ---------------------------------------------------------------------------

# the committed correction: custkey bump applied to every 7th order
PUB_BUMP = 3_000_000


@query(
    "q_atomic_publish",
    oracle=f"""
    WITH committed AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0
                    THEN o_custkey + {PUB_BUMP} ELSE o_custkey END
                   AS o_custkey,
               o_totalprice
        FROM orders
    )
    SELECT 'tx2' AS txid,
           o_orderkey % 10 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM committed GROUP BY bucket ORDER BY bucket
    """,
)
def q_atomic_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic multi-partition publish certificate (plans/publish.py —
    the manifest/rename commit protocol, verdict r07 #5): publish
    snapshot tx1 (raw orders), publish the tx2 correction (custkey
    bumped on every 7th key), then CRASH a poisoned tx3 publish (prices
    zeroed, custkeys negated) at the most dangerous barrier — manifest
    durable on disk, pointer swap never executed. The read path resolves
    _CURRENT -> manifest -> explicit file list, so the rollup (and the
    txid column read from the pointer itself) must equal the tx2 state
    bit-for-bit; if the torn tx3 data or manifest leaked into the read,
    every row of the hash breaks. The full barrier matrix (crash at
    after-data / after-manifest / first-publish, snapshot isolation for
    in-flight readers, vacuum safety) is pinned by tests/test_publish.py.

    Scale: the protocol costs two tiny fsync'd files + two renames per
    publish regardless of snapshot size; readers never list directories.
    On an object store the pointer swap becomes a conditional PUT.

    Ref: the reference's loads are WRITE_TRUNCATE
    (data_gen/generate_and_load_script.py:188) — no crash story; this is
    the 100 TB-safe replacement."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_publish", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    P.publish_snapshot(spark, orders, root, "tx1")
    corrected = orders.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_custkey") + PUB_BUMP
        ).otherwise(F.col("o_custkey")),
    )
    P.publish_snapshot(spark, corrected, root, "tx2")
    poisoned = orders.withColumn(
        "o_custkey", -F.col("o_custkey")
    ).withColumn("o_totalprice", F.lit(0.0))

    def die(barrier: str) -> None:
        if barrier == P.AFTER_MANIFEST:
            raise RuntimeError("writer killed mid-commit")

    try:
        P.publish_snapshot(spark, poisoned, root, "tx3", crash_hook=die)
    except RuntimeError:
        pass
    cur = P.current_manifest(root)
    return (
        P.read_current(spark, root)
        .groupBy((F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(F.lit(cur["txid"]).alias("txid"), "*")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Publish lifecycle certificate (r09): replay idempotency + retention vacuum
# ---------------------------------------------------------------------------

# the two committed corrections, applied cumulatively
LC_BUMP1 = 1_000_000
LC_BUMP2 = 5_000_000


@query(
    "q_publish_lifecycle",
    oracle=f"""
    WITH committed AS (
        SELECT o_orderkey,
               o_custkey
               + CASE WHEN o_orderkey % 3 = 0 THEN {LC_BUMP1} ELSE 0 END
               + CASE WHEN o_orderkey % 4 = 0 THEN {LC_BUMP2} ELSE 0 END
                   AS o_custkey,
               o_totalprice
        FROM orders
    )
    SELECT 'b3' AS txid,
           CAST(2 AS BIGINT) AS n_manifests,
           CAST(2 AS BIGINT) AS n_snapshots,
           o_orderkey % 10 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM committed GROUP BY bucket ORDER BY bucket
    """,
)
def q_publish_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish protocol's full production lifecycle in one hash
    (r09, verdict r08 #2/#4): batch-keyed REPLAY idempotency plus the
    retention-grace vacuum, end to end:

    1. publish b1 (raw orders), b2 (b1 + the %3 custkey bump) via
       ensure_published — the stream-replay entry point;
    2. a b3 publish (b2 + the %4 bump) CRASHES after its data lands but
       before the manifest; the replay of b3 reclaims the uncommitted
       leftover and commits — exactly one b3 snapshot, bit-identical to
       a never-crashed run;
    3. a STALE replay of b2 afterwards (late duplicate delivery,
       poisoned frame) must be skipped by the seq guard — the pointer
       stays on b3 and nothing is written;
    4. vacuum(retain=1) keeps b3 + b2 (the snapshot-isolation grace for
       in-flight readers) and reclaims only b1.

    The returned rollup reads the final committed state and pins the
    surviving manifest/snapshot COUNTS into the hash — a replay that
    double-published, a stale replay that regressed the pointer, or a
    vacuum that over- or under-reclaimed each breaks a literal column.

    Scale: three tiny fsync'd files + renames per publish regardless of
    snapshot size; vacuum is a manifest-lineage walk (metadata-only).

    Ref: the reference's loads ride BigQuery's atomic WRITE_TRUNCATE
    (data_gen/generate_and_load_script.py:188); this is the replayable,
    retained equivalent a 100 TB lake needs."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_lifecycle", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v1 = orders
    v2 = v1.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_custkey") + LC_BUMP1
        ).otherwise(F.col("o_custkey")),
    )
    v3 = v2.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 4 == 0, F.col("o_custkey") + LC_BUMP2
        ).otherwise(F.col("o_custkey")),
    )
    P.ensure_published(spark, v1, root, "b1")
    P.ensure_published(spark, v2, root, "b2")

    def die(barrier: str) -> None:
        if barrier == P.AFTER_DATA:
            raise RuntimeError("writer killed before the manifest")

    try:
        P.ensure_published(spark, v3, root, "b3", crash_hook=die)
    except RuntimeError:
        pass
    P.ensure_published(spark, v3, root, "b3")  # the replay commits
    poisoned = v1.withColumn("o_custkey", -F.col("o_custkey"))
    P.ensure_published(spark, poisoned, root, "b2")  # stale: must skip
    P.vacuum(root, retain=1)  # keeps b3 + b2, reclaims b1
    cur = P.current_manifest(root)
    n_manifests = len(os.listdir(os.path.join(root, "manifests")))
    n_snapshots = len(os.listdir(os.path.join(root, "data")))
    return (
        P.read_current(spark, root)
        .groupBy((F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.lit(cur["txid"]).alias("txid"),
            F.lit(n_manifests).cast("long").alias("n_manifests"),
            F.lit(n_snapshots).cast("long").alias("n_snapshots"),
            "*",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Registry build certificate (r09): the dbt-style DAG build, crash-atomic
# ---------------------------------------------------------------------------


@query(
    "q_registry_build",
    oracle="""
    WITH stg AS (
        SELECT o_custkey, o_totalprice, o_orderdate
        FROM orders WHERE o_totalprice > 0
    )
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM stg GROUP BY month ORDER BY month
    """,
)
def q_registry_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layered ELT build end to end, keyed (r09): a staging VIEW ->
    mart TABLE DAG built through the model registry, whose TABLE
    materializations publish via the atomic manifest/rename protocol
    (registry.py, verdict r08 #1). The key builds the mart, then
    CRASHES a poisoned rebuild (prices negated) at the most dangerous
    barrier — manifest durable, pointer never swapped — and finally
    re-reads the mart through the committed pointer: the hash must
    equal the clean build exactly, proving a crashed `dbt build` cannot
    tear a mart (the guarantee the reference inherits from BigQuery's
    atomic writes, `dbt_project.yml:26-43`, re-established here on
    plain parquet).

    Scale: the build is one Catalyst-planned job per mart (views inline
    into the mart plan); the publish adds two tiny files + two renames.

    Ref: models/ layering `README.md:34-41`; materialization contract
    `dbt_project.yml:26-43`."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.registry import (
        Materialization,
        ModelRegistry,
    )

    poison = {"on": False}
    reg = ModelRegistry()

    @reg.model("rb_stg_orders", layer="staging")
    def rb_stg_orders(spark_, ref):
        df = load_table(spark_, sf_dir, "orders").where(
            F.col("o_totalprice") > 0
        )
        if poison["on"]:
            df = df.withColumn("o_totalprice", -F.col("o_totalprice"))
        return df

    @reg.model(
        "rb_mart_monthly",
        layer="marts",
        materialization=Materialization.TABLE,
        depends_on=("rb_stg_orders",),
    )
    def rb_mart_monthly(spark_, ref):
        return (
            ref("rb_stg_orders")
            .groupBy(
                F.date_trunc("month", "o_orderdate").cast("date").alias("month")
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.countDistinct("o_custkey").cast("long").alias("n_customers"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
        )

    wh = scratch_path("saas_registry_build", sf_dir)
    shutil.rmtree(wh, ignore_errors=True)
    reg.build(spark, warehouse_dir=wh)  # the clean, committed build

    poison["on"] = True

    def die(barrier: str) -> None:
        if barrier == P.AFTER_MANIFEST:
            raise RuntimeError("build killed mid-commit")

    try:
        reg.build(spark, warehouse_dir=wh, crash_hook=die)
    except RuntimeError:
        pass
    return P.read_current(spark, f"{wh}/marts/rb_mart_monthly").orderBy(
        "month"
    )


# ---------------------------------------------------------------------------
# Time travel + manifest-side partition pruning certificates (r09)
# ---------------------------------------------------------------------------

TT_BUMP = 7_000_000  # v2's correction: custkey bumped on every 5th key


@query(
    "q_time_travel",
    oracle=f"""
    WITH v1 AS (
        SELECT 1 AS version, o_orderkey, o_custkey, o_totalprice FROM orders
    ),
    v2 AS (
        SELECT 2 AS version, o_orderkey,
               CASE WHEN o_orderkey % 5 = 0
                    THEN o_custkey + {TT_BUMP} ELSE o_custkey END,
               o_totalprice
        FROM orders
    ),
    both_v AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT version,
           o_orderkey % 10 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM both_v GROUP BY version, bucket ORDER BY version, bucket
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel over the publish lineage (r09): two
    publish_next builds of the same table (v2 bumps every 5th custkey),
    then BOTH versions read back — the current one through the pointer,
    the superseded one via read_snapshot(seq=1) over the immutable
    retained snapshot. The per-version rollups must equal the source
    replay of each state exactly: a v1 read that leaked v2 files (or
    vice versa) breaks half the hash rows. This is the Iceberg/Delta
    VERSION AS OF semantics on plain parquet — what an audit, a
    reproducible-training run, or a diff job needs from the lake.

    Scale: time travel is a manifest open (one tiny JSON) + the same
    explicit-file-list scan as any read; history depth is bounded by
    vacuum's retention knob, so storage cost is chosen, not accidental.

    Ref: the reference's WRITE_TRUNCATE loads keep no history
    (data_gen/generate_and_load_script.py:188); BigQuery offers this
    same property as time travel — re-established here."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_timetravel", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    P.publish_next(spark, orders, root)  # seq 1
    v2 = orders.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_custkey") + TT_BUMP
        ).otherwise(F.col("o_custkey")),
    )
    P.publish_next(spark, v2, root)  # seq 2 = current

    def rollup(df: DataFrame, version: int) -> DataFrame:
        return (
            df.groupBy((F.col("o_orderkey") % 10).alias("bucket"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("o_custkey").cast("long").alias("sum_custkey"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_price"),
            )
            .select(F.lit(version).alias("version"), "*")
        )

    past = P.read_snapshot(spark, root, seq=1)
    current = P.read_current(spark, root)
    return rollup(past, 1).unionByName(rollup(current, 2)).orderBy(
        "version", "bucket"
    )


@query(
    "q_partition_pruned_read",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS dt,
           CAST(1 AS BIGINT) AS n_files_read,
           (SELECT COUNT(DISTINCT date_trunc('month', o_orderdate))
            FROM orders) AS n_partitions_total,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM orders
    WHERE CAST(date_trunc('month', o_orderdate) AS DATE) = DATE '{OVW_MONTH}'
    GROUP BY dt
    """,
)
def q_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-side partition pruning (r09): the month-partitioned lake
    is loaded atomically (write_day_increment ->
    publish_partition_overwrite), then ONE month is read back through
    read_partitions — the manifest's partition->files index resolves the
    read to exactly that month's file list, no directory listing, no
    footer reads for other months. The file count is IN THE HASH
    (n_files_read = 1: the per-day hash shuffle puts each month in one
    file) next to the total partition count, so a read that listed more
    files than the target month's, or a load that fragmented the month,
    breaks the row.

    Scale: at 100 TB a day-scoped consumer opens one manifest (tiny
    JSON) + its day's files; the alternative — S3-listing a
    million-object lake and letting Spark prune dirs — costs minutes of
    metadata ops before the first byte. The manifest IS the partition
    index (the Iceberg manifest-list read path on plain parquet).

    Ref: raw partitions by source/date `/root/reference/README.md:24`;
    this key adds the scalable read side of that layout."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.plans.incremental import (
        write_day_increment,
    )

    base = scratch_path("saas_lake_pruned_read", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("om"),
    )
    write_day_increment(spark, orders, base, "om")
    month, n_files = P.read_partitions(spark, base, [OVW_MONTH])
    n_total = len(P.current_manifest(base)["partitions"])
    return (
        month.groupBy("dt")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        )
        .select(
            "dt",
            F.lit(n_files).cast("long").alias("n_files_read"),
            F.lit(n_total).cast("long").alias("n_partitions_total"),
            "n_rows",
            "sum_custkey",
        )
    )


# ---------------------------------------------------------------------------
# Lake history certificate (r09): the manifest lineage as a queryable table
# ---------------------------------------------------------------------------

LH_BUMP1 = 2_000_000
LH_BUMP2 = 9_000_000


@query(
    "q_lake_history",
    oracle=f"""
    WITH v1 AS (
        SELECT 1 AS seq, 't1' AS txid, o_orderkey, o_custkey FROM orders
    ),
    v2 AS (
        SELECT 2, 't2', o_orderkey,
               CASE WHEN o_orderkey % 3 = 0
                    THEN o_custkey + {LH_BUMP1} ELSE o_custkey END
        FROM orders
    ),
    v3 AS (
        SELECT 3, 't3', o_orderkey,
               o_custkey
               + CASE WHEN o_orderkey % 3 = 0 THEN {LH_BUMP1} ELSE 0 END
               + CASE WHEN o_orderkey % 4 = 0 THEN {LH_BUMP2} ELSE 0 END
        FROM orders
    ),
    hist AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL
        SELECT * FROM v3
    )
    SELECT seq, txid,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM hist GROUP BY seq, txid ORDER BY seq
    """,
)
def q_lake_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW HISTORY over the publish lineage (r09): three builds of the
    same table (publish_next — t1 raw, t2 bumps %3 custkeys, t3 adds a
    %4 bump), with a POISONED build crashed after its manifest lands
    between t2 and t3 (the orphan's seq is reclaimed by the next
    publish, so it must never appear in history). The key walks the
    parent chain and re-reads EVERY version through its manifest; each
    version's rollup must equal the source replay of that build —
    history that skipped a version, surfaced the crashed orphan, or
    read any version's files torn breaks its row.

    Scale: the walk opens one tiny JSON per retained version; each
    version's read is the same explicit-file-list scan as read_current;
    history depth is vacuum's retention choice.

    Ref: BigQuery time travel / dbt snapshot history — the audit
    surface the reference's WRITE_TRUNCATE loads lack."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_history", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    v2 = orders.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_custkey") + LH_BUMP1
        ).otherwise(F.col("o_custkey")),
    )
    v3 = v2.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 4 == 0, F.col("o_custkey") + LH_BUMP2
        ).otherwise(F.col("o_custkey")),
    )
    P.publish_next(spark, orders, root)
    P.publish_next(spark, v2, root)

    def die(barrier: str) -> None:
        if barrier == P.AFTER_MANIFEST:
            raise RuntimeError("poisoned build killed mid-commit")

    poisoned = orders.withColumn("o_custkey", -F.col("o_custkey"))
    try:
        P.publish_next(spark, poisoned, root, crash_hook=die)
    except RuntimeError:
        pass
    P.publish_next(spark, v3, root)  # reclaims the orphan's seq

    # the queryable history: walk the chain, re-read every version
    chain = []
    m = P.current_manifest(root)
    while m is not None:
        chain.append(m)
        parent = m.get("parent")
        m = None
        if parent:
            import json as _json
            import os as _os

            with open(_os.path.join(root, "manifests", parent)) as f:
                m = _json.load(f)
    out = None
    for man in reversed(chain):
        ver = (
            P.read_snapshot(spark, root, txid=man["txid"])
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("o_custkey").cast("long").alias("sum_custkey"),
            )
            .select(
                F.lit(int(man["seq"])).alias("seq"),
                F.lit(man["txid"]).alias("txid"),
                "n_rows",
                "sum_custkey",
            )
        )
        out = ver if out is None else out.unionByName(ver)
    return out.orderBy("seq")


# ---------------------------------------------------------------------------
# Object-store contention certificate (r10): disjoint-partition writers
# both commit under the conditional-PUT backend; overlapping fail loudly
# ---------------------------------------------------------------------------

# per-writer custkey bumps, disjoint partition slices of o_orderkey % 4
CT_BUMP_A = 100_000  # writer A -> partition 1
CT_BUMP_B = 200_000  # writer B -> partition 2 (interposes A)
CT_BUMP_C = 300_000  # writer C -> partition 3 (loses to D, must raise)
CT_BUMP_D = 400_000  # writer D -> partition 3 (interposes C)


@query(
    "q_publish_contention",
    oracle=f"""
    WITH committed AS (
        SELECT o_orderkey % 4 AS pk,
               o_custkey
               + CASE o_orderkey % 4
                     WHEN 1 THEN {CT_BUMP_A}
                     WHEN 2 THEN {CT_BUMP_B}
                     WHEN 3 THEN {CT_BUMP_D}
                     ELSE 0 END AS o_custkey
        FROM orders
    )
    SELECT 'wD' AS txid,
           CAST(4 AS BIGINT) AS final_seq,
           CAST(1 AS BIGINT) AS overlap_raised,
           pk,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM committed GROUP BY pk ORDER BY pk
    """,
)
def q_publish_contention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent partition-overwrite contention under the object-store
    conditional-PUT backend (r10, verdict r09 #3+#4), deterministically
    interleaved via the crash-hook seam:

    1. base publish: orders partitioned by pk = o_orderkey % 4;
    2. writer A overwrites partition 1; between A's manifest write and
       its conditional PUT, writer B lands a FULL commit on partition 2
       — A's CAS misses, A re-merges against B's manifest and commits:
       DISJOINT writers both land (B's day survives A's retry);
    3. writer C overwrites partition 3, interposed by writer D on the
       SAME partition — C's retry detects that its touched partition
       drifted and raises ConcurrentPublishError instead of silently
       replacing D's commit (``overlap_raised`` pins the loud failure).

    The final per-partition rollup + the committed txid/seq lineage are
    the hash: a lost update (B's or D's bump missing), a silent
    overlap overwrite (C's bump present), or a wrong retry lineage
    (seq != 5) each breaks a literal column.

    Scale: this is THE 100 TB write path — per-day backfill writers on
    an object store (no rename, no flock) committing through
    conditional PUTs; the loser's retry re-reads one manifest, no data
    rewrite.

    Ref: BigQuery gives the reference atomic per-load commits
    (data_gen/generate_and_load_script.py:188); this certifies the
    multi-writer equivalent the manifest protocol adds."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_contention", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 4).alias("pk"), "o_custkey"
    )
    be = P.CONDITIONAL_PUT

    def bumped(pk: int, bump: int) -> DataFrame:
        return orders.where(F.col("pk") == pk).withColumn(
            "o_custkey", F.col("o_custkey") + bump
        )

    P.publish_partition_overwrite(spark, orders, root, "pk", backend=be)

    def interpose_with(frame: DataFrame, txid: str):
        fired: list[bool] = []

        def hook(barrier: str) -> None:
            if barrier == P.AFTER_MANIFEST and not fired:
                fired.append(True)
                P.publish_partition_overwrite(
                    spark, frame, root, "pk", txid=txid, backend=be
                )

        return hook

    # disjoint race: A (pk=1) interposed by B (pk=2) -> both commit
    P.publish_partition_overwrite(
        spark, bumped(1, CT_BUMP_A), root, "pk", txid="wA",
        crash_hook=interpose_with(bumped(2, CT_BUMP_B), "wB"),
    )
    # overlapping race: C and D both on pk=3 -> C must fail loudly
    overlap_raised = 0
    try:
        P.publish_partition_overwrite(
            spark, bumped(3, CT_BUMP_C), root, "pk", txid="wC",
            crash_hook=interpose_with(bumped(3, CT_BUMP_D), "wD"),
        )
    except P.ConcurrentPublishError:
        overlap_raised = 1
    cur = P.current_manifest(root)
    return (
        P.read_current(spark, root)
        .groupBy("pk")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        )
        .select(
            F.lit(cur["txid"]).alias("txid"),
            F.lit(int(cur["seq"])).cast("long").alias("final_seq"),
            F.lit(overlap_raised).cast("long").alias("overlap_raised"),
            "*",
        )
        .orderBy("pk")
    )


# ---------------------------------------------------------------------------
# Replay-horizon certificate (r10): a replay OLDER than the retention
# window must not regress the table (the _APPLIED ledger, ADVICE r09)
# ---------------------------------------------------------------------------

RH_BUMP = 7_000_000  # the final committed correction (b4)


@query(
    "q_replay_horizon",
    oracle=f"""
    WITH committed AS (
        SELECT o_orderkey,
               o_custkey
               + CASE WHEN o_orderkey % 5 = 0 THEN {RH_BUMP} ELSE 0 END
                   AS o_custkey,
               o_totalprice
        FROM orders
    )
    SELECT 'b4' AS txid,
           CAST(2 AS BIGINT) AS n_manifests,
           CAST(2 AS BIGINT) AS n_snapshots,
           CAST(2 AS BIGINT) AS n_ledgered,
           o_orderkey % 10 AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM committed GROUP BY bucket ORDER BY bucket
    """,
)
def q_replay_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vacuumed-replay guard keyed (r10, ADVICE r09): the seq guard
    alone protects replays only while the superseded manifest exists;
    once vacuum removes it, a LATE replay (a resurrected stream
    checkpoint older than the retention window) would fall through to
    a fresh publish and commit its stale frame as the newest snapshot.
    The durable ``_APPLIED`` ledger closes that hole:

    1. ensure_published b1, b2, b3 (three corrections of orders);
    2. vacuum(retain=0): b1/b2 manifests removed, ledgered as applied;
    3. a POISONED replay of b1 (negated custkeys — loud if it leaks)
       must be recognized as already-applied and skipped entirely;
    4. a genuinely new batch b4 (the %5 bump) still publishes fine.

    The hash pins the final rollup (poison absent, b4 present) plus the
    manifest/snapshot/ledger counts — a regressed pointer, a
    re-committed stale frame, or an over-eager ledger (blocking b4)
    each breaks a literal column.

    Scale: the ledger grows ~30 bytes per vacuumed commit (metadata);
    replay recognition is one dict lookup, no data touched."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_replay_horizon", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = orders.withColumn("o_custkey", F.col("o_custkey") + 1)
    v3 = orders.withColumn("o_custkey", F.col("o_custkey") + 2)
    v4 = orders.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_custkey") + RH_BUMP
        ).otherwise(F.col("o_custkey")),
    )
    P.ensure_published(spark, orders, root, "b1")
    P.ensure_published(spark, v2, root, "b2")
    P.ensure_published(spark, v3, root, "b3")
    P.vacuum(root, retain=0)  # b1/b2 leave the retention window
    poisoned = orders.withColumn("o_custkey", -F.col("o_custkey"))
    P.ensure_published(spark, poisoned, root, "b1")  # ancient replay
    P.ensure_published(spark, v4, root, "b4")  # fresh batch still lands
    cur = P.current_manifest(root)
    n_manifests = len(
        [f for f in os.listdir(os.path.join(root, "manifests"))]
    )
    n_snapshots = len(os.listdir(os.path.join(root, "data")))
    n_ledgered = len(P._applied_ledger(root))
    return (
        P.read_current(spark, root)
        .groupBy((F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        )
        .select(
            F.lit(cur["txid"]).alias("txid"),
            F.lit(n_manifests).cast("long").alias("n_manifests"),
            F.lit(n_snapshots).cast("long").alias("n_snapshots"),
            F.lit(n_ledgered).cast("long").alias("n_ledgered"),
            "*",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Table-format maintenance (r10): per-file column stats + manifest-side file
# skipping, OPTIMIZE bin-packing, merge-on-read deletes + purge — the
# Delta/Iceberg maintenance surface on plain parquet (plans/publish.py)
# ---------------------------------------------------------------------------

# file-skipping certificate: the corpus clustered into this many files by
# order date (ntile buckets — deterministic AND oracle-replayable; a
# production writer gets the identical layout from repartitionByRange,
# whose sampled bounds are layout-free but not replayable), then a
# date-band read consults the manifest's per-file min/max instead of
# opening footers. The partition value is an OPAQUE bucket id, so
# partition pruning cannot serve the date predicate — the stats are the
# only index, exactly the non-partition-column case file stats exist for.
SKIP_FILES = 16
SKIP_LO = "1996-06-01 00:00:00"
SKIP_HI = "1996-12-31 00:00:00"


@query(
    "q_stats_skipping",
    oracle=f"""
    WITH b AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               ntile({SKIP_FILES})
                   OVER (ORDER BY o_orderdate, o_orderkey) AS fb
        FROM orders
    ),
    s AS (
        SELECT fb, min(o_orderdate) AS lo, max(o_orderdate) AS hi
        FROM b GROUP BY fb
    ),
    sc AS (
        SELECT COUNT(*) AS n FROM s
        WHERE NOT (hi < TIMESTAMP '{SKIP_LO}' OR lo > TIMESTAMP '{SKIP_HI}')
    )
    SELECT CAST({SKIP_FILES} AS BIGINT) AS n_files_total,
           (SELECT CAST(n AS BIGINT) FROM sc) AS n_files_scanned,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM b
    WHERE o_orderdate BETWEEN TIMESTAMP '{SKIP_LO}'
                          AND TIMESTAMP '{SKIP_HI}'
    """,
)
def q_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-side FILE skipping over per-file column stats (r10): the
    Delta-``stats`` / Iceberg-column-metrics mechanism on plain parquet.

    Orders are clustered into {SKIP_FILES} files by (o_orderdate,
    o_orderkey) ntile buckets and published under the manifest protocol
    with the bucket id as an OPAQUE partition value; ``publish_stats``
    then records each file's [min, max] of o_orderdate and o_totalprice
    as a metadata-only commit. A date-band read (``read_skipping``)
    resolves the band to exactly the files whose recorded range
    overlaps — no directory listing, no footer opened for a skipped
    file, and no help from partition pruning (the partition value
    doesn't encode the date). The hash pins the scanned-file count
    (layout-deterministic: ntile is replayed by the oracle) and the
    exact band aggregate from the pruned-superset read — a wrong stats
    entry, an over-eager skip (lost rows), or a broken overlap test
    each breaks a column.

    Scale: at 100 TB the manifest holds ~2 numbers per file per
    annotated column; the planner prunes files BEFORE any I/O, the
    complement of partition pruning for clustered non-partition
    columns (q_layout_cluster's footer skip still applies inside the
    files that survive). publish_stats scans only stats-less files, so
    steady-state annotation cost follows the increment, not the lake.

    Ref: the reference clusters its BigQuery facts for the same reason
    (README.md:90-91 'partition + cluster keys'); file stats are the
    lake-side equivalent BigQuery does server-side."""
    import datetime
    import shutil

    from pyspark.sql import Window

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_skipping", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    # deterministic clustering: ntile over the date order (cert-sized
    # single-partition window; production = repartitionByRange)
    w = Window.orderBy("o_orderdate", "o_orderkey")
    clustered = orders.withColumn("fb", F.ntile(SKIP_FILES).over(w))
    P.publish_partition_overwrite(
        spark, clustered.repartition(F.col("fb")), root, "fb"
    )
    P.publish_stats(spark, root, ["o_orderdate", "o_totalprice"])
    lo = datetime.datetime.fromisoformat(SKIP_LO)
    hi = datetime.datetime.fromisoformat(SKIP_HI)
    pruned, n_scanned, n_total = P.read_skipping(
        spark, root, "o_orderdate", lo, hi
    )
    return (
        pruned.where(F.col("o_orderdate").between(F.lit(lo), F.lit(hi)))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.lit(n_total).cast("long").alias("n_files_total"),
            F.lit(n_scanned).cast("long").alias("n_files_scanned"),
            "*",
        )
    )


# OPTIMIZE certificate: months written fragmented (maxRecordsPerFile
# caps each month's files at this many rows — file COUNTS are then
# ceil(rows/cap), oracle-replayable, while file CONTENTS stay
# layout-free), then bin-packed to one file per month as a commit.
OPT_MRPF = 24


@query(
    "q_optimize_compact",
    oracle=f"""
    WITH m AS (
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mk,
               o_totalprice
        FROM orders
        WHERE year(o_orderdate) BETWEEN 1996 AND 1997
    ),
    c AS (SELECT mk, COUNT(*) AS cnt FROM m GROUP BY mk)
    SELECT CAST(SUM(CEIL(cnt / {OPT_MRPF}.0)) AS BIGINT) AS files_before,
           CAST(COUNT(*) AS BIGINT) AS files_after,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CASE WHEN SUM(CEIL(cnt / {OPT_MRPF}.0)) > COUNT(*)
                THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END
               AS seq_after,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(cnt) AS BIGINT) AS n_rows_pre_snapshot,
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) FROM m) AS total_price
    FROM c
    """,
)
def q_optimize_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE bin-packing as an atomic commit (r10): a month-
    partitioned orders table is deliberately published FRAGMENTED
    (maxRecordsPerFile={OPT_MRPF} — the many-small-files debt a
    per-batch streaming ingest accumulates), then ``optimize_table``
    rewrites every fragmented partition to a single file as ONE new
    snapshot: untouched partitions carry by reference, the pointer swap
    is the only commit point, and the PRE-optimize snapshot stays
    time-travelable (its row count is re-read through the superseded
    manifest and pinned equal). The hash pins files_before
    (sum of ceil(month_rows/{OPT_MRPF}) — the fragmented write's exact
    file count), files_after (= one per month), the commit seq, and the
    exact money total read back through the optimized manifest.

    Scale: OPTIMIZE reads only fragmented partitions (manifest file
    counts, no listing), writes one shuffle-free file per partition,
    and a crash at any barrier leaves readers on the fragmented-but-
    complete previous snapshot. At 100 TB this is the scheduled
    maintenance job; readers never block on it.

    Ref: BigQuery auto-compacts streaming ingest server-side; the
    reference's WRITE_TRUNCATE loads never fragment
    (data_gen/generate_and_load_script.py:188) — this is the lake-side
    equivalent the manifest protocol makes safe."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_optimize", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    # a two-year slice: the certificate needs fragmented months, not the
    # whole table — the fragmented write's small-file count (and its
    # per-file fsync) is the only thing the slice bounds
    monthly = orders.where(
        F.year("o_orderdate").between(1996, 1997)
    ).withColumn("mk", F.year("o_orderdate") * 100 + F.month("o_orderdate"))
    conf_key = "spark.sql.files.maxRecordsPerFile"
    prev_conf = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, str(OPT_MRPF))
    try:
        P.publish_partition_overwrite(
            spark, monthly.repartition(F.col("mk")), root, "mk"
        )
    finally:
        if prev_conf is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_conf)
    before = P.current_manifest(root)
    P.optimize_table(spark, root)
    after = P.current_manifest(root)
    n_pre = P.read_snapshot(spark, root, txid=before["txid"]).count()
    return (
        P.read_current(spark, root)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.lit(before["n_files"]).cast("long").alias("files_before"),
            F.lit(after["n_files"]).cast("long").alias("files_after"),
            F.lit(len(after["partitions"])).cast("long").alias(
                "n_partitions"
            ),
            F.lit(int(after["seq"])).cast("long").alias("seq_after"),
            F.col("n_rows"),
            F.lit(n_pre).cast("long").alias("n_rows_pre_snapshot"),
            F.col("total_price"),
        )
    )


# merge-on-read delete certificate: two tombstone batches (the %{MOR_A}
# and %{MOR_B} key sets), then the physical purge
MOR_PARTS = 8
MOR_A = 97
MOR_B = 89


@query(
    "q_mor_delete",
    oracle=f"""
    WITH phases AS (
        SELECT 'p1_base' AS phase, CAST(1 AS BIGINT) AS seq,
               CAST(0 AS BIGINT) AS n_tomb_files,
               CAST(0 AS BIGINT) AS n_parts_rewritten,
               COUNT(*) AS n_rows,
               CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
        FROM orders
        UNION ALL
        SELECT 'p2_mor', 3, 2, 0, COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
        FROM orders
        WHERE o_orderkey % {MOR_A} != 0 AND o_orderkey % {MOR_B} != 0
        UNION ALL
        SELECT 'p3_purged', 4, 0,
               (SELECT COUNT(DISTINCT o_orderkey % {MOR_PARTS})
                FROM orders
                WHERE o_orderkey % {MOR_A} = 0
                   OR o_orderkey % {MOR_B} = 0),
               COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
        FROM orders
        WHERE o_orderkey % {MOR_A} != 0 AND o_orderkey % {MOR_B} != 0
        UNION ALL
        SELECT 'p4_travel_del1', 2, 1, 0, COUNT(*),
               CAST(SUM(o_custkey) AS BIGINT)
        FROM orders WHERE o_orderkey % {MOR_A} != 0
    )
    SELECT * FROM phases ORDER BY phase
    """,
)
def q_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes + physical purge (r10): the GDPR shape at
    100 TB — deleting keys from a lake WITHOUT rewriting it.

    1. orders published partitioned by pk = o_orderkey % {MOR_PARTS}
       (one file each);
    2. two tombstone batches commit (keys %{MOR_A} == 0, then
       %{MOR_B} == 0) via ``publish_deletes`` — O(|keys|) writes, zero
       data files touched, and every reader anti-joins the tombstones
       the instant each pointer swaps (phase p2);
    3. ``optimize_table`` purges physically (phase p3): partitions
       containing deleted keys rewrite without them, tombstones clear,
       and the rewritten-partition count is pinned (= the distinct
       residues of the deleted keys — the purge touched exactly the
       partitions it had to);
    4. time travel proves snapshot-scoped deletes: the pre-delete
       snapshot still shows every key (p1, read after every later
       commit), the snapshot between the two batches hides only the
       first key set (p4) — each manifest carries ITS OWN tombstone
       list.

    Every phase row carries the visible row count and exact custkey
    checksum replayed by the oracle from the delete predicates — a
    leaked tombstone, an over-deleted key, a purge that missed a
    partition, or a time-travel read contaminated by a later delete
    each breaks a row.

    Scale: reads pay one anti-join against tombstone parquet the
    planner broadcasts while small; the purge consults the table's own
    file stats (publish_stats) to rewrite only overlapping files —
    a narrow key-range delete rewrites a handful of files, not the
    lake. Ref: the reference's BigQuery DML DELETE gives this
    server-side; this is the manifest-protocol equivalent."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_mor", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df = orders.withColumn("pk", F.col("o_orderkey") % MOR_PARTS)
    P.publish_partition_overwrite(
        spark, df.repartition(F.col("pk")), root, "pk"
    )
    P.publish_deletes(
        spark,
        orders.where(F.col("o_orderkey") % MOR_A == 0).select("o_orderkey"),
        root,
        "o_orderkey",
    )
    P.publish_deletes(
        spark,
        orders.where(F.col("o_orderkey") % MOR_B == 0).select("o_orderkey"),
        root,
        "o_orderkey",
    )
    mor_manifest = P.current_manifest(root)
    mor_visible = P.read_current(spark, root)

    def phase(
        tag: str, frame: DataFrame, seq: int, n_tomb: int, n_rw: int
    ) -> DataFrame:
        return frame.agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        ).select(
            F.lit(tag).alias("phase"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(n_tomb).cast("long").alias("n_tomb_files"),
            F.lit(n_rw).cast("long").alias("n_parts_rewritten"),
            "*",
        )

    p2 = phase(
        "p2_mor", mor_visible, int(mor_manifest["seq"]),
        len(mor_manifest["deletes"]), 0,
    )
    P.optimize_table(spark, root)
    cur = P.current_manifest(root)
    n_rewritten = sum(
        1
        for v, fs in cur["partitions"].items()
        if fs != mor_manifest["partitions"].get(v)
    )
    p3 = phase(
        "p3_purged", P.read_current(spark, root), int(cur["seq"]),
        len(cur.get("deletes") or []), n_rewritten,
    )
    base_m = P.snapshot_manifest(root, seq=1)
    del1_m = P.snapshot_manifest(root, seq=2)
    # p1 reads seq=1 AFTER every later commit landed, so it doubles as
    # the time-travel proof for the pre-delete snapshot
    p1 = phase(
        "p1_base", P.read_snapshot(spark, root, seq=1), 1,
        len(base_m.get("deletes") or []), 0,
    )
    p4 = phase(
        "p4_travel_del1", P.read_snapshot(spark, root, seq=2), 2,
        len(del1_m.get("deletes") or []), 0,
    )
    return (
        p1.unionByName(p2)
        .unionByName(p3)
        .unionByName(p4)
        .orderBy("phase")
    )


# ---------------------------------------------------------------------------
# Schema evolution IN the manifest protocol (r10): schema-in-log — the
# governed-table counterpart of q_schema_evolution's mergeSchema read
# ---------------------------------------------------------------------------


@query(
    "q_schema_evolution_lake",
    oracle=f"""
    WITH src AS (
        SELECT year(o_orderdate) AS yr, o_orderkey, o_totalprice,
               CASE WHEN year(o_orderdate) = 1997
                    THEN {CHANNEL_SQL} END AS ch
        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
    )
    SELECT yr,
           CAST(5 AS BIGINT) AS n_schema_fields,
           CAST(2 AS BIGINT) AS seq,
           COUNT(*) AS n_rows,
           CAST(COUNT(ch) AS BIGINT) AS n_with_channel,
           COUNT(DISTINCT ch) AS n_channels,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM src GROUP BY yr ORDER BY yr
    """,
)
def q_schema_evolution_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution THROUGH the manifest protocol (r10): the
    schema-in-log mechanism (Delta/Iceberg semantics) that
    q_schema_evolution's footer-merging read cannot give a governed
    table. Two incremental loads of a month-partitioned orders table:
    1996's months with the base columns, then 1997's months from a
    NEWER pipeline version that adds ``o_channel``. The commit evolves
    the manifest's schema record (new column appended); readers apply
    the RECORDED schema, so 1996's carried files surface o_channel as
    NULL without any footer merging — before this mechanism,
    read_current inferred from one file and silently DROPPED the new
    column for mixed-schema manifests. The hash pins the per-year
    rollup (null backfill + channel values + exact money), the evolved
    field count, and the commit seq; the rejected case — the same
    column re-written with an incompatible type — fails BEFORE any data
    write and is pinned in tests/test_publish.py.

    Scale: the manifest is the schema authority — a reader of a
    million-file table does zero footer reads to learn the schema, and
    evolution is a metadata append at commit time.

    Ref: the reference's fixed per-source contract is
    models/schema.yml:1-141; BigQuery evolves via ALTER TABLE
    server-side — this is the lake-side equivalent on plain parquet."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_schema_evo", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def month_slice(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .withColumn(
                "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
            )
            .drop("o_orderdate")
        )

    P.publish_partition_overwrite(
        spark, month_slice(1996).repartition(F.col("mk")), root, "mk"
    )
    P.publish_partition_overwrite(
        spark,
        month_slice(1997)
        .withColumn("o_channel", channel_expr())
        .repartition(F.col("mk")),
        root,
        "mk",
    )
    import json as _json

    m = P.current_manifest(root)
    n_fields = len(_json.loads(m["schema"])["fields"])
    return (
        P.read_current(spark, root)
        .groupBy(F.expr("mk div 100").cast("int").alias("yr"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_channel").cast("long").alias("n_with_channel"),
            F.countDistinct("o_channel").alias("n_channels"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            "yr",
            F.lit(n_fields).cast("long").alias("n_schema_fields"),
            F.lit(int(m["seq"])).cast("long").alias("seq"),
            "n_rows",
            "n_with_channel",
            "n_channels",
            "total_price",
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Multi-table atomic commit certificate (r10): fact + dim as ONE change
# ---------------------------------------------------------------------------

TXN_BUMP = 5_000_000  # v2 fact amount bump (loud if v2 leaks early)


@query(
    "q_txn_commit",
    oracle=f"""
    WITH fact1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amount
        FROM orders
    ),
    fact2 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2))
                   + CASE WHEN o_orderkey % 10 = 0
                          THEN {TXN_BUMP} ELSE 0 END AS amount
        FROM orders
    ),
    dim1 AS (SELECT DISTINCT o_custkey AS ck, o_custkey % 3 AS tier
             FROM orders),
    dim2 AS (SELECT DISTINCT o_custkey AS ck, (o_custkey + 1) % 3 AS tier
             FROM orders),
    v1 AS (
        SELECT tier, COUNT(*) AS n_orders,
               CAST(SUM(amount) AS DOUBLE) AS total_amount
        FROM fact1 JOIN dim1 ON o_custkey = ck GROUP BY tier
    ),
    v2 AS (
        SELECT tier, COUNT(*) AS n_orders,
               CAST(SUM(amount) AS DOUBLE) AS total_amount
        FROM fact2 JOIN dim2 ON o_custkey = ck GROUP BY tier
    )
    SELECT 'p1_v1' AS phase, CAST(1 AS BIGINT) AS seq, * FROM v1
    UNION ALL
    SELECT 'p2_after_crash', 1, * FROM v1
    UNION ALL
    SELECT 'p3_v2', 2, * FROM v2
    UNION ALL
    SELECT 'p4_travel_v1', 1, * FROM v1
    ORDER BY phase, tier
    """,
)
def q_txn_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table ATOMIC commit (r10): a fact and its dimension become
    visible as one change — the star-schema consistency the reference's
    table-at-a-time BigQuery loads can't give
    (data_gen/generate_and_load_script.py loads each table separately;
    a reader between loads joins new facts to old dims).

    ``publish_tables`` stages both tables' snapshots + manifests
    (durable, invisible), then swaps ONE catalog pointer:

    - p1: {{fact v1, dim v1}} committed and joined — baseline rollup;
    - p2: a v2 publish CRASHES after staging the dim but before the
      commit (the deterministic crash hook); the joined rollup must
      equal p1 EXACTLY — the staged v2 dim is invisible, no reader ever
      joins v1 facts to v2 tiers (per-table pointers would leak here);
    - p3: the v2 retry (same txid — staged orphans reclaimed) commits
      both tables at once: bumped amounts land in shifted tiers in the
      same instant;
    - p4: catalog time travel to seq=1 reads the CONSISTENT v1 pair.

    Per-tier order counts + exact money totals replayed by the oracle
    for both versions pin every phase; a torn commit, a leaked staged
    table, or a mixed-version join each breaks a row.

    Scale: staging cost is the data writes themselves; the commit adds
    one tiny catalog record + one pointer swap no matter how many
    tables change. Crash matrix + CAS backend + disjoint-writer merge
    in tests/test_publish.py."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    cat = scratch_path("saas_lake_txn", sf_dir)
    shutil.rmtree(cat, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    fact1 = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount"),
    )
    fact2 = fact1.withColumn(
        "amount",
        F.col("amount")
        + F.when(F.col("o_orderkey") % 10 == 0, TXN_BUMP).otherwise(0),
    )
    dim1 = orders.select(
        F.col("o_custkey").alias("ck"), (F.col("o_custkey") % 3).alias("tier")
    ).distinct()
    dim2 = orders.select(
        F.col("o_custkey").alias("ck"),
        ((F.col("o_custkey") + 1) % 3).alias("tier"),
    ).distinct()

    def rollup(tag: str, seq: int) -> DataFrame:
        f = P.read_catalog_table(spark, cat, "fact", seq=seq)
        d = P.read_catalog_table(spark, cat, "dim", seq=seq)
        return (
            f.join(d, f.o_custkey == d.ck)
            .groupBy("tier")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("amount").cast("double").alias("total_amount"),
            )
            .select(
                F.lit(tag).alias("phase"),
                F.lit(seq).cast("long").alias("seq"),
                "*",
            )
        )

    P.publish_tables(spark, {"fact": fact1, "dim": dim1}, cat)
    p1 = rollup("p1_v1", 1)

    class _Boom(RuntimeError):
        pass

    def crash_after_dim(barrier: str) -> None:
        if barrier == "staged:dim":
            raise _Boom(barrier)

    try:
        P.publish_tables(
            spark, {"fact": fact2, "dim": dim2}, cat, txid="v2",
            crash_hook=crash_after_dim,
        )
    except _Boom:
        pass
    cur_seq = int(P.catalog_record(cat)["seq"])  # still 1: crash invisible
    p2 = rollup("p2_after_crash", cur_seq)
    P.publish_tables(spark, {"fact": fact2, "dim": dim2}, cat, txid="v2")
    p3 = rollup("p3_v2", int(P.catalog_record(cat)["seq"]))
    p4 = rollup("p4_travel_v1", 1)
    return (
        p1.unionByName(p2)
        .unionByName(p3)
        .unionByName(p4)
        .orderBy("phase", "tier")
    )


# ---------------------------------------------------------------------------
# Bucketed manifest tables (r11, VERDICT r10 #4): the bucket spec survives
# the publish protocol, so co-located fact-fact joins work THROUGH the
# manifest layer — q_bucket_join's zero-Exchange plan with atomic commits,
# time travel, and vacuum on top
# ---------------------------------------------------------------------------

_BUCKET_MANIFEST_CONFS = {
    # neither side of a 100 TB fact-fact join broadcasts
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # publish_bucketed repartitions by the bucket hash so every bucket is
    # exactly ONE sorted file — the scan's per-bucket order is therefore
    # trustworthy; report it so the SMJ elides its Sorts (off by default
    # since SPARK-28216, which guards the many-files-per-bucket case)
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}


def bucket_manifest_phases(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The certified frames: both fact sides published through the
    manifest protocol with a recorded bucket spec (publish_bucketed),
    read back through the spec (read_bucketed), joined + rolled up —
    then (r12, VERDICT r11 #8) ``publish_deletes`` tombstones every
    10th orderkey and the SAME read path re-reads: the tombstones apply
    as an explicitly-broadcast anti-join ON TOP of the bucketed scan,
    so the fact-fact join STAYS co-located. Plan-pinned in
    tests/test_plans.py: zero Exchanges and zero Sorts below the
    SortMergeJoin in BOTH phases (the tombstone key-set's internal
    distinct lives under its BroadcastExchange — metadata-grain, not
    fact-sized).

    Returns (p1_all, p2_tombstoned); both stay valid frames — MOR
    deletes add tombstone files, they never touch the data dir p1
    scans."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    tag = sf_tag(sf_dir)
    ro = scratch_path("saas_lake_bktman_orders", sf_dir)
    ri = scratch_path("saas_lake_bktman_items", sf_dir)
    for r in (ro, ri):
        shutil.rmtree(r, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    items = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    P.publish_bucketed(spark, orders, ro, "o_orderkey", 16, "tx1")
    P.publish_bucketed(spark, items, ri, "o_orderkey", 16, "tx1")
    to = P.read_bucketed(spark, ro, f"bm_orders_{tag}")
    ti = P.read_bucketed(spark, ri, f"bm_items_{tag}")

    def rollup(o: DataFrame, phase: str) -> DataFrame:
        return (
            o.join(ti, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.countDistinct("o_orderkey").alias("n_orders"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_qty"),
            )
            .select(F.lit(phase).alias("phase"), "*")
        )

    p1 = rollup(to, "p1_all")
    P.publish_deletes(
        spark,
        orders.where((F.col("o_orderkey") % 10) == 0).select("o_orderkey"),
        ro,
        "o_orderkey",
    )
    p2 = rollup(
        P.read_bucketed(spark, ro, f"bm_orders_{tag}"), "p2_tombstoned"
    )
    return p1, p2


@query(
    "q_bucket_manifest",
    oracle="""
    WITH j AS (
        SELECT o_orderpriority, o_orderkey, l_quantity
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT 'p1_all' AS phase, o_orderpriority,
           COUNT(*) AS n_items,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM j GROUP BY o_orderpriority
    UNION ALL
    SELECT 'p2_tombstoned', o_orderpriority,
           COUNT(*), COUNT(DISTINCT o_orderkey),
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
    FROM j WHERE o_orderkey % 10 <> 0 GROUP BY o_orderpriority
    ORDER BY phase, o_orderpriority
    """,
)
def q_bucket_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed MANIFEST tables as a keyed result-identity certificate
    (r11, VERDICT r10 #4; tombstone phase r12, VERDICT r11 #8):
    ``publish_bucketed`` records (bucket col, n, sort) in the manifest
    at commit time; ``read_bucketed`` re-exposes the committed snapshot
    through a metadata-only catalog entry, so the orderkey fact-fact
    join runs with ZERO Exchanges and ZERO Sorts below the
    SortMergeJoin (plan pinned in tests/test_plans.py) — the
    q_bucket_join amortization, surviving the publish protocol's
    atomicity/time-travel/vacuum layer.

    Two hashed phases certify semantic transparency:

    - p1_all: bit-identical rollup to the plain SQL join, duplicate-key
      fan-out included;
    - p2_tombstoned: after ``publish_deletes`` tombstones every 10th
      orderkey, the SAME bucketed read path drops exactly those keys
      (the merge-on-read anti-join applies as an explicit broadcast ON
      TOP of the bucketed scan, so co-location survives — plan-pinned).

    Conf scoping: broadcast disabled (the 100 TB fact-fact regime) and
    bucketed-scan output ordering reported (sound: one sorted file per
    bucket by construction) while the frames materialize; eager
    localCheckpoint; confs restored — the q_bucket_join discipline.

    Scale: the bucket shuffle is paid ONCE at publish; every subsequent
    same-spec join — including joins across SEPARATELY-published tables
    — reads co-located pre-sorted buckets through their manifests, and
    GDPR-grain deletes cost O(keys) tombstone metadata, never a
    rewrite."""
    prev = {k: spark.conf.get(k, None) for k in _BUCKET_MANIFEST_CONFS}
    for k, v in _BUCKET_MANIFEST_CONFS.items():
        spark.conf.set(k, v)
    try:
        p1, p2 = bucket_manifest_phases(spark, sf_dir)
        return (
            p1.unionByName(p2)
            .orderBy("phase", "o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Bucketed PARTITIONED tables, keyed (r12, VERDICT r11 #5): date
# partitions + bucket-by-key co-location through the publish protocol,
# surviving incremental partition overwrites
# ---------------------------------------------------------------------------


def bucket_partitioned_frames(
    spark: SparkSession, sf_dir: str, checkpoint_phase1: bool = True
) -> tuple[DataFrame, DataFrame]:
    """The certified frames: two month-partitioned order facts (1996 and
    1997), each published bucket-by-custkey WITHIN its month partitions
    (``publish_partition_overwrite(bucket_col=...)``), read back through
    ``read_bucketed_partitioned`` and joined per customer. Returns
    (p1_initial, p2_revised): p2 re-reads after ONE month (199606) is
    incrementally overwritten with doubled prices — the daily-ingest
    flow that used to forfeit co-location under the whole-snapshot
    bucketed publish. Plan-pinned in tests/test_plans.py: zero shuffle
    Exchanges below the SortMergeJoin in both phases (per-bucket Sorts
    are partition-local and stay)."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    tag = sf_tag(sf_dir)
    ra = scratch_path("saas_lake_bktp_96", sf_dir)
    rb = scratch_path("saas_lake_bktp_97", sf_dir)
    for r in (ra, rb):
        shutil.rmtree(r, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def year_slice(y: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == y).withColumn(
            "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
        )

    a, b = year_slice(1996), year_slice(1997)
    P.publish_partition_overwrite(
        spark, a, ra, "mk", bucket_col="o_custkey", n_buckets=8
    )
    P.publish_partition_overwrite(
        spark, b, rb, "mk", bucket_col="o_custkey", n_buckets=8
    )

    def rollup(phase: str) -> DataFrame:
        n_parts = len(P.current_manifest(ra)["partitions"])
        seq = int(P.current_manifest(ra)["seq"])
        ta = P.read_bucketed_partitioned(spark, ra, f"bp96_{tag}")
        tb = P.read_bucketed_partitioned(spark, rb, f"bp97_{tag}")

        def per_cust(t: DataFrame, out: str) -> DataFrame:
            return t.groupBy("o_custkey").agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(out)
            )

        return (
            per_cust(ta, "rev96")
            .join(per_cust(tb, "rev97"), "o_custkey")
            .groupBy((F.col("o_custkey") % 7).alias("cg"))
            .agg(
                F.count("*").alias("n_cust"),
                F.sum("rev96").cast("double").alias("rev96"),
                F.sum("rev97").cast("double").alias("rev97"),
            )
            .select(
                F.lit(phase).alias("phase"),
                F.lit(n_parts).cast("long").alias("n_partitions_96"),
                F.lit(seq).cast("long").alias("seq_96"),
                "*",
            )
        )

    # Materialize phase 1 BEFORE the revision overwrite: the republish
    # re-binds the root to a new hash-tagged catalog entry, and a still-
    # lazy p1 would resolve its file list against the superseded entry
    # at final materialization (VERDICT r12 #1 — eagerly dropping that
    # entry crashed p1 with TABLE_OR_VIEW_NOT_FOUND). Belt and braces:
    # publish._swap_bucketed_entry now PARKS superseded entries instead
    # of dropping them, so the lazy path (checkpoint_phase1=False, used
    # by tests/test_plans.py to pin the pre-checkpoint join shape and
    # regression-test exactly that lazy-across-republish pattern) reads
    # the old snapshot's files — correct snapshot isolation, old data
    # files survive until vacuum.
    p1 = rollup("p1_initial")
    if checkpoint_phase1:
        p1 = p1.localCheckpoint(eager=True)
    revised = a.where(F.col("mk") == 199606).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    P.publish_partition_overwrite(
        spark, revised, ra, "mk", bucket_col="o_custkey", n_buckets=8
    )
    p2 = rollup("p2_revised")
    return p1, p2


@query(
    "q_bucket_partitioned",
    oracle="""
    WITH a AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr,
               year(o_orderdate) * 100 + month(o_orderdate) AS mk
        FROM orders WHERE year(o_orderdate) = 1996
    ),
    b AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr
        FROM orders WHERE year(o_orderdate) = 1997
    ),
    np AS (SELECT COUNT(DISTINCT mk) AS n FROM a),
    r96 AS (SELECT o_custkey, SUM(pr) AS rev96 FROM a GROUP BY o_custkey),
    r96x AS (
        SELECT o_custkey,
               SUM(CASE WHEN mk = 199606 THEN pr * 2 ELSE pr END) AS rev96
        FROM a GROUP BY o_custkey
    ),
    r97 AS (SELECT o_custkey, SUM(pr) AS rev97 FROM b GROUP BY o_custkey)
    SELECT 'p1_initial' AS phase,
           (SELECT CAST(n AS BIGINT) FROM np) AS n_partitions_96,
           CAST(1 AS BIGINT) AS seq_96,
           o_custkey % 7 AS cg, COUNT(*) AS n_cust,
           CAST(SUM(rev96) AS DOUBLE) AS rev96,
           CAST(SUM(rev97) AS DOUBLE) AS rev97
    FROM r96 JOIN r97 USING (o_custkey) GROUP BY o_custkey % 7
    UNION ALL
    SELECT 'p2_revised', (SELECT CAST(n AS BIGINT) FROM np), 2,
           o_custkey % 7, COUNT(*),
           CAST(SUM(rev96) AS DOUBLE), CAST(SUM(rev97) AS DOUBLE)
    FROM r96x JOIN r97 USING (o_custkey) GROUP BY o_custkey % 7
    ORDER BY phase, cg
    """,
)
def q_bucket_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed PARTITIONED tables certified (r12, VERDICT r11 #5): the
    100 TB fact-fact story — two month-partitioned order facts bucketed
    by o_custkey through the publish protocol, joined per customer with
    zero shuffle Exchanges below the SortMergeJoin across ALL partitions
    (plan-pinned in tests/test_plans.py); partition dirs stay
    independently overwritable:

    - p1_initial: the per-customer-group rollup of the 1996 x 1997 join,
      bit-identical to the plain SQL join, plus the partition count and
      commit seq of the 1996 fact;
    - p2_revised: after ONE month (199606) is incrementally overwritten
      with doubled prices — the overwrite touches only that partition
      (carried months keep their manifest entries byte-identical,
      pinned in tests/test_publish.py), seq advances by one, and the
      SAME co-located read path returns the revised rollup.

    Scale: the bucket shuffle is paid once per INCREMENT at write (the
    increment repartitions by the bucket hash, one file per
    (partition, bucket)); every subsequent same-spec join — across the
    full history of daily overwrites — reads co-located buckets with
    per-bucket partition-local Sorts and no Exchange. This closes the
    gap the whole-snapshot q_bucket_manifest left: a date-partitioned
    fact no longer loses co-location (ROADMAP_r12 #3).

    Ref: the reference leans on BigQuery clustering within partitioned
    tables (README.md:90-91); this is the explicit lake-side twin."""
    conf = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "-1")  # the 100 TB fact-fact regime
    try:
        p1, p2 = bucket_partitioned_frames(spark, sf_dir)
        return (
            p1.unionByName(p2)
            .orderBy("phase", "cg")
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


# ---------------------------------------------------------------------------
# Bucketed-partitioned OPTIMIZE, keyed (r13, VERDICT r12 #4): maintenance
# rewrites through the bucketed writer preserve co-location AND values
# ---------------------------------------------------------------------------

OB_MOD = 13  # GDPR victims: o_custkey % OB_MOD == 0


def optimize_bucketed_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The certified frames for q_optimize_bucketed. Lineage on the
    1996 fact (month-partitioned, bucket-by-custkey): initial publish →
    GDPR delete of every %{OB_MOD} custkey → resubscribe overwrite of
    199606 (re-inserts the victims at 4x prices — downgrades the global
    register to file-scoped tombstones over the carried months) →
    OPTIMIZE, which purges both registers by rewriting the affected
    partitions through the bucketed writer under the RECORDED spec.
    Returns (p1_registers, p2_optimized): the same custkey join rollup
    against the 1997 fact read (a) with tombstone registers live and
    (b) after the purge — OPTIMIZE must be semantically invisible, so
    both phases hash identically except the register flags and seq.
    p1 materializes eagerly (OPTIMIZE rewrites the data files p1's scan
    resolved — unlike a partition overwrite, the purge is exactly the
    compaction case where old files die at the NEXT vacuum, so the
    phase boundary is a real materialization barrier)."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    tag = sf_tag(sf_dir)
    ra = scratch_path("saas_lake_optbkt_96", sf_dir)
    rb = scratch_path("saas_lake_optbkt_97", sf_dir)
    for r in (ra, rb):
        shutil.rmtree(r, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def year_slice(y: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == y).withColumn(
            "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
        )

    # H1 slices: 6 partitions per fact — certificate-sized (every
    # lifecycle leg still exercises: deletes hit all months, the
    # resubscribe overwrites 199606, OPTIMIZE rewrites every tombstoned
    # partition); 12 months double the publish/fsync/rewrite cost for
    # no extra coverage
    a = year_slice(1996).where(F.col("mk") <= 199606)
    b = year_slice(1997).where(F.col("mk") <= 199706)
    P.publish_partition_overwrite(
        spark, a, ra, "mk", bucket_col="o_custkey", n_buckets=4
    )
    P.publish_partition_overwrite(
        spark, b, rb, "mk", bucket_col="o_custkey", n_buckets=4
    )
    # GDPR: drop every %OB_MOD customer (tombstone register, no rewrite)
    P.publish_deletes(
        spark,
        a.where(F.col("o_custkey") % OB_MOD == 0).select("o_custkey"),
        ra,
        "o_custkey",
    )
    # resubscribe: June is overwritten with the victims back at 4x
    # prices (exact in binary) — carried months now hold STALE victim
    # rows, so the global register downgrades to file-scoped tombstones
    revised = a.where(F.col("mk") == 199606).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_custkey") % OB_MOD == 0, F.col("o_totalprice") * 4
        ).otherwise(F.col("o_totalprice")),
    )
    P.publish_partition_overwrite(
        spark, revised, ra, "mk", bucket_col="o_custkey", n_buckets=4
    )

    def rollup(phase: str) -> DataFrame:
        m = P.current_manifest(ra)
        ta = P.read_bucketed_partitioned(spark, ra, f"ob96_{tag}")
        tb = P.read_bucketed_partitioned(spark, rb, f"ob97_{tag}")

        def per_cust(t: DataFrame, out: str) -> DataFrame:
            return t.groupBy("o_custkey").agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(out)
            )

        return (
            per_cust(ta, "rev96")
            .join(per_cust(tb, "rev97"), "o_custkey")
            .groupBy((F.col("o_custkey") % 7).alias("cg"))
            .agg(
                F.count("*").alias("n_cust"),
                F.sum("rev96").cast("double").alias("rev96"),
                F.sum("rev97").cast("double").alias("rev97"),
            )
            .select(
                F.lit(phase).alias("phase"),
                F.lit(int(m["seq"])).cast("long").alias("seq_96"),
                # one combined flag: the GLOBAL register is guaranteed
                # at every sf (victims always exist); whether the
                # resubscribe also forms a SCOPED group depends on which
                # victims have June orders — data-dependent across sf,
                # so the scoped/global split is certified by
                # q_delete_vectors, not re-pinned here
                F.lit(
                    int(bool(m.get("deletes") or m.get("scoped_deletes")))
                )
                .cast("int")
                .alias("has_registers"),
                "*",
            )
        )

    p1 = rollup("p1_registers").localCheckpoint(eager=True)
    P.optimize_table(spark, ra)
    p2 = rollup("p2_optimized")
    return p1, p2


@query(
    "q_optimize_bucketed",
    oracle=f"""
    WITH a AS (
        SELECT o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS pr,
               year(o_orderdate) * 100 + month(o_orderdate) AS mk
        FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 6
    ),
    a_final AS (
        -- carried months lose the %{OB_MOD} victims; the resubscribed
        -- June holds everyone, victims at 4x
        SELECT o_custkey,
               CASE WHEN mk = 199606 AND o_custkey % {OB_MOD} = 0
                    THEN pr * 4 ELSE pr END AS pr
        FROM a
        WHERE mk = 199606 OR o_custkey % {OB_MOD} <> 0
    ),
    b AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr
        FROM orders
        WHERE year(o_orderdate) = 1997 AND month(o_orderdate) <= 6
    ),
    r96 AS (SELECT o_custkey, SUM(pr) AS rev96 FROM a_final GROUP BY 1),
    r97 AS (SELECT o_custkey, SUM(pr) AS rev97 FROM b GROUP BY 1),
    roll AS (
        SELECT o_custkey % 7 AS cg, COUNT(*) AS n_cust,
               CAST(SUM(rev96) AS DOUBLE) AS rev96,
               CAST(SUM(rev97) AS DOUBLE) AS rev97
        FROM r96 JOIN r97 USING (o_custkey) GROUP BY 1
    )
    SELECT 'p1_registers' AS phase, CAST(3 AS BIGINT) AS seq_96,
           1 AS has_registers, cg, n_cust, rev96, rev97
    FROM roll
    UNION ALL
    SELECT 'p2_optimized', CAST(4 AS BIGINT), 0,
           cg, n_cust, rev96, rev97
    FROM roll
    ORDER BY phase, cg
    """,
)
def q_optimize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-partitioned OPTIMIZE certified (r13, VERDICT r12 #4):
    maintenance on the daily-ingest layout — GDPR tombstones + a
    resubscribe's file-scoped registers are physically purged by
    rewriting ONLY the affected partitions through the bucketed writer
    under the manifest's recorded spec. Two hashed phases:

    - p1_registers: the custkey fact-fact rollup with tombstone
      registers live (readers apply the anti-joins on top of the
      bucketed scan); has_registers 1, seq 3 (publish, delete,
      resubscribe);
    - p2_optimized: the SAME rollup after optimize_table — values
      bit-identical (OPTIMIZE is semantically invisible), registers
      gone (has_registers 0), seq 4, and the join still runs with zero
      shuffle Exchanges below the SortMergeJoin (plan-pinned with an
      executed-value smoke in tests/test_plans.py).

    Scale: between maintenance runs reads pay O(registers) broadcast
    anti-joins; OPTIMIZE bounds that debt by rewriting just the
    fragmented/tombstoned partitions (one co-located file per
    partition-bucket), never the lake. This keys the maintenance leg
    the r12 certificates left pytest-only (ROADMAP_r13 #2).

    Ref: the reference relies on BigQuery's server-side clustering
    maintenance (README.md:90-91); this is the lake-side equivalent
    under the publish protocol."""
    conf = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "-1")  # the 100 TB fact-fact regime
    try:
        p1, p2 = optimize_bucketed_frames(spark, sf_dir)
        return (
            p1.unionByName(p2)
            .orderBy("phase", "cg")
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


# ---------------------------------------------------------------------------
# Bucketed PARTITIONED facts inside the catalog unit, keyed (r13,
# VERDICT r12 #5): the daily-ingest layout + one-swap star consistency
# ---------------------------------------------------------------------------


@query(
    "q_catalog_bucketed_partitioned",
    oracle="""
    WITH a AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr,
               year(o_orderdate) * 100 + month(o_orderdate) AS mk
        FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 6
    ),
    b AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr
        FROM orders
        WHERE year(o_orderdate) = 1997 AND month(o_orderdate) <= 6
    ),
    np AS (SELECT COUNT(DISTINCT mk) AS n FROM a),
    r96 AS (SELECT o_custkey, SUM(pr) AS rev96 FROM a GROUP BY 1),
    r97 AS (SELECT o_custkey, SUM(pr) AS rev97 FROM b GROUP BY 1),
    j96 AS (SELECT o_custkey, SUM(pr) AS rev96j FROM a
            WHERE mk = 199606 GROUP BY 1)
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(rev96) AS DOUBLE) AS rev96,
           CAST(SUM(rev97) AS DOUBLE) AS rev97,
           CAST(SUM(COALESCE(rev96j, 0)) AS DOUBLE) AS rev96_june,
           (SELECT CAST(n AS BIGINT) FROM np) AS n_partitions_96,
           CAST(1 AS BIGINT) AS seq
    FROM r96
    JOIN r97 USING (o_custkey)
    JOIN customer c ON c.c_custkey = o_custkey
    LEFT JOIN j96 USING (o_custkey)
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_catalog_bucketed_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bucketed PARTITIONED facts INSIDE the catalog unit (r13, VERDICT
    r12 #5): two month-partitioned order facts and the customer dim —
    all three bucketed by custkey — staged and committed as ONE
    ``publish_tables`` catalog swap, then read back through
    ``read_catalog_bucketed_partitioned`` / ``read_catalog_bucketed``
    and joined per customer into a segment rollup. The certificate
    pins:

    - the exact three-way join rollup (fact x fact x dim, all
      co-located: zero shuffle Exchanges below every SortMergeJoin —
      plan-pinned with an executed smoke in tests/test_plans.py);
    - rev96_june read through a ``_p = '199606'`` partition-pruned scan
      of the SAME catalog entry (PartitionFilters reach the scan);
    - the 1996 fact's partition count and the catalog seq (= 1: one
      atomic commit made all three tables visible together).

    This closes the gap q_txn_commit x q_bucket_partitioned left open:
    atomicity OR the daily-ingest layout, now both at once — a reader
    can never join a new fact month to an old dim, and the fact-fact
    join still never shuffles (torn-pair crash test in
    tests/test_publish.py).

    Scale: staging pays each table's bucketed write once; the commit is
    one record + one swap regardless of table count; every subsequent
    same-spec join across the star reads co-located buckets, and month
    predicates prune partitions catalog-side before any I/O.

    Ref: the reference's BigQuery tables are partitioned+clustered but
    loaded one at a time (README.md:90-91,
    data_gen/generate_and_load_script.py) — consistency window
    included; this is the lake-side fix."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    tag = sf_tag(sf_dir)
    cat = scratch_path("saas_lake_cat_bktp", sf_dir)
    shutil.rmtree(cat, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def year_slice(y: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == y).withColumn(
            "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
        )

    # H1 slices: 6 partitions per fact — certificate-sized; the
    # atomicity/co-location/pruning story is month-count-independent
    f96 = year_slice(1996).where(F.col("mk") <= 199606)
    f97 = year_slice(1997).where(F.col("mk") <= 199706)
    # dim staged under the JOIN key name so the bucket column IS the
    # join column on every edge of the star
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    conf = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "-1")  # the 100 TB fact-fact regime
    try:
        P.publish_tables(
            spark,
            {"f96": f96, "f97": f97, "dim": dim},
            cat,
            buckets={
                "f96": {"col": "o_custkey", "n": 8},
                "f97": {"col": "o_custkey", "n": 8},
                "dim": {"col": "o_custkey", "n": 8},
            },
            partitions={"f96": "mk", "f97": "mk"},
        )
        rec = P.catalog_record(cat)
        t96 = P.read_catalog_bucketed_partitioned(
            spark, cat, "f96", f"cbp96_{tag}"
        )
        t97 = P.read_catalog_bucketed_partitioned(
            spark, cat, "f97", f"cbp97_{tag}"
        )
        td = P.read_catalog_bucketed(spark, cat, "dim", f"cbpd_{tag}")
        n_parts = len(
            P._load_manifest(
                os.path.join(cat, "tables", "f96"), rec["tables"]["f96"]
            )["partitions"]
        )

        def per_cust(t: DataFrame, out: str) -> DataFrame:
            return t.groupBy("o_custkey").agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(out)
            )

        june = per_cust(
            t96.where(F.col("_p") == "199606"), "rev96j"
        )
        return (
            per_cust(t96, "rev96")
            .join(per_cust(t97, "rev97"), "o_custkey")
            .join(td, "o_custkey")
            .join(june, "o_custkey", "left")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_cust"),
                F.sum("rev96").cast("double").alias("rev96"),
                F.sum("rev97").cast("double").alias("rev97"),
                F.sum(
                    F.coalesce(
                        F.col("rev96j"), F.lit(0).cast("decimal(28,2)")
                    )
                )
                .cast("double")
                .alias("rev96_june"),
            )
            .select(
                "c_mktsegment",
                "n_cust",
                "rev96",
                "rev97",
                "rev96_june",
                F.lit(n_parts).cast("long").alias("n_partitions_96"),
                F.lit(int(rec["seq"])).cast("long").alias("seq"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


# ---------------------------------------------------------------------------
# Catalog-table lifecycle, keyed (r13, VERDICT r12 #5/#8): deletes +
# partition-granular increments + tombstone reconcile INSIDE the unit
# ---------------------------------------------------------------------------

CI_MOD = 11  # GDPR victims: o_custkey % CI_MOD == 0


@query(
    "q_catalog_increment",
    oracle=f"""
    WITH a AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS pr,
               year(o_orderdate) * 100 + month(o_orderdate) AS mk
        FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 6
    ),
    p1 AS (SELECT o_custkey, pr FROM a WHERE o_custkey % {CI_MOD} <> 0),
    p2 AS (
        SELECT o_custkey,
               CASE WHEN mk = 199603 AND o_custkey % {CI_MOD} = 0
                    THEN pr * 2 ELSE pr END AS pr
        FROM a
        WHERE mk = 199603 OR o_custkey % {CI_MOD} <> 0
    )
    SELECT 'p1_deleted' AS phase, CAST(2 AS BIGINT) AS seq,
           c.c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(pr) AS DOUBLE) AS total
    FROM p1 JOIN customer c ON c.c_custkey = o_custkey
    GROUP BY c.c_mktsegment
    UNION ALL
    SELECT 'p2_resubscribed', CAST(3 AS BIGINT),
           c.c_mktsegment, COUNT(*),
           CAST(SUM(pr) AS DOUBLE)
    FROM p2 JOIN customer c ON c.c_custkey = o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY phase, c_mktsegment
    """,
)
def q_catalog_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-table LIFECYCLE certified (r13, VERDICT r12 #5/#8): the
    daily-ingest GDPR flow entirely inside the one-swap catalog unit —
    a month-partitioned bucketed fact + the bucketed customer dim
    staged by ``publish_tables``, then:

    - ``publish_catalog_deletes``: every %{CI_MOD} custkey tombstoned
      with ONE catalog swap (seq 2) — p1_deleted pins the per-segment
      rollup with the register live on the co-located catalog read;
    - ``publish_catalog_increments``: month 199603 overwritten with the
      victims resubscribed at doubled prices (seq 3) — the reconcile
      removes re-inserted keys from the register (downgrading to
      stats-narrowed file-scoped groups where stale carried copies
      survive, pinned in tests/test_publish.py), untouched months carry
      by reference, the recorded bucket spec is inherited, and
      p2_resubscribed pins the post-increment rollup: victims visible
      ONLY via their new 199603 rows at 2x, stale copies hidden.

    Both phases join fact x dim through the catalog's bucketed readers
    (zero shuffle Exchanges below the SortMergeJoin, plan-pinned with
    an executed smoke in tests/test_plans.py) and hash the catalog seq.

    Scale: deletes are O(keys) + one swap; increments write only their
    partitions and reconcile at tombstone grain with stats-narrowed
    candidates; a reader can never see fact-without-dim or a torn
    GDPR state — the exact consistency gap the reference's
    table-at-a-time BigQuery loads accept
    (data_gen/generate_and_load_script.py)."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    tag = sf_tag(sf_dir)
    cat = scratch_path("saas_lake_cat_incr", sf_dir)
    shutil.rmtree(cat, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    fact = (
        orders.where(F.year("o_orderdate") == 1996)
        .withColumn(
            "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
        )
        .where(F.col("mk") <= 199606)
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    conf = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "-1")  # the 100 TB fact-fact regime
    try:
        P.publish_tables(
            spark,
            {"fact": fact, "dim": dim},
            cat,
            buckets={
                "fact": {"col": "o_custkey", "n": 4},
                "dim": {"col": "o_custkey", "n": 4},
            },
            partitions={"fact": "mk"},
        )
        P.publish_catalog_deletes(
            spark,
            cat,
            "fact",
            fact.where(F.col("o_custkey") % CI_MOD == 0).select("o_custkey"),
            "o_custkey",
        )

        def rollup(phase: str) -> DataFrame:
            rec = P.catalog_record(cat)
            tf = P.read_catalog_bucketed_partitioned(
                spark, cat, "fact", f"ci_f_{tag}"
            )
            td = P.read_catalog_bucketed(spark, cat, "dim", f"ci_d_{tag}")
            return (
                tf.join(td, "o_custkey")
                .groupBy("c_mktsegment")
                .agg(
                    F.count("*").alias("n_orders"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double")
                    .alias("total"),
                )
                .select(
                    F.lit(phase).alias("phase"),
                    F.lit(int(rec["seq"])).cast("long").alias("seq"),
                    "*",
                )
            )

        p1 = rollup("p1_deleted").localCheckpoint(eager=True)
        inc = fact.where(F.col("mk") == 199603).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_custkey") % CI_MOD == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        P.publish_catalog_increments(spark, cat, {"fact": inc})
        p2 = rollup("p2_resubscribed")
        return (
            p1.unionByName(p2)
            .orderBy("phase", "c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


# ---------------------------------------------------------------------------
# File-scoped deletion vectors, keyed (r12, VERDICT r11 #6): the
# GDPR-then-resubscribe flow commits unconditionally — no optimize-first
# ---------------------------------------------------------------------------

DV_MOD = 29  # victim custkeys: o_custkey % DV_MOD == 0


@query(
    "q_delete_vectors",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS pr,
               year(o_orderdate) * 100 + month(o_orderdate) AS mk
        FROM orders WHERE year(o_orderdate) = 1996
    ),
    victims AS (SELECT DISTINCT o_custkey FROM o
                WHERE o_custkey % {DV_MOD} = 0),
    june_v AS (SELECT DISTINCT o_custkey FROM o
               WHERE mk = 199606 AND o_custkey % {DV_MOD} = 0),
    stale_v AS (SELECT DISTINCT o_custkey FROM o
                WHERE mk <> 199606
                  AND o_custkey IN (SELECT o_custkey FROM june_v)),
    p1 AS (SELECT COUNT(*) AS n_rows, CAST(SUM(pr) AS DOUBLE) AS revenue
           FROM o WHERE o_custkey NOT IN (SELECT o_custkey FROM victims)),
    p2rows AS (
        SELECT CASE WHEN mk = 199606
                     AND o_custkey IN (SELECT o_custkey FROM victims)
                    THEN pr * 2 ELSE pr END AS pr
        FROM o
        WHERE mk = 199606
           OR o_custkey NOT IN (SELECT o_custkey FROM victims)
    ),
    p2 AS (SELECT COUNT(*) AS n_rows, CAST(SUM(pr) AS DOUBLE) AS revenue
           FROM p2rows),
    regs AS (
        SELECT CAST((SELECT COUNT(*) FROM victims)
                    - (SELECT COUNT(*) FROM june_v) AS BIGINT) AS g2,
               CAST(CASE WHEN EXISTS (SELECT 1 FROM stale_v)
                    THEN 1 ELSE 0 END AS BIGINT) AS s2
    )
    SELECT 'p1_gdpr' AS phase, n_rows, revenue,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM victims) AS n_global_keys,
           CAST(0 AS BIGINT) AS n_scoped_groups
    FROM p1
    UNION ALL
    SELECT 'p2_resubscribe', n_rows, revenue,
           (SELECT g2 FROM regs), (SELECT s2 FROM regs)
    FROM p2
    UNION ALL
    SELECT 'p3_optimized', n_rows, revenue, 0, 0 FROM p2
    ORDER BY phase
    """,
)
def q_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-scoped deletion vectors certified (r12, VERDICT r11 #6): the
    GDPR-then-resubscribe flow over a month-partitioned 1996 orders
    fact, keyed by o_custkey:

    - p1_gdpr: ``publish_deletes`` tombstones every victim customer
      (o_custkey % {DV_MOD} == 0) — their rows vanish everywhere,
      O(keys) metadata, no rewrite;
    - p2_resubscribe: month 199606 is overwritten with its original
      rows, victims' June prices DOUBLED (provenance proof: the visible
      victim rows must come from the NEW file, which only the doubled
      price shows). Pre-r12 this overwrite failed loudly because stale
      victim copies survive in carried months; now the re-inserted keys
      downgrade to a FILE-SCOPED tombstone over those carried files —
      the commit is unconditional, fresh June rows are visible, stale
      copies in other months stay hidden, and victims WITHOUT June
      orders remain in the global register (both register sizes are
      hashed against the oracle's replay of the same set algebra);
    - p3_optimized: ``optimize_table`` purges file-aware — the scoped
      rows drop from their files while the re-inserted live rows
      survive the rewrite; both registers empty, readback identical.

    Scale: deletes stay O(keys) at commit; the scoped downgrade costs
    one stats-narrowed candidate scan at overwrite time (tombstone-
    grain, never table-grain); readers pay one broadcast key-join plus
    one broadcast scope-file join per scoped group, and only on tables
    that actually carry one. This closes ROADMAP_r12 #4: CDC/GDPR
    resubscribe flows never see the optimize-first refusal.

    Ref: Delta deletion vectors / Iceberg positional deletes; the
    reference's BigQuery DML rewrites whole partitions (README.md:82) —
    this is the lake-side O(keys) equivalent."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_dv", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    o96 = orders.where(F.year("o_orderdate") == 1996).withColumn(
        "mk", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    )
    P.publish_partition_overwrite(spark, o96, root, "mk")
    victims = (
        o96.where(F.col("o_custkey") % DV_MOD == 0)
        .select("o_custkey")
        .distinct()
    )
    P.publish_deletes(spark, victims, root, "o_custkey")

    def phase(tag: str) -> DataFrame:
        m = P.current_manifest(root)
        dels = m.get("deletes") or []
        n_glob = (
            spark.read.parquet(*[os.path.join(root, f) for f in dels])
            .select("o_custkey")
            .distinct()
            .count()
            if dels
            else 0
        )
        return (
            P.read_current(spark, root)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .select(
                F.lit(tag).alias("phase"),
                "*",
                F.lit(n_glob).cast("long").alias("n_global_keys"),
                F.lit(len(m.get("scoped_deletes") or []))
                .cast("long")
                .alias("n_scoped_groups"),
            )
        )

    p1 = phase("p1_gdpr")
    june = o96.where(F.col("mk") == 199606)
    resub = june.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_custkey") % DV_MOD == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    P.publish_partition_overwrite(spark, resub, root, "mk")
    p2 = phase("p2_resubscribe")
    P.optimize_table(spark, root)
    p3 = phase("p3_optimized")
    return p1.unionByName(p2).unionByName(p3).orderBy("phase")


# ---------------------------------------------------------------------------
# Predicate-routed reads, keyed (r11, VERDICT r10 #3): one entry point
# that picks — and for compound predicates INTERSECTS — the manifest-side
# pruning mechanisms, certified with route + files-scanned in the hash
# ---------------------------------------------------------------------------

PR_DATE_LO = "1996-04-01 00:00:00"
PR_DATE_HI = "1997-02-28 00:00:00"


@query(
    "q_predicate_routing",
    oracle=f"""
    WITH m AS (
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mk,
               o_orderdate, o_custkey
        FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1997
    ),
    f AS (
        SELECT mk, min(o_orderdate) AS lo, max(o_orderdate) AS hi
        FROM m GROUP BY mk
    ),
    part_files AS (
        SELECT COUNT(*) AS n FROM f WHERE mk BETWEEN 199601 AND 199606
    ),
    stats_files AS (
        SELECT COUNT(*) AS n FROM f
        WHERE NOT (hi < TIMESTAMP '{PR_DATE_LO}'
                   OR lo > TIMESTAMP '{PR_DATE_HI}')
    ),
    comp_files AS (
        SELECT COUNT(*) AS n FROM f
        WHERE mk BETWEEN 199601 AND 199612
          AND NOT (hi < TIMESTAMP '{PR_DATE_LO}'
                   OR lo > TIMESTAMP '{PR_DATE_HI}')
    ),
    total AS (SELECT COUNT(*) AS n FROM f)
    SELECT 'r1_partition' AS phase, 'partition_pruning' AS route,
           (SELECT CAST(n AS BIGINT) FROM part_files) AS files_scanned,
           COUNT(*) AS n_rows, CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM m WHERE mk BETWEEN 199601 AND 199606
    UNION ALL
    SELECT 'r2_stats', 'file_skipping',
           (SELECT CAST(n AS BIGINT) FROM stats_files),
           COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
    FROM m WHERE o_orderdate BETWEEN TIMESTAMP '{PR_DATE_LO}'
                               AND TIMESTAMP '{PR_DATE_HI}'
    UNION ALL
    SELECT 'r3_compound', 'partition_pruning+file_skipping',
           (SELECT CAST(n AS BIGINT) FROM comp_files),
           COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
    FROM m WHERE mk BETWEEN 199601 AND 199612
      AND o_orderdate BETWEEN TIMESTAMP '{PR_DATE_LO}'
                          AND TIMESTAMP '{PR_DATE_HI}'
    UNION ALL
    SELECT 'r4_full', 'full_scan', (SELECT CAST(n AS BIGINT) FROM total),
           COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
    FROM m WHERE o_custkey BETWEEN 100 AND 500
    ORDER BY phase
    """,
)
def q_predicate_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-routed manifest reads, keyed (r11, VERDICT r10 #3): a
    month-partitioned orders table (one file per month) with file stats
    on o_orderdate; ``read_where`` / ``read_where_all`` pick the pruning
    mechanism FROM the manifest instead of making the reader choose:

    - r1: a partition-column range -> partition pruning (numeric keys
      compared numerically — '199610' never sorts before '19962');
    - r2: a stats-column date band -> manifest file skipping;
    - r3: the AND of both -> per-predicate candidate file lists
      INTERSECTED (months in 1996 ∩ months overlapping the band), the
      compound case the single-route read_where can't serve;
    - r4: an un-indexed column -> full scan, still exact.

    Every phase hashes its route name, its files-scanned count (the
    oracle replays the clustering arithmetic), and the exact aggregate
    from the pruned-superset read — a wrong route, an over-eager prune
    (lost rows), or a broken intersection each breaks a literal column.

    Scale: routing is pure manifest metadata (set algebra over file
    lists, zero I/O); at 100 TB this is the planner-side gate deciding
    whether a read opens 9 files or 24 000.

    Ref: the reference leans on BigQuery's partition+cluster routing
    (README.md:90-91); this is the lake-side equivalent, explicit and
    certified."""
    import datetime
    import shutil
    from functools import reduce

    from saas_analytics_pipeline_spark.plans import publish as P

    root = scratch_path("saas_lake_routing", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    monthly = orders.where(
        F.year("o_orderdate").between(1996, 1997)
    ).withColumn("mk", F.year("o_orderdate") * 100 + F.month("o_orderdate"))
    P.publish_partition_overwrite(
        spark, monthly.repartition(F.col("mk")), root, "mk"
    )
    P.publish_stats(spark, root, ["o_orderdate"])
    lo = datetime.datetime.fromisoformat(PR_DATE_LO)
    hi = datetime.datetime.fromisoformat(PR_DATE_HI)
    d1, rep1 = P.read_where(spark, root, "mk", 199601, 199606)
    d2, rep2 = P.read_where(spark, root, "o_orderdate", lo, hi)
    d3, rep3 = P.read_where_all(
        spark, root, [("mk", 199601, 199612), ("o_orderdate", lo, hi)]
    )
    d4, rep4 = P.read_where(spark, root, "o_custkey", 100, 500)

    def phase(df: DataFrame, name: str, route: str, files: int) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        ).select(
            F.lit(name).alias("phase"),
            F.lit(route).alias("route"),
            F.lit(files).cast("long").alias("files_scanned"),
            "*",
        )
    parts = [
        phase(d1, "r1_partition", rep1["route"], rep1["files"]),
        phase(d2, "r2_stats", rep2["route"], rep2["files"]),
        phase(
            d3,
            "r3_compound",
            "+".join(r["route"] for r in rep3["routes"]),
            rep3["files"],
        ),
        phase(d4, "r4_full", rep4["route"], rep4["files"]),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("phase")


# ---------------------------------------------------------------------------
# Catalog-unit maintenance, keyed (r11): maintain_catalog's single-swap
# contract certified — compaction + stats land atomically across tables
# ---------------------------------------------------------------------------

# target dim fragment count: the shared maxRecordsPerFile cap is
# ceil(n_dim / this), making every table's file count the closed form
# ceil(n / cap) at any sf (fact lands at ~target * orders-per-customer)
CM_DIM_FILES = 3


@query(
    "q_catalog_maintain",
    oracle=f"""
    WITH f AS (
        SELECT o_orderkey AS k,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amount
        FROM orders
    ),
    agg AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(amount) AS DOUBLE) AS total_amount
        FROM f
    ),
    frag AS (
        SELECT CAST(CEIL(fc / CEIL(dc / {CM_DIM_FILES}.0)) AS BIGINT)
                   AS ff,
               CAST(CEIL(dc / CEIL(dc / {CM_DIM_FILES}.0)) AS BIGINT)
                   AS df
        FROM (SELECT (SELECT COUNT(*) FROM f) AS fc,
                     (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS dc)
    )
    SELECT 'p1_before' AS phase, CAST(1 AS BIGINT) AS seq,
           g.ff AS n_files_fact,
           g.df AS n_files_dim,
           CAST(1 AS BIGINT) AS one_generation,
           CAST(0 AS BIGINT) AS n_stats_files,
           a.n_rows, a.total_amount
    FROM agg a, frag g
    UNION ALL
    SELECT 'p2_maintained', 2, 1, 1, 1, 1, a.n_rows, a.total_amount
    FROM agg a
    UNION ALL
    SELECT 'p3_travel', 1, g.ff, g.df, 1, 0, a.n_rows, a.total_amount
    FROM agg a, frag g
    ORDER BY phase
    """,
)
def q_catalog_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-unit maintenance certified (r11, VERDICT r10 #5): a
    fact+dim catalog published FRAGMENTED (~4 and ~3 files via
    ``maxRecordsPerFile`` = ceil(rows/target) over a single write task,
    so the exact file count is the closed form
    ceil(rows / ceil(rows/target)) the oracle replays — NOT a
    hard-coded literal pinning today's splitter arithmetic, VERDICT r11
    #7), then ``maintain_catalog`` compacts BOTH tables and annotates
    the fact's file stats as ONE atomic catalog commit:

    - p1: the fragmented baseline — per-table file counts from the
      staged manifests, both tables on one txid generation, exact fact
      rollup;
    - p2: after maintenance — one file per table, stats recorded on the
      fact, seq advanced by exactly ONE (the single swap: two
      compactions + a stats annotation are one commit, not three),
      both tables still on one generation (never fact-compacted beside
      dim-stale), and the rollup bit-identical;
    - p3: catalog time travel to seq=1 — the pre-maintenance fragmented
      pair intact (retention).

    A torn maintenance commit, a lost row in compaction, a stats entry
    on the wrong generation, or an extra intermediate commit each breaks
    a literal column.

    Scale: this is the nightly job over a 100 TB star schema — staging
    cost follows the fragmentation debt, the commit is one record + one
    swap regardless of table count, and readers never block or see a
    mixed set. Crash/contention matrix in tests/test_publish.py.

    Ref: the reference maintains each BigQuery table independently and
    accepts the window (README.md:82); this closes it."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P

    cat = scratch_path("saas_lake_catmaint", sf_dir)
    shutil.rmtree(cat, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount"),
    )
    dim = orders.select(
        F.col("o_custkey").alias("ck"), (F.col("o_custkey") % 3).alias("tier")
    ).distinct()
    # fragment through the file-size cap on ONE write task per table —
    # the shared cap is ceil(n_dim / target), so each table's file count
    # is exactly ceil(n / cap), the arithmetic the oracle reproduces from
    # its own COUNT(*) (one cap for both tables keeps the publish a
    # single atomic commit: one txid generation at p1)
    import math

    cap = math.ceil(dim.count() / CM_DIM_FILES)
    conf_key = "spark.sql.files.maxRecordsPerFile"
    prev_conf = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, str(cap))
    try:
        P.publish_tables(
            spark, {"fact": fact.coalesce(1), "dim": dim.coalesce(1)}, cat
        )
    finally:
        if prev_conf is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_conf)

    def phase(tag: str, seq: int) -> DataFrame:
        rec = P.catalog_record(cat, seq=seq)
        mf = P._load_manifest(
            os.path.join(cat, "tables", "fact"), rec["tables"]["fact"]
        )
        md = P._load_manifest(
            os.path.join(cat, "tables", "dim"), rec["tables"]["dim"]
        )
        one_gen = int(len(set(rec["tables"].values())) == 1)
        return (
            P.read_catalog_table(spark, cat, "fact", seq=seq)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("amount").cast("double").alias("total_amount"),
            )
            .select(
                F.lit(tag).alias("phase"),
                F.lit(seq).cast("long").alias("seq"),
                F.lit(mf["n_files"]).cast("long").alias("n_files_fact"),
                F.lit(md["n_files"]).cast("long").alias("n_files_dim"),
                F.lit(one_gen).cast("long").alias("one_generation"),
                F.lit(len(mf.get("stats") or {})).cast("long").alias(
                    "n_stats_files"
                ),
                "*",
            )
        )

    p1 = phase("p1_before", 1)
    P.maintain_catalog(spark, cat, retain=1, stats_cols={"fact": ["k"]})
    p2 = phase("p2_maintained", int(P.catalog_record(cat)["seq"]))
    p3 = phase("p3_travel", 1)
    return p1.unionByName(p2).unionByName(p3).orderBy("phase")


# ---------------------------------------------------------------------------
# Streaming lake maintenance, keyed (r11): ingest + maintain_table in one
# cadence — crash-replayed, batching-independent, packed
# ---------------------------------------------------------------------------


@query(
    "q_stream_lake_maint",
    oracle="""
    WITH m AS (
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mk,
               o_custkey
        FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 3
    )
    SELECT mk, CAST(1 AS BIGINT) AS n_files,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM m GROUP BY mk ORDER BY mk
    """,
)
def q_stream_lake_maint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming lake-maintenance loop certified (r11, VERDICT r10
    #6): three month increments (each deliberately FRAGMENTED into 4
    files) applied through ``lake_apply_batch`` — the foreachBatch body
    of ``run_lake_maintenance`` — with a deterministic CRASH after
    batch 1's increment publish and a replay:

    - each increment commits atomically under txid ``b<id>`` (the
      replay skips instead of double-publishing — crash-replay
      idempotency in the hash via exact per-month sums);
    - batch 2 triggers the ``maintain_every`` cadence: maintain_table
      packs every fragmented month to ONE file (``n_files`` literal 1
      per month in the hash), annotates stats, and vacuums;
    - the final table equals the one-shot batch publish of all three
      months — batching- and crash-independence.

    A duplicated replay row, a torn increment, a maintenance that
    missed a month (or rewrote one it shouldn't), each breaks a column.

    Scale: THE steady-state 100 TB ingest shape — one writer owns both
    the increment commits and the maintenance cadence, so they never
    race; maintenance cost follows the accumulated small-file debt
    (PROBES.json lake_maint_probe), and readers stay on committed
    snapshots throughout. Live-stream equality + the full crash matrix
    in tests/test_streaming.py.

    Ref: the reference's incremental daily loads (README.md:82) with
    BigQuery's implicit auto-compaction made explicit and certified."""
    import shutil

    from saas_analytics_pipeline_spark.plans import publish as P
    from saas_analytics_pipeline_spark.streaming.jobs import (
        LAKE_AFTER_INCREMENT,
        lake_apply_batch,
    )

    root = scratch_path("saas_lake_streammaint", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    marker_dir = os.path.join(root, "_markers")
    os.makedirs(marker_dir, exist_ok=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    monthly = orders.where(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") <= 3)
    ).withColumn("mk", F.year("o_orderdate") * 100 + F.month("o_orderdate"))

    class _Boom(RuntimeError):
        pass

    def die(barrier: str) -> None:
        if barrier == LAKE_AFTER_INCREMENT:
            raise _Boom(barrier)

    for i, mk in enumerate((199601, 199602, 199603)):
        inc = monthly.where(F.col("mk") == mk).repartition(4)
        if i == 1:  # the crash-then-replay batch
            try:
                lake_apply_batch(
                    inc, i, root, "mk", marker_dir, maintain_every=3,
                    stats_cols=["o_custkey"], crash_hook=die,
                )
            except _Boom:
                pass
        lake_apply_batch(
            inc, i, root, "mk", marker_dir, maintain_every=3,
            stats_cols=["o_custkey"],
        )
    m = P.current_manifest(root)
    files_df = spark.createDataFrame(
        [(v, len(fs)) for v, fs in sorted(m["partitions"].items())],
        "mk_s string, n_files long",
    )
    return (
        P.read_current(spark, root)
        .groupBy("mk")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        )
        .join(files_df, F.col("mk").cast("string") == F.col("mk_s"))
        .select("mk", "n_files", "n_rows", "sum_custkey")
        .orderBy("mk")
    )


# ---------------------------------------------------------------------------
# Predicate routing over CATALOG tables, keyed (r11): the read path for the
# per-file stats maintain_catalog records — without it they're write-only
# ---------------------------------------------------------------------------

CR_LO = "1992-01-01 00:00:00"
CR_HI = "1994-06-30 00:00:00"
CR_CK = (100, 5000)  # the un-indexed custkey band (full-scan route)
# ntile ids remapped by *17 before the 4-way repartition: murmur3 of the
# longs {17,34,51,68} lands in 4 DISTINCT buckets (checked: [2,0,3,1]),
# so each date-quartile tile is exactly one staged file — deterministic
# AND oracle-replayable, where hashing raw 1..4 would collide tiles
CR_TILE_MUL = 17


@query(
    "q_catalog_routing",
    oracle=f"""
    WITH b AS (
        SELECT o_custkey, o_orderdate,
               ntile(4) OVER (ORDER BY o_orderdate, o_orderkey) AS fb
        FROM orders
    ),
    s AS (
        SELECT fb, min(o_orderdate) AS lo, max(o_orderdate) AS hi
        FROM b GROUP BY fb
    ),
    skipf AS (
        SELECT COUNT(*) AS n FROM s
        WHERE NOT (hi < TIMESTAMP '{CR_LO}' OR lo > TIMESTAMP '{CR_HI}')
    )
    SELECT 'r1_stats' AS phase, 'file_skipping' AS route,
           (SELECT CAST(n AS BIGINT) FROM skipf) AS files_scanned,
           COUNT(*) AS n_rows, CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
    FROM b WHERE o_orderdate BETWEEN TIMESTAMP '{CR_LO}'
                               AND TIMESTAMP '{CR_HI}'
    UNION ALL
    SELECT 'r2_full', 'full_scan', 4, COUNT(*),
           CAST(SUM(o_custkey) AS BIGINT)
    FROM b WHERE o_custkey BETWEEN {CR_CK[0]} AND {CR_CK[1]}
    UNION ALL
    SELECT 'r3_compound', 'file_skipping+full_scan',
           (SELECT CAST(n AS BIGINT) FROM skipf), COUNT(*),
           CAST(SUM(o_custkey) AS BIGINT)
    FROM b WHERE o_orderdate BETWEEN TIMESTAMP '{CR_LO}'
                               AND TIMESTAMP '{CR_HI}'
      AND o_custkey BETWEEN {CR_CK[0]} AND {CR_CK[1]}
    ORDER BY phase
    """,
)
def q_catalog_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-routed reads over a CATALOG table (r11): the fact of a
    fact+dim catalog is staged date-clustered (4 ntile files),
    ``maintain_catalog`` annotates per-file o_orderdate stats as a
    METADATA-ONLY staged commit (compact=False), and
    ``read_catalog_where`` routes through the catalog record — the read
    path that makes catalog-manifest stats consultable instead of
    write-only:

    - r1: a date band -> manifest file skipping (only stat-overlapping
      staged files open — the oracle replays the ntile clustering);
    - r2: an un-annotated custkey band -> full scan, still exact;
    - r3: the AND of both -> intersected candidate lists (here the
      skipping set, since full_scan contributes no pruning) with the
      exact conjunction on top.

    Route names, files-scanned counts, and exact aggregates are the
    hash. The dim rides the same catalog record, so routed fact reads
    stay mutually consistent with it — the property per-table pointers
    can't give.

    Scale: at 100 TB the catalog record is one tiny JSON hop and the
    stats live in the named manifest; a routed read opens the
    overlapping files of ONE consistent snapshot set, no directory
    listing, no footer for skipped files."""
    import datetime
    import shutil
    from functools import reduce

    from pyspark.sql import Window

    from saas_analytics_pipeline_spark.plans import publish as P

    cat = scratch_path("saas_lake_catrouting", sf_dir)
    shutil.rmtree(cat, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.orderBy("o_orderdate", "o_orderkey")
    fact = orders.withColumn("fb", F.ntile(4).over(w))
    dim = orders.select(
        F.col("o_custkey").alias("ck"), (F.col("o_custkey") % 5).alias("seg")
    ).distinct()
    P.publish_tables(
        spark,
        {
            "fact": fact.repartition(
                4, (F.col("fb") * CR_TILE_MUL).cast("long")
            ),
            "dim": dim,
        },
        cat,
    )
    P.maintain_catalog(
        spark, cat, retain=1, compact=False,
        stats_cols={"fact": ["o_orderdate"]},
    )
    lo = datetime.datetime.fromisoformat(CR_LO)
    hi = datetime.datetime.fromisoformat(CR_HI)
    d1, rep1 = P.read_catalog_where(
        spark, cat, "fact", [("o_orderdate", lo, hi)]
    )
    d2, rep2 = P.read_catalog_where(
        spark, cat, "fact", [("o_custkey", *CR_CK)]
    )
    d3, rep3 = P.read_catalog_where(
        spark, cat, "fact", [("o_orderdate", lo, hi), ("o_custkey", *CR_CK)]
    )

    def phase(df: DataFrame, name: str, rep: dict) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum("o_custkey").cast("long").alias("sum_custkey"),
        ).select(
            F.lit(name).alias("phase"),
            F.lit("+".join(r["route"] for r in rep["routes"])).alias("route"),
            F.lit(rep["files"]).cast("long").alias("files_scanned"),
            "*",
        )

    parts = [
        phase(d1, "r1_stats", rep1),
        phase(d2, "r2_full", rep2),
        phase(d3, "r3_compound", rep3),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("phase")
