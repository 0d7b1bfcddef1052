"""Iterative graph algorithms as unrolled DataFrame plans.

PageRank over the deterministic domain link graph synthesized from the
documents table (the synth_urls pattern: node = doc_id % 13 — the
d{0..12}.example.com crawl domains — edge per doc to (doc_id // 13 + doc_id) % 13, so each domain
fans out to many others with varied multiplicities;
the oracle replays the synthesis). The point is the ITERATION shape on
Spark: each power-method step is one join + one partial-aggregable
groupBy — rank state and edge weights stay DataFrames end-to-end, no
driver-side loop over collect()ed values.

Exactness contract (the cross-engine rule for iterated floating math):
every per-edge contribution rounds to 12 decimals and sums as
DECIMAL(28,12) — an exact, order-independent aggregate — and each new
rank re-rounds to 12 decimals. Both engines therefore carry IDENTICAL
doubles into every iteration, so a 3-step unrolled DuckDB CTE chain
hash-matches bit-for-bit (double +/*// on identical inputs is IEEE-
deterministic; only SUM order varies, and the decimal cast removes it).

Scale (100 TB graph): ranks partition by node id and edges by src — the
per-iteration join co-locates on src and the contribution aggregate is
map-side combinable on dst, so one shuffle per iteration moves only
(node, decimal) pairs; the synthesis/weights never recompute (cached
edge frame in production, localCheckpoint every few iterations to cut
the growing lineage — at 3 unrolled steps lineage is fine). Dangling
nodes: the synthesis gives every node out-edges; a production variant
adds the standard dangling-mass redistribution term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

PR_NODES = 13  # the d{0..12} crawl-domain universe (curation.synth_urls)
PR_ITERS = 3
PR_DAMP = 0.85


def _pr_iter_sql(i: int) -> str:
    return f"""
    contrib{i} AS (
        SELECT e.dst AS node,
               CAST(round(r.rank * e.w / o.outw, 12) AS DECIMAL(28,12)) AS c
        FROM we e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN outd o ON o.src = e.src
    ),
    r{i} AS (
        SELECT n.node,
               round(CAST(0.15 AS DOUBLE) / {PR_NODES}
                     + CAST({PR_DAMP} AS DOUBLE)
                       * CAST(COALESCE(s.sc, CAST(0 AS DECIMAL(28,12)))
                              AS DOUBLE), 12) AS rank
        FROM nodes n
        LEFT JOIN (SELECT node, SUM(c) AS sc FROM contrib{i} GROUP BY node) s
               ON s.node = n.node
    )"""


@query(
    "q_pagerank",
    oracle=f"""
    WITH nodes AS (
        SELECT DISTINCT doc_id % {PR_NODES} AS node FROM documents
    ),
    edges AS (
        SELECT doc_id % {PR_NODES} AS src,
               (doc_id // {PR_NODES} + doc_id) % {PR_NODES} AS dst
        FROM documents
        WHERE doc_id % {PR_NODES} <> (doc_id // {PR_NODES} + doc_id) % {PR_NODES}
    ),
    we AS (SELECT src, dst, COUNT(*) AS w FROM edges GROUP BY src, dst),
    outd AS (SELECT src, SUM(w) AS outw FROM we GROUP BY src),
    r0 AS (
        SELECT node, round(CAST(1.0 AS DOUBLE) / {PR_NODES}, 12) AS rank
        FROM nodes
    ),
    {",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
    SELECT r.node AS domain,
           CAST(COALESCE(o.outw, 0) AS BIGINT) AS out_weight,
           r.rank AS pagerank,
           ROW_NUMBER() OVER (ORDER BY r.rank DESC, r.node ASC) AS pos
    FROM r{PR_ITERS} r LEFT JOIN outd o ON o.src = r.node
    ORDER BY domain
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank ({PR_ITERS} power iterations, damping
    {PR_DAMP}) over the deterministic domain link graph — the iterative-
    algorithm family key: rank state flows through the loop as a
    DataFrame, each step is join(edges, ranks on src) -> per-dst
    exact-decimal contribution sum -> damped update, unrolled
    {PR_ITERS}x into one Catalyst plan the DuckDB oracle replays CTE by
    CTE. See the module docstring for the 12-decimal/DECIMAL(28,12)
    exactness contract and the 100 TB partitioning story.

    Reference scope: extension surface (BASELINE.json north star) —
    link-graph centrality is the canonical crawl-prioritization signal
    feeding the curation funnel (q_domain_quality and friends)."""
    docs = load_table(spark, sf_dir, "documents")
    node = (F.col("doc_id") % PR_NODES).alias("node")
    src = (F.col("doc_id") % PR_NODES).alias("src")
    # integral `div`, not floor(double /): keeps the edge synthesis exact
    # over the full bigint doc_id domain (doubles round past 2^53), matching
    # the oracle's `//` bit-for-bit (ADVICE r07)
    dst = (
        (F.expr(f"doc_id div {PR_NODES}") + F.col("doc_id")) % PR_NODES
    ).alias("dst")
    nodes = docs.select(node).distinct()
    we = (
        docs.select(src, dst)
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outd = we.groupBy("src").agg(F.sum("w").alias("outw"))
    rank = nodes.select(
        "node", F.round(F.lit(1.0) / PR_NODES, 12).alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = (
            we.join(rank.withColumnRenamed("node", "src"), "src")
            .join(outd, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") * F.col("w") / F.col("outw"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        rank = nodes.join(summed, "node", "left").select(
            "node",
            F.round(
                F.lit(0.15) / PR_NODES
                + F.lit(PR_DAMP)
                * F.coalesce(
                    F.col("sc"), F.lit(0).cast("decimal(28,12)")
                ).cast("double"),
                12,
            ).alias("rank"),
        )
    pos_w = Window.orderBy(F.desc("pagerank"), F.asc("domain"))
    return (
        rank.join(outd.withColumnRenamed("src", "node"), "node", "left")
        .select(
            F.col("node").alias("domain"),
            F.coalesce(F.col("outw"), F.lit(0)).cast("long").alias("out_weight"),
            F.col("rank").alias("pagerank"),
        )
        .withColumn("pos", F.row_number().over(pos_w))
        .orderBy("domain")
    )
