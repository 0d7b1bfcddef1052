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
    # r13 (guide §5): the unrolled plan consumes these tiny frames in
    # EVERY iteration, and Spark re-executes shared subplans per consumer
    # — without this the document scan + edge aggregation replays
    # 2*PR_ITERS+2 times. Checkpoint once (≤ PR_NODES² rows), exactly as
    # _pagerank_converged_frame already does for its driver loop.
    # (r14, ADVICE r13: eager=False keeps construction lazy)
    nodes = nodes.localCheckpoint(eager=False)
    we = we.localCheckpoint(eager=False)
    outd = outd.localCheckpoint(eager=False)
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


# ---------------------------------------------------------------------------
# Convergence-checked iteration (verdict r07 #2) + dangling-mass variant (#7)
# ---------------------------------------------------------------------------

PR_EPS = 1e-9  # stop when max |delta rank| drops below this
PR_MAX_ITERS = 60  # hard cap: converge-or-cap, both engines identical
PR_CKPT_EVERY = 4  # localCheckpoint cadence — cut lineage every k iterations
# dangling synthesis: domains >= this floor keep their in-links but lose
# all out-edges, becoming rank sinks the redistribution term must recycle
PR_SINK_FLOOR = PR_NODES - 2


def _domain_graph(docs: DataFrame, drop_sink_sources: bool = False):
    """(nodes, weighted-edges, out-degree) for the deterministic domain
    link graph; with ``drop_sink_sources`` the top PR_SINK_FLOOR+ domains
    emit no edges (true dangling nodes — they appear in `nodes` but not in
    `outd`), which both engines derive from the data, never hard-code."""
    node = (F.col("doc_id") % PR_NODES).alias("node")
    src = (F.col("doc_id") % PR_NODES).alias("src")
    dst = (
        (F.expr(f"doc_id div {PR_NODES}") + F.col("doc_id")) % PR_NODES
    ).alias("dst")
    nodes = docs.select(node).distinct()
    edges = docs.select(src, dst).where(F.col("src") != F.col("dst"))
    if drop_sink_sources:
        edges = edges.where(F.col("src") < PR_SINK_FLOOR)
    we = edges.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outd = we.groupBy("src").agg(F.sum("w").alias("outw"))
    return nodes, we, outd


def _pagerank_converged_frame(
    spark: SparkSession, sf_dir: str, dangling: bool
) -> DataFrame:
    """The driver-loop power iteration: iterate until max |delta| < PR_EPS
    (or PR_MAX_ITERS), collecting ONE scalar per iteration — the
    convergence delta — never rank values; localCheckpoint every
    PR_CKPT_EVERY iterations truncates the growing join lineage (the
    long-iteration pattern the 3-step unrolled q_pagerank documents).
    With ``dangling``, the mass parked on sink nodes each step is a 1-row
    exact-decimal aggregate broadcast back into the update as the
    standard redistribution term, so total rank stays conserved."""
    docs = load_table(spark, sf_dir, "documents")
    nodes, we, outd = _domain_graph(docs, drop_sink_sources=dangling)
    # the edge/degree frames are reused every iteration: checkpoint ONCE
    # so the synthesis scan doesn't replay per step (at 100 TB this is
    # the cached edge partition layout every iterative engine keeps)
    we = we.localCheckpoint(eager=False)
    outd = outd.localCheckpoint(eager=False)
    nodes = nodes.localCheckpoint(eager=False)
    zero_dec = F.lit(0).cast("decimal(28,12)")
    rank = nodes.select(
        "node", F.round(F.lit(1.0) / PR_NODES, 12).alias("rank")
    )
    sinks = nodes.join(
        outd.withColumnRenamed("src", "node"), "node", "left_anti"
    )
    n_iters, delta = 0, 1.0
    while delta >= PR_EPS and n_iters < PR_MAX_ITERS:
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
        base = F.coalesce(F.col("sc"), zero_dec).cast("double")
        if dangling:
            dm_row = (
                rank.join(sinks, "node", "semi")
                .agg(
                    F.coalesce(
                        F.sum(F.col("rank").cast("decimal(28,12)")), zero_dec
                    )
                    .cast("double")
                    .alias("dm")
                )
                .select((F.col("dm") / PR_NODES).alias("dmn"))
            )
            new = (
                nodes.join(summed, "node", "left")
                .crossJoin(F.broadcast(dm_row))
                .select(
                    "node",
                    F.round(
                        F.lit(0.15) / PR_NODES
                        + F.lit(PR_DAMP) * (base + F.col("dmn")),
                        12,
                    ).alias("rank"),
                )
            )
        else:
            new = nodes.join(summed, "node", "left").select(
                "node",
                F.round(
                    F.lit(0.15) / PR_NODES + F.lit(PR_DAMP) * base, 12
                ).alias("rank"),
            )
        n_iters += 1
        if n_iters % PR_CKPT_EVERY == 0:
            new = new.localCheckpoint()
        # the ONLY per-iteration driver action: a 1-row max-|delta| scalar
        delta = (
            new.withColumnRenamed("rank", "nr")
            .join(rank, "node")
            .agg(F.max(F.abs(F.col("nr") - F.col("rank"))).alias("d"))
            .first()["d"]
        )
        rank = new
    pos_w = Window.orderBy(F.desc("pagerank"), F.asc("domain"))
    return (
        rank.select(
            F.col("node").alias("domain"),
            F.col("rank").alias("pagerank"),
            F.lit(n_iters).cast("long").alias("n_iters"),
        )
        .withColumn("pos", F.row_number().over(pos_w))
        .orderBy("domain")
    )


def _pr_converged_oracle(dangling: bool) -> str:
    """The recursive-CTE replay of the converge-or-cap loop: one row per
    iteration carrying the full rank vector as a LIST<STRUCT>, the
    recursive term unnesting it, computing the next vector under the
    identical 12-decimal/DECIMAL(28,12) contract, and gating the next
    step on the previous delta — so DuckDB stops at exactly the same
    iteration the Spark driver loop does (n_iters certifies it)."""
    edge_filter = (
        f" AND doc_id % {PR_NODES} < {PR_SINK_FLOOR}" if dangling else ""
    )
    dm_lateral = (
        f"""
          LATERAL (
            SELECT CAST(COALESCE(SUM(CAST(o.u.rank AS DECIMAL(28,12))),
                                 CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
                   / {PR_NODES} AS dmn
            FROM (SELECT unnest(it.ranks) AS u) o
            WHERE o.u.node NOT IN (SELECT src FROM outd)
          ) s0,"""
        if dangling
        else ""
    )
    dm_add = " + s0.dmn" if dangling else ""
    return f"""
    WITH RECURSIVE nodes AS (
        SELECT DISTINCT doc_id % {PR_NODES} AS node FROM documents
    ),
    edges AS (
        SELECT doc_id % {PR_NODES} AS src,
               (doc_id // {PR_NODES} + doc_id) % {PR_NODES} AS dst
        FROM documents
        WHERE doc_id % {PR_NODES} <> (doc_id // {PR_NODES} + doc_id) % {PR_NODES}{edge_filter}
    ),
    we AS (SELECT src, dst, COUNT(*) AS w FROM edges GROUP BY src, dst),
    outd AS (SELECT src, SUM(w) AS outw FROM we GROUP BY src),
    it(iter, ranks, delta) AS (
        SELECT 0,
               (SELECT list({{'node': node,
                              'rank': round(CAST(1.0 AS DOUBLE) / {PR_NODES}, 12)}}
                            ORDER BY node) FROM nodes),
               CAST(1 AS DOUBLE)
        UNION ALL
        SELECT it.iter + 1, s1.ranks2, s2.d
        FROM it,{dm_lateral}
          LATERAL (
            SELECT (SELECT list({{'node': nv.node, 'rank': nv.rank}}
                                ORDER BY nv.node)
                    FROM (
                      SELECT n.node,
                             round(CAST(0.15 AS DOUBLE) / {PR_NODES}
                                   + CAST({PR_DAMP} AS DOUBLE)
                                     * (CAST(COALESCE(c.sc,
                                             CAST(0 AS DECIMAL(28,12)))
                                           AS DOUBLE){dm_add}), 12) AS rank
                      FROM nodes n
                      LEFT JOIN (
                        SELECT e.dst AS node,
                               SUM(CAST(round(o.u.rank * e.w / od.outw, 12)
                                        AS DECIMAL(28,12))) AS sc
                        FROM we e
                        JOIN (SELECT unnest(it.ranks) AS u) o
                          ON o.u.node = e.src
                        JOIN outd od ON od.src = e.src
                        GROUP BY e.dst
                      ) c ON c.node = n.node
                    ) nv) AS ranks2
          ) s1,
          LATERAL (
            SELECT max(abs(nv.u.rank - o.u.rank)) AS d
            FROM (SELECT unnest(s1.ranks2) AS u) nv
            JOIN (SELECT unnest(it.ranks) AS u) o ON nv.u.node = o.u.node
          ) s2
        WHERE it.delta >= {PR_EPS} AND it.iter < {PR_MAX_ITERS}
    )
    SELECT o.u.node AS domain,
           o.u.rank AS pagerank,
           CAST(f.iter AS BIGINT) AS n_iters,
           ROW_NUMBER() OVER (ORDER BY o.u.rank DESC, o.u.node ASC) AS pos
    FROM (SELECT * FROM it WHERE iter = (SELECT max(iter) FROM it)) f,
         LATERAL (SELECT unnest(f.ranks) AS u) o
    ORDER BY domain
    """


@query("q_pagerank_converged", oracle=_pr_converged_oracle(dangling=False))
def q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank iterated UNTIL CONVERGENCE (max |delta| < {PR_EPS}, cap
    {PR_MAX_ITERS}) — the iterate-until-fixed-point pattern every real
    iterative workload needs, vs q_pagerank's fixed 3-step unroll. The
    driver loop collects exactly one SCALAR per iteration (the delta);
    rank vectors stay DataFrames; localCheckpoint every {PR_CKPT_EVERY}
    steps truncates lineage; the edge/degree frames checkpoint once and
    are reused every step. The DuckDB oracle replays the identical loop
    as a recursive CTE carrying the rank vector as a LIST<STRUCT>, so
    BOTH engines stop at the same iteration (`n_iters` is in the hash).

    Scale (100 TB graph): per-iteration cost is one co-located join on
    src + one map-side-combinable aggregate on dst, shuffling only
    (node, decimal) pairs; the delta check adds a 1-row aggregate, and
    checkpoint cadence bounds lineage depth regardless of iteration
    count — see docs/SCALE.md (iteration-depth note).

    Reference scope: extension surface (BASELINE.json north star)."""
    return _pagerank_converged_frame(spark, sf_dir, dangling=False)


@query("q_pagerank_dangling", oracle=_pr_converged_oracle(dangling=True))
def q_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with DANGLING-NODE mass redistribution, converged: the
    synthesis drops all out-edges of the top {PR_NODES - PR_SINK_FLOOR}
    domains (true sinks, derived from data via anti-join — never
    hard-coded), and each iteration recycles the mass parked on sinks as
    the standard +dm/N term, keeping total rank conserved at 1 (the
    production correction q_pagerank's docstring deferred; without it a
    real graph with sinks leaks rank every step). The dangling mass is a
    1-row exact-decimal aggregate broadcast into the update — never a
    second shuffle.

    Scale: identical per-iteration shape to q_pagerank_converged plus a
    1-row broadcast; the sink set is |nodes|-bounded metadata."""
    return _pagerank_converged_frame(spark, sf_dir, dangling=True)
