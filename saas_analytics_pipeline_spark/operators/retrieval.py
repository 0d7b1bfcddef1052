"""Retrieval / curation operators: BM25, kNN graph, hard negatives,
shingle containment, SemDedup-style threshold curve.

North-star extensions (BASELINE.json): the retrieval slice of a
training-data pipeline — lexical search (BM25) for targeted corpus probes,
kNN graphs and hard-negative mining for contrastive training sets, and
containment / cosine-threshold audits that size a dedup pass before the
expensive rewrite runs. The reference declares only the warehouse surface
(`/root/reference/README.md:8-9`); these extend it per the baseline brief.

Engine portability: every floating-point reduction is either a fixed-order
scalar expression (BM25's four-term sum), a sequential in-row fold
(cosine via aggregate/zip_with vs DuckDB list_sum), or an exact
BIGINT/DECIMAL aggregate — so the DuckDB oracles replay results
bit-for-bit under any partitioning.

Scale notes (100 TB):
- BM25: tokens explode scan-side; only (doc_id, 4 tf columns) shuffle.
  Corpus stats (N, avgdl, per-term df) are 1-row aggregates broadcast
  back; top-k is TakeOrderedAndProject, no global sort.
- kNN graph: pairs come only from shared coarse cells (label here, an
  IVF/LSH cell in production) — never a full cross join. Per-cell
  population is bounded by the quantizer, so the join fan-out is
  |cells| x cell^2, embarrassingly parallel on the cell key.
- containment: inverted index on shingle hash60s — (hash, doc_id) pairs
  shuffle, text never does; candidate pairs exist only where an actual
  shingle is shared. Common-shingle buckets are the skew risk: cap or
  drop stop-shingles above a document-frequency ceiling at scale.
- semdedup curve: same cell-blocked pair generation as the kNN graph; the
  output is |thresholds| counters, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.operators.dedup import SHINGLES_SQL, shingles_arr
from saas_analytics_pipeline_spark.operators.similarity import (
    norm_col as _norm_col,
)
from saas_analytics_pipeline_spark.functions import hash60_sql
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table, spread_for_fanout

# BM25 probe terms (pinned literals so the oracle replays the query);
# standard Robertson/Sparck-Jones parameters.
BM25_TERMS = ["spark", "table", "window", "hash"]
BM25_K1 = 1.2
BM25_B = 0.75

# in-row sequential double folds (identical order in DuckDB's list_sum)
_DOT_SQL = """
    list_sum(list_transform(list_zip({a}, {b}),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
"""
_NORM_SQL = """
    sqrt(list_sum(list_transform({v},
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
"""


def _cos_pairs() -> F.Column:
    """Rounded cosine between the a_emb and b_emb columns of a joined
    pair frame. Expects the side-projected norm columns a_n / b_n
    (similarity.norm_col) so per-pair work is the guarded dot only —
    bit-identical association to the fold (similarity.cos_expr)."""
    from saas_analytics_pipeline_spark.operators.similarity import cos_expr

    return F.round(
        cos_expr("a_emb", "b_emb", a_norm="a_n", b_norm="b_n"), 6
    )


_COS_SQL = (
    "round("
    + _DOT_SQL.format(a="a.embedding", b="b.embedding")
    + " / ("
    + _NORM_SQL.format(v="a.embedding")
    + " * "
    + _NORM_SQL.format(v="b.embedding")
    + "), 6)"
)


def _bm25_term_exprs() -> list[str]:
    """Per-term BM25 contribution as a scalar SQL expression string —
    shared verbatim between Spark (F.expr) and DuckDB so the double math
    is syntactically identical. Expects columns tf{i} (BIGINT), dl
    (BIGINT), and scalars n_docs, sum_dl (BIGINT), df{i} (BIGINT)."""
    out = []
    for i in range(len(BM25_TERMS)):
        idf = (
            f"ln((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        tf = f"CAST(tf{i} AS DOUBLE)"
        dl_norm = (
            f"(1.0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE)"
            f" * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))"
        )
        out.append(
            f"({idf} * {tf} * ({BM25_K1} + 1.0)"
            f" / ({tf} + {BM25_K1} * {dl_norm}))"
        )
    return out


# the BM25 scoring pipeline as a DuckDB CTE block — shared verbatim by
# q_bm25 and q_rrf_fusion so the lexical side of the fusion is, by
# construction, the same scorer the standalone key certifies
_BM25_CTE = f"""
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
        SELECT doc_id,
               {", ".join(
                   f"COUNT(*) FILTER (WHERE tok = '{t}') AS tf{i}"
                   for i, t in enumerate(BM25_TERMS))}
        FROM tok GROUP BY doc_id
    ),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
        FROM documents
    ),
    dfs AS (
        SELECT {", ".join(
            f"COUNT(*) FILTER (WHERE tf{i} > 0) AS df{i}"
            for i in range(len(BM25_TERMS)))}
        FROM tf
    ),
    scored AS (
        SELECT tf.doc_id,
               round({" + ".join(_bm25_term_exprs())},
                     6) AS bm25
        FROM tf JOIN dl USING (doc_id) CROSS JOIN corpus CROSS JOIN dfs
    )
"""


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25) for every document against the pinned BM25_TERMS —
    the Spark twin of the _BM25_CTE block, factored so q_bm25 and
    q_rrf_fusion score with the SAME pipeline (same shuffles, same
    fixed-order double math)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id").agg(
        *[
            F.count(F.when(F.col("tok") == t, 1)).alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    corpus = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("sum_dl"),
    )
    dfs = tf.agg(
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1)).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ]
    )
    terms = _bm25_term_exprs()
    return (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(dfs))
        .withColumn("bm25", F.round(F.expr(" + ".join(terms)), 6))
        .select("doc_id", "bm25")
    )


@query(
    "q_bm25",
    oracle=f"""
    WITH {_BM25_CTE}
    SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval over the corpus for a pinned term set
    (corpus probes: "find the docs about X" before a curation decision).

    Scale: tokens explode scan-side and collapse to per-doc tf columns
    (one shuffle of 5 ints per doc); corpus stats and per-term document
    frequencies are 1-row aggregates broadcast back; the four-term score
    is a fixed-order scalar expression (engine-portable); top-20 is
    TakeOrderedAndProject. Ref surface: README.md:8 (marts layer) +
    BASELINE.json text-analysis extension."""
    docs = load_table(spark, sf_dir, "documents")
    # measured: NO fan-out spread here — the token explode is ~150 short
    # tokens/doc and the tf aggregate collapses map-side, so the
    # conditional exchange (re-run for both tf consumers) costs more than
    # the parallelism buys; the 5-gram shingle explodes are where
    # spread_for_fanout pays (q_dup_span_fraction, q_containment)
    return (
        bm25_scored(docs)
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# Reciprocal-rank fusion of the lexical (BM25) and dense (cosine) systems:
# standard hybrid-retrieval combiner, score = sum over systems of
# 1 / (RRF_K + rank), missing-from-top-N contributes 0.
RRF_K = 60
RRF_DEPTH = 50  # per-system candidate depth
RRF_OUT = 20
# pinned dense query vector: 64 values, all k/16 with |k| <= 16, so the
# array<float> cast is EXACT and the double fold matches bit-for-bit
RRF_QUERY_VEC = [((i * 37) % 33 - 16) / 16.0 for i in range(64)]
_QV_SQL = (
    "CAST(["
    + ", ".join(repr(v) for v in RRF_QUERY_VEC)
    + "] AS FLOAT[])"
)
_DENSE_COS_SQL = (
    "round("
    + _DOT_SQL.format(a="embedding", b=_QV_SQL)
    + " / ("
    + _NORM_SQL.format(v="embedding")
    + " * "
    + _NORM_SQL.format(v=_QV_SQL)
    + "), 6)"
)


@query(
    "q_rrf_fusion",
    oracle=f"""
    WITH {_BM25_CTE},
    lex AS (
        SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id LIMIT {RRF_DEPTH}
    ),
    lexr AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                    AS BIGINT) AS lex_rank
        FROM lex
    ),
    dsc AS (
        SELECT vec_id, {_DENSE_COS_SQL} AS cos FROM embeddings
    ),
    den AS (
        SELECT vec_id, cos FROM dsc
        ORDER BY cos DESC, vec_id LIMIT {RRF_DEPTH}
    ),
    denr AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id)
                    AS BIGINT) AS dense_rank
        FROM den
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
               COALESCE(l.lex_rank, 0) AS lex_rank,
               COALESCE(d.dense_rank, 0) AS dense_rank
        FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.vec_id
    )
    SELECT doc_id, lex_rank, dense_rank,
           round(CASE WHEN lex_rank > 0
                      THEN 1.0 / ({RRF_K} + lex_rank) ELSE 0.0 END
               + CASE WHEN dense_rank > 0
                      THEN 1.0 / ({RRF_K} + dense_rank) ELSE 0.0 END,
                 6) AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {RRF_OUT}
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the lexical system
    (the SAME BM25 scorer q_bm25 certifies — shared bm25_scored /
    _BM25_CTE) and the dense system (cosine of each embedding against a
    pinned query vector) each contribute their top-{RRF_DEPTH} ranking;
    a document's fused score is sum over systems of 1/({RRF_K}+rank),
    with 0 for a system whose top list it missed (the standard RRF
    combiner for sparse+dense search). Embeddings are keyed by vec_id ==
    doc_id (TESTDATA.md), so the fusion is a full outer join of the two
    rank lists.

    Scale: each system's candidate list is TakeOrderedAndProject (no
    global sort — per-partition top-{RRF_DEPTH}, merged on the driver);
    the rank window then runs over <= {RRF_DEPTH} rows by construction
    (scale_lint allow-listed), and the fusion join is {RRF_DEPTH}x2 rows.
    The dense scan is scan-local codegen (the query vector is a literal;
    the guarded unrolled dot — similarity.dot_expr — never leaves the
    JVM). At 100 TB the per-system top-k IS the scale path: candidate
    depth bounds every post-scan structure."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex_top = (
        bm25_scored(docs)
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(RRF_DEPTH)
    )
    lexr = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .cast("long")
        .alias("lex_rank"),
    )

    qv = F.array(*[F.lit(v) for v in RRF_QUERY_VEC]).cast("array<float>")
    from saas_analytics_pipeline_spark.operators.similarity import cos_expr

    dense_top = (
        emb.withColumn("_qv", qv)
        .select(
            "vec_id",
            F.round(cos_expr("embedding", "_qv"), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(RRF_DEPTH)
    )
    denr = dense_top.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), "vec_id"))
        .cast("long")
        .alias("dense_rank"),
    )

    fused = (
        lexr.join(denr, lexr["doc_id"] == denr["vec_id"], "full_outer")
        .select(
            F.coalesce(lexr["doc_id"], denr["vec_id"]).alias("doc_id"),
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("dense_rank", F.lit(0)).alias("dense_rank"),
        )
    )
    lex_term = F.when(
        F.col("lex_rank") > 0, F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank"))
    ).otherwise(F.lit(0.0))
    dense_term = F.when(
        F.col("dense_rank") > 0,
        F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")),
    ).otherwise(F.lit(0.0))
    return (
        fused.withColumn("rrf", F.round(lex_term + dense_term, 6))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(RRF_OUT)
    )


KNN_K = 3


@query(
    "q_knn_graph",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               {_COS_SQL} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT vec_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pairs
    )
    SELECT vec_id, neighbor_id, rnk, cos
    FROM ranked WHERE rnk <= {KNN_K}
    ORDER BY vec_id, rnk
    """,
)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph over embeddings, blocked by coarse cell (the label column
    stands in for an IVF/LSH cell id): each vector's top-k in-cell
    neighbors by cosine. The adjacency feeds cluster-aware sampling and
    graph-based dedup (SemDedup-style).

    Scale: pairs are generated ONLY within a cell (equi-join on the cell
    key), never all-pairs; per-cell population is bounded by the
    quantizer, so work is |cells| x cell^2 and the join parallelizes on
    the cell key. Norms are side-projected once per vector; the per-pair
    cosine is the guarded JVM dot (similarity.cos_expr, no Python);
    ranks partition by vec_id — no global window."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_lab"),
        F.col("embedding").alias("a_emb"),
        _norm_col("embedding").alias("a_n"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_lab"),
        F.col("embedding").alias("b_emb"),
        _norm_col("embedding").alias("b_n"),
    )
    pairs = a.join(
        b, (F.col("a_lab") == F.col("b_lab")) & (F.col("a_id") != F.col("b_id"))
    ).select(
        F.col("a_id").alias("vec_id"),
        F.col("b_id").alias("neighbor_id"),
        _cos_pairs().alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KNN_K)
        .select("vec_id", "neighbor_id", "rnk", "cos")
        .orderBy("vec_id", "rnk")
    )


HN_ANCHORS = [0, 1, 2, 3]
HN_K = 5


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id,
               b.label AS neg_label, {_COS_SQL} AS cos
        FROM embeddings a JOIN embeddings b ON a.label <> b.label
        WHERE a.vec_id IN ({", ".join(str(i) for i in HN_ANCHORS)})
    ),
    ranked AS (
        SELECT anchor_id, neighbor_id, neg_label, cos,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pairs
    )
    SELECT anchor_id, neighbor_id, neg_label, rnk, cos
    FROM ranked WHERE rnk <= {HN_K}
    ORDER BY anchor_id, rnk
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-k most-similar vectors carrying a DIFFERENT label —
    the negatives that actually teach the model something.

    Scale: the anchor set is bounded (a training batch), so it broadcasts;
    the corpus streams past it map-side — corpus never shuffles, and the
    per-anchor top-k window runs on |anchors| x |corpus-candidates| rows
    partitioned by anchor. At 100 TB the corpus side is first pruned by
    ANN cells (q_similarity_ivf_pinned's probe routing); here the full
    scan IS the oracle-checkable exact form."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id").isin(HN_ANCHORS)).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_lab"),
        F.col("embedding").alias("a_emb"),
        _norm_col("embedding").alias("a_n"),
    )
    corpus = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_lab"),
        F.col("embedding").alias("b_emb"),
        _norm_col("embedding").alias("b_n"),
    )
    pairs = F.broadcast(anchors).join(
        corpus, F.col("a_lab") != F.col("b_lab")
    ).select(
        F.col("a_id").alias("anchor_id"),
        F.col("b_id").alias("neighbor_id"),
        F.col("b_lab").alias("neg_label"),
        _cos_pairs().alias("cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= HN_K)
        .select("anchor_id", "neighbor_id", "neg_label", "rnk", "cos")
        .orderBy("anchor_id", "rnk")
    )


@query(
    "q_containment",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, {hash60_sql("shingle")} AS h
        FROM (
            SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS n_inter
        FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a_id, b_id, n_inter,
           round(CAST(n_inter AS DOUBLE)
                 / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE CAST(n_inter AS DOUBLE)
          / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5
    ORDER BY containment DESC, a_id, b_id LIMIT 20
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle containment audit: |A∩B| / min(|A|,|B|) over candidate
    pairs — catches doc-inside-doc duplication (quotes, concatenated
    crawls) that symmetric Jaccard under-scores, the asymmetric companion
    to q_dedup_ngram.

    Scale: inverted index on shingle hash60s — only (hash, doc_id) pairs
    shuffle, text never moves, and candidate pairs exist only where a
    shingle is actually shared. Stop-shingle buckets are the skew risk:
    at 100 TB, drop hashes whose document frequency exceeds a ceiling
    (they contribute candidates, not evidence) — same discipline as
    q_dup_span_fraction's inverted index."""
    docs = spread_for_fanout(load_table(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", F.split("text", " ").alias("_toks"))
        .select("doc_id", F.explode(shingles_arr(F.col("_toks"))).alias("shingle"))
        # r13: xxhash64 over md5-derived hash60 — the hash only keys the
        # inverted-index join; counts collision-free-identical (guide §1.2)
        .select("doc_id", F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    x = sh.select(F.col("doc_id").alias("a_id"), "h")
    y = sh.select(F.col("doc_id").alias("b_id"), "h")
    inter = (
        x.join(y, (x.h == y.h) & (F.col("a_id") < F.col("b_id")))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    cont = F.col("n_inter").cast("double") / F.least("na", "nb").cast("double")
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .where(cont >= 0.5)
        .select(
            "a_id", "b_id", "n_inter", F.round(cont, 6).alias("containment")
        )
        .orderBy(F.desc("containment"), "a_id", "b_id")
        .limit(20)
    )


SEM_THRESHOLDS = [0.99, 0.95, 0.90, 0.80]


@query(
    "q_semdedup_curve",
    oracle=f"""
    WITH pairs AS (
        SELECT {_COS_SQL} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {", ".join(
               "CAST(COUNT(*) FILTER (WHERE cos >= "
               + str(t)
               + ") AS BIGINT) AS ge_"
               + str(t).replace("0.", "")
               for t in SEM_THRESHOLDS)}
    FROM pairs
    """,
)
def q_semdedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup threshold curve: how many in-cell pairs exceed each cosine
    cutoff — the go/no-go gauge that sizes a semantic-dedup pass (pick the
    threshold, predict the removal volume) BEFORE the expensive rewrite.

    Scale: pair generation is cell-blocked (label = coarse cell), identical
    to q_knn_graph; the output is |thresholds| counters — conditional
    counts that combine map-side, so the reduce moves a handful of longs
    per partition regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_lab"),
        F.col("embedding").alias("a_emb"),
        _norm_col("embedding").alias("a_n"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_lab"),
        F.col("embedding").alias("b_emb"),
        _norm_col("embedding").alias("b_n"),
    )
    pairs = a.join(
        b, (F.col("a_lab") == F.col("b_lab")) & (F.col("a_id") < F.col("b_id"))
    ).select(_cos_pairs().alias("cos"))
    aggs = [F.count("*").cast("bigint").alias("n_pairs")] + [
        F.count(F.when(F.col("cos") >= t, 1))
        .cast("bigint")
        .alias("ge_" + str(t).replace("0.", ""))
        for t in SEM_THRESHOLDS
    ]
    return pairs.agg(*aggs)


CLUSTER_SAMPLE_K = 5


@query(
    "q_cluster_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT label, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY {hash60_sql("'cs:' || CAST(vec_id AS VARCHAR)")},
                            vec_id
               ) AS rnk
        FROM embeddings
    )
    SELECT label, vec_id, rnk FROM ranked WHERE rnk <= {CLUSTER_SAMPLE_K}
    ORDER BY label, rnk
    """,
)
def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: exactly k vectors per coarse cell
    (label = IVF/cluster id), chosen by content-independent hash rank —
    the deterministic diversity sample behind "inspect k examples per
    cluster" and cluster-stratified eval sets. The embedding-space twin
    of q_reservoir_per_key; hash-ranked so the sample survives retries
    and repartitioning (rand() does not).

    Scale: one rank window per cell over (hash, id) pairs — embeddings
    themselves never shuffle; with a pathologically hot cell, two-phase
    top-k (per-partition prefilter, then rank survivors) slots in, same
    as q_reservoir_per_key."""
    from saas_analytics_pipeline_spark.functions import hash60 as _h60

    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        _h60(F.concat(F.lit("cs:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    return (
        e.select("label", "vec_id", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= CLUSTER_SAMPLE_K)
        .orderBy("label", "rnk")
    )


@query(
    "q_doc_length_percentiles",
    oracle="""
    WITH lens AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    ranked AS (
        SELECT source, n_tok,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_tok, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM lens
    )
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN n_tok END) AS BIGINT) AS p50_tokens,
           CAST(MAX(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN n_tok END) AS BIGINT) AS p90_tokens
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def q_doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length percentiles (p50/p90 in tokens) by
    EXACT discrete rank selection — the length-profile block of a dataset
    card (q_dataset_card reports the mean; tails are what length gates
    actually cut on). rank = ceil(p·n) with a doc_id tie-break, so both
    engines select the identical row.

    Scale: rank windows partition by source (co-partitioned with the
    aggregate; no global window). Exact selection is the audit twin — at
    100 TB swap in approx_percentile (mergeable sketch), the same
    contract as q_percentiles / q_median_mode."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    wr = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    wn = Window.partitionBy("source")
    ranked = lens.select(
        "source",
        "n_tok",
        F.row_number().over(wr).alias("rnk"),
        F.count("*").over(wn).alias("n"),
    )
    def pick(p: float, alias: str) -> F.Column:
        return (
            F.max(
                F.when(
                    F.col("rnk")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("n_tok"),
                )
            )
            .cast("bigint")
            .alias(alias)
        )

    return (
        ranked.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            pick(0.5, "p50_tokens"),
            pick(0.9, "p90_tokens"),
        )
        .orderBy("source")
    )
