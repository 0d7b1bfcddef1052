"""Python UDF surface: the three shapes the engine sanctions, each with a
reason to exist (built-ins cover everything else — see SURVEY 2.10).

- scalar pandas_udf: vectorized per-row logic the SQL surface can't
  express (here: a pure-python readability score). Arrow-batched; NEVER
  row-at-a-time @udf in hot paths.
- grouped-agg pandas_udf: custom aggregations (here: exact weighted
  median, which Spark has no builtin for).
- python UDTF: one-row-to-many table functions with python logic (here:
  sentence splitting). lateral-join shape.

All three ship with DuckDB-oracle-checked catalog queries so the Arrow
boundary itself is under the correctness gate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table


@pandas_udf(DoubleType())
def readability(text: pd.Series) -> pd.Series:
    """Vectorized pseudo-Flesch score: avg words/sentence + avg chars/word
    (deterministic arithmetic only, so the oracle can replay it)."""
    words = text.str.split(" ").map(len)
    chars = text.str.len()
    sentences = text.str.count(r"\.").clip(lower=1)
    return (words / sentences + chars / words).astype("float64")


@query(
    "q_pandas_scalar",
    oracle="""
    WITH scored AS (
        SELECT source,
               len(string_split(text, ' '))
                   / greatest(len(regexp_extract_all(text, '\\.')), 1)
               + length(text)::DOUBLE / len(string_split(text, ' '))
                   AS score
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           round(SUM(score), 4) AS total_score
    FROM scored GROUP BY source
    """,
)
def q_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a full pipeline (score -> groupBy), verified
    against the same arithmetic in SQL: the Arrow round-trip is exact."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", readability("text").alias("score"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("score"), 4).alias("total_score"),
        )
    )


@pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact weight-cumulative median (no Spark
    builtin). Per-group pandas — fine because groups are bounded."""
    df = pd.DataFrame({"v": values, "w": weights}).sort_values("v")
    cum = df["w"].cumsum()
    return float(df.loc[cum >= df["w"].sum() / 2.0, "v"].iloc[0])


@query(
    "q_pandas_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS wmedian
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (weighted median, unit weights == discrete
    median, which DuckDB can replay as quantile_disc)."""
    o = load_table(spark, sf_dir, "orders").withColumn("w", F.lit(1.0))
    return o.groupBy("o_orderpriority").agg(
        weighted_median("o_totalprice", "w").alias("wmedian")
    )


def sentences_udtf_cls():
    """Python UDTF: split a document into (sentence_idx, sentence) rows —
    the lateral table-function shape. Defined lazily so importing this
    module never requires the UDTF runtime."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string")
    class Sentences:
        def eval(self, text: str):
            for i, s in enumerate(text.split(".")):
                s = s.strip()
                if s:
                    yield i, s

    return Sentences


@query(
    "q_udtf_sentences",
    oracle="""
    WITH split AS (
        SELECT doc_id, trim(s) AS sentence
        FROM documents, unnest(string_split(text, '.')) AS t(s)
    )
    SELECT COUNT(*) AS n_sentences,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(length(sentence)) AS BIGINT) AS total_chars
    FROM split WHERE sentence <> ''
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF lateral join: documents exploded to sentences, rolled up —
    checked against the SQL unnest twin."""
    Sentences = sentences_udtf_cls()
    spark.udtf.register("sentences", Sentences)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        """
        SELECT d.doc_id, s.sentence
        FROM docs_udtf d, LATERAL sentences(d.text) s
        """
    )
    return out.agg(
        F.count("*").alias("n_sentences"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.length("sentence")).alias("total_chars"),
    )


@query(
    "q_array_hof",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(len(list_filter(embedding, x -> x > 0))) AS BIGINT)
               AS total_pos,
           round(SUM(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
               AS total_l2,
           CAST(SUM(CASE WHEN list_bool_or(list_transform(embedding,
               x -> abs(x) > 3.0)) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_spike
    FROM embeddings GROUP BY label
    """,
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings — filter / transform /
    aggregate / exists, all JVM-side lambda expressions (codegen'd, no
    Python): positive-component counts, L2 norms, spike detection."""
    emb = load_table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.size(F.filter("embedding", lambda x: x > 0))).alias("total_pos"),
        F.round(F.sum(l2), 4).alias("total_l2"),
        F.sum(
            F.when(
                F.exists("embedding", lambda x: F.abs(x) > 3.0), 1
            ).otherwise(0)
        ).alias("n_with_spike"),
    )


@query(
    "q_sequence_pattern",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events
    ),
    seqs AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ordered WHERE rn <= 1000 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(CASE WHEN path LIKE '%view%' THEN 1 END) AS saw_view,
           COUNT(CASE WHEN regexp_matches(path, 'view.*click.*purchase')
                      THEN 1 END) AS full_path,
           COUNT(CASE WHEN regexp_matches(path, 'error') THEN 1 END)
               AS hit_error
    FROM seqs
    """,
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching: each user's ordered event path collapsed
    to a string, regex-matched for the view->click->purchase journey (the
    poor-man's MATCH_RECOGNIZE — one agg + scan-local regex; the ordered
    collect rides the groupBy shuffle via sort_array over (ts, id)
    structs, keeping determinism under any partitioning).

    The path is capped at the user's first 1000 events (slice before join)
    so one pathological power-user cannot inflate a single row; the oracle
    truncates identically via a row_number filter."""
    ev = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                1,
                1000,
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    seqs = ev.groupBy("user_id").agg(path.alias("path"))
    return seqs.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("path").contains("view"), 1)).alias("saw_view"),
        F.count(
            F.when(F.col("path").rlike("view.*click.*purchase"), 1)
        ).alias("full_path"),
        F.count(F.when(F.col("path").rlike("error"), 1)).alias("hit_error"),
    )
