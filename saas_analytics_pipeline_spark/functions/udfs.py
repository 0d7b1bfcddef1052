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
           SUM(length(sentence)) AS total_chars
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
