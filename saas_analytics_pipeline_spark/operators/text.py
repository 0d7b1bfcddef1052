"""Text analysis: stats, language-ID, quality scoring, token counts,
document fingerprinting.

North-star extensions (BASELINE.json) over the `documents` table. Everything
is built from JVM-side string/array functions (split, transform, aggregate,
md5) — no Python UDFs — so each op both scales (whole-stage codegen) and has
an exact DuckDB oracle.

Scale notes: all ops are scan-local (narrow) followed by one small
aggregation; at 100 TB they run at parquet-scan speed. The fingerprint
(sorted-unique-token md5) doubles as a dedup key: canonicalization +
hash-groupBy, the standard fuzzy-exact dedup used on web corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

# Deterministic marker-token sets for the language-ID heuristic. On real
# corpora these are per-language stopword/character-n-gram profiles; the
# synthetic docs share one vocabulary, so markers are fixed tokens — the
# heuristic's *mechanics* (score per language, argmax with stable tiebreak)
# are what the oracle checks.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "nicht"],
    "en": ["the", "fast", "query"],
    "es": ["el", "la", "data"],
    "fr": ["le", "et", "join"],
    "zh": ["hash", "vector", "stream"],
}

STOPWORDS = ["the", "a", "of", "and"]


def _score(lang: str) -> F.Column:
    toks = F.split("text", " ")
    return F.size(
        F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang]))
    )


def _score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({markers})))"
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: doc/token/char counts (ref shape:
    length histograms + lang distribution)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS true_lang,
               {_score_sql('de')} AS s_de,
               {_score_sql('en')} AS s_en,
               {_score_sql('es')} AS s_es,
               {_score_sql('fr')} AS s_fr,
               {_score_sql('zh')} AS s_zh
        FROM documents
    ),
    predicted AS (
        SELECT true_lang,
               CASE
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                        AND s_de >= s_zh THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                   WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                   WHEN s_fr >= s_zh THEN 'fr'
                   ELSE 'zh'
               END AS pred_lang
        FROM scored
    )
    SELECT true_lang, pred_lang, COUNT(*) AS n
    FROM predicted GROUP BY true_lang, pred_lang
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic -> confusion matrix vs the labeled
    lang. Argmax with alphabetical tiebreak (first language wins ties)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("lang").alias("true_lang"),
        *[_score(lg).alias(f"s_{lg}") for lg in sorted(LANG_MARKERS)],
    )
    langs = sorted(LANG_MARKERS)  # de, en, es, fr, zh
    pred = F.when(
        (F.col("s_de") >= F.col("s_en"))
        & (F.col("s_de") >= F.col("s_es"))
        & (F.col("s_de") >= F.col("s_fr"))
        & (F.col("s_de") >= F.col("s_zh")),
        "de",
    ).when(
        (F.col("s_en") >= F.col("s_es"))
        & (F.col("s_en") >= F.col("s_fr"))
        & (F.col("s_en") >= F.col("s_zh")),
        "en",
    ).when(
        (F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") >= F.col("s_zh")), "es"
    ).when(F.col("s_fr") >= F.col("s_zh"), "fr").otherwise("zh")
    assert langs == ["de", "en", "es", "fr", "zh"]
    return (
        scored.withColumn("pred_lang", pred)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_quality_score",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               n_chars,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stopword_ratio,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens) AS avg_token_len,
           COUNT(*) FILTER (WHERE n_tokens BETWEEN 50 AND 200) AS n_good_length
    FROM q GROUP BY lang
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring signals: length band, stopword ratio, mean token
    length — the standard pre-training quality filters, aggregated per lang."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    q = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"),
                    F.col("n_chars"), n_stop.alias("n_stop"))
    return q.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_stop").cast("double") / F.sum("n_tokens")).alias(
            "stopword_ratio"
        ),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias(
            "avg_token_len"
        ),
        F.count(F.when(F.col("n_tokens").between(50, 200), 1)).alias(
            "n_good_length"
        ),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT len(string_split(text, ' ')) AS n_tokens, COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram (whitespace tokenizer; the BPE-ish regex
    tokenizer lives in tokenize_regex below)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.size(F.split("text", " ")).alias("n_tokens")
    ).agg(F.count("*").alias("n_docs"))


def tokenize_regex(col: str = "text") -> F.Column:
    """BPE-ish regex tokenizer: words, numbers, punctuation runs as separate
    tokens (GPT-2-style pre-tokenization shape, public pattern)."""
    return F.expr(
        rf"regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+', 0)"
    )


@query(
    "q_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT source,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS fingerprint
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_unique_fingerprints
    FROM fp GROUP BY source
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted unique token set —
    order-insensitive canonical hash (bag-of-words dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    return (
        docs.select("source", fp.alias("fingerprint"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
        )
    )


@query(
    "q_corpus_filter",
    oracle="""
    WITH flagged AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS dup_rank
        FROM documents
    ),
    decided AS (
        SELECT source,
               dup_rank = 1 AS pass_dedup,
               n_tokens BETWEEN 30 AND 300 AS pass_length
        FROM flagged
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN pass_dedup THEN 1 END) AS after_dedup,
           COUNT(CASE WHEN pass_dedup AND pass_length THEN 1 END) AS kept
    FROM decided GROUP BY source
    """,
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus filter: the composed keep/drop decision a
    training-data pipeline applies per document — canonical-copy exact
    dedup (keep min doc_id per content hash) then length-band gate —
    reported as a per-source survival funnel. One window on the content
    hash + scan-local flags; near-dup and language gates chain the same
    way (their operators are oracle-checked separately; composition here
    stays SQL-replayable)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    flagged = docs.select(
        "source",
        (F.row_number().over(w) == 1).alias("pass_dedup"),
        F.size(F.split("text", " ")).between(30, 300).alias("pass_length"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("pass_dedup"), 1)).alias("after_dedup"),
        F.count(
            F.when(F.col("pass_dedup") & F.col("pass_length"), 1)
        ).alias("kept"),
    )
