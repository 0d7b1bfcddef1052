"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF decode.

North-star extension (BASELINE.json): treat image/audio/video as opaque
`binary` columns with typed metadata, and run decode / feature-extract as
Arrow-batched pandas over mapInPandas. The container has no codec libraries,
so the *decode* step is a clearly-marked stub (NotImplementedError for real
codecs, a deterministic byte-level extractor as the testable fake); the
Spark-side plumbing — schema, batch iteration, partitioning — is real.

Scale notes (100 TB of media): payload bytes stay columnar in parquet and
flow to Python via Arrow record batches (mapInPandas), never row-at-a-time.
Batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch so a
partition of large blobs doesn't OOM the worker. Feature extraction emits a
NARROW schema (drop the payload) so only features shuffle downstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, n_tokens int, format string"
)


def build_media_frame(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal frame from documents: payload = utf-8 bytes
    of the text (stand-in for image/audio bytes), metadata struct alongside.
    In production this is `spark.read.format('binaryFile')` or a parquet
    lake with a binary column."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, mime: str) -> Any:
    """Real-codec decode entry point — STUB.

    Image/audio/video decoding needs libs (PIL, librosa, av) absent from
    this container. The Spark plumbing calls extract_features below, which
    uses only byte-level operations; swap this in when codecs exist."""
    raise NotImplementedError(
        f"no codec available for {mime!r}; install PIL/librosa/av and "
        "implement decode_media for real media types"
    )


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: deterministic byte-level feature extraction.
    Arrow batches in, narrow feature rows out (payload dropped)."""
    for pdf in it:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "n_tokens": payloads.map(
                    lambda b: len(b.split(b" "))
                ).astype("int32"),
                "format": pdf["media_meta"].map(lambda m: m["mime"]),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return media.mapInPandas(_extract_batch, schema=FEATURE_SCHEMA)


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_unique_payloads
    FROM documents GROUP BY source
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata rollup: payload sizes + content hashes per
    source — all JVM-side (length/md5 work directly on binary)."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    return media.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).alias("n_unique_payloads"),
    )


@query(
    "q_multimodal_features",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(first_byte) AS BIGINT) AS first_byte_sum
    FROM f
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF (mapInPandas) feature extraction over binary payloads,
    verified against a pure-SQL oracle computing the same byte-level
    features from the source text — proves the Arrow plumbing is lossless."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(build_media_frame(docs))
    return feats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("first_byte").cast("long").alias("first_byte_sum"),
    )


# --------------------------------------------------------------------------
# resize / frame-sample plumbing (decode itself is stubbed: no codecs here)
# --------------------------------------------------------------------------
RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAME_BYTES = 256  # fake frame = fixed byte window of the payload


def _resize_batch(w: int, h: int):
    """Deterministic fake resize: crop/pad payload to w*h bytes. Real
    impl decodes via decode_media and resamples pixels; the batch shape
    (binary in -> binary out, 1:1 rows, narrow meta) is what production
    needs and what tests pin."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = w * h
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b[:size]).ljust(size, b"\0")
                    ),
                    "width": w,
                    "height": h,
                }
            )

    return fn


def resize_media(media: DataFrame, width: int = 32, height: int = 8) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads (1 row in -> 1 row out,
    fixed-size output payloads)."""
    return media.select("doc_id", "payload").mapInPandas(
        _resize_batch(width, height), schema=RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: split each payload into FRAME_BYTES windows and keep
    every Nth (1 row in -> many rows out). Pure JVM: slice the binary with
    substring under an exploded frame index — no Python for the fan-out, so
    a 100 TB video lake fans out scan-side at full codegen speed."""
    n_frames = F.ceil(F.length("payload") / F.lit(FRAME_BYTES)).cast("int")
    return (
        media.select("doc_id", "payload", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1)
            ).alias("frame_idx"),
            "payload",
        )
        .where(F.col("frame_idx") % every_n == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
            ).alias("frame"),
        )
    )


@query(
    "q_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    ),
    f AS (
        SELECT doc_id,
               CAST(ceil(nb / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
               -- every 4th frame starting at 0: ceil(n_frames / 4)
               CAST(ceil(ceil(nb / {FRAME_BYTES}.0) / 4.0) AS BIGINT) AS n_sampled
        FROM m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(SUM(n_sampled) AS BIGINT) AS sampled_frames
    FROM f
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup: total vs kept frames per the every-4th policy,
    verified against closed-form SQL on payload sizes (proves the
    explode/substring fan-out emits exactly the right frames)."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    frames = sample_frames(media, every_n=4)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
    )
    totals = (
        media.select(
            "doc_id",
            F.ceil(F.length("payload") / F.lit(FRAME_BYTES))
            .cast("long")
            .alias("n_frames"),
        )
        .join(per_doc, "doc_id")
    )
    return totals.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.sum("n_sampled").cast("long").alias("sampled_frames"),
    )


@query(
    "q_dedup_binary",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, source, md5(text) AS h FROM documents
    )
    SELECT h AS payload_hash,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS survivor_id
    FROM hashed
    GROUP BY h
    ORDER BY n_copies DESC, payload_hash
    LIMIT 20
    """,
)
def q_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup over the media frame: top duplicated
    payloads by copy count, with provenance spread and a keep-first
    survivor — the media twin of q_dedup_exact (images/audio dedup by
    content digest before any decode).

    Scale: md5 runs directly on the binary column scan-side; only the
    (hash, doc_id, source) triple ever shuffles — payload bytes stay in
    the scan, which is the entire point at 100 TB of media. The top-20 is
    TakeOrderedAndProject with a hash tie-break (deterministic under any
    partitioning). Oracle note: Spark hashes the payload BYTES
    (utf-8-encoded text, see build_media_frame); DuckDB's md5(text) hashes
    the same utf-8 byte stream, so the digests agree."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    return (
        media.select("doc_id", "source", F.md5("payload").alias("payload_hash"))
        .groupBy("payload_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("survivor_id"),
        )
        .orderBy(F.desc("n_copies"), F.asc("payload_hash"))
        .limit(20)
    )
