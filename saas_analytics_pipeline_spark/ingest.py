"""CSV ingestion: the reference's load path, Spark-native.

The reference loads generator CSVs into the warehouse with schema
autodetect, header skip, and truncate-and-replace
(`/root/reference/data_gen/generate_and_load_script.py:174-193` —
`autodetect=True`:187, `WRITE_TRUNCATE`:188, `skip_leading_rows=1`:189),
then records loader-vs-warehouse row counts in a `raw_audit` table
(`/root/reference/models/schema.yml:122-141`). Dirty rows (type garbage,
truncated lines) must not kill the load — they route to a rejects relation
("staging, rejects" `/root/reference/README.md:36`;
`data_gen/pseudo_code_rules.txt:66-74`).

Spark mapping:
- **discovery load**: `inferSchema=True` for parity with autodetect —
  acceptable for seeds/small files; it costs an extra full pass, so
- **contract load** is the production path: explicit schema + PERMISSIVE
  mode with `columnNameOfCorruptRecord`, one pass, malformed rows carried
  per-row instead of failing the job (a 100 TB load cannot abort on row
  3 billion);
- **audit sink**: append (table, load_rows, warehouse_rows, load_ts) after
  each load; `q_audit_recon` asserts equality.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


class ContractLoad(NamedTuple):
    """Result of a contract CSV load. ``base`` is the cached scan both
    branches share — call :meth:`unpersist` once both have been consumed."""

    valid: DataFrame
    rejects: DataFrame
    base: DataFrame

    def unpersist(self) -> None:
        self.base.unpersist()


def load_csv_discovery(spark: SparkSession, path: str) -> DataFrame:
    """Schema-autodetect CSV load (reference parity: autodetect=True +
    skip_leading_rows=1). Two passes over the data — seeds/dims only."""
    return spark.read.csv(path, header=True, inferSchema=True)


def load_csv_contract(
    spark: SparkSession, path: str, schema: T.StructType
) -> ContractLoad:
    """One-pass contract load: explicit schema, malformed rows routed to a
    rejects frame instead of failing the job.

    Returns ``ContractLoad(valid, rejects, base)``: `valid` has the contract
    columns with nulls where individual fields failed to parse; `rejects`
    holds rows that were structurally malformed (wrong arity / unparseable),
    with the raw line preserved for replay; `base` is the shared cached scan
    — the caller unpersists it once both branches are consumed."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = spark.read.csv(
        path,
        header=True,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    ).cache()  # one scan serves both branches
    valid = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return ContractLoad(valid, rejects, df)


def load_jsonl_contract(
    spark: SparkSession, path: str, schema: T.StructType
) -> ContractLoad:
    """Contract load for JSON-lines corpora (the de-facto interchange format
    for document/training datasets): explicit schema, PERMISSIVE mode,
    malformed lines routed to rejects with the raw line preserved — the
    same (valid, rejects, base) contract as the CSV path, so downstream
    audit/write plumbing is shared.

    Scale: a JSONL file splits by line like CSV, so a 100 TB corpus fans
    out across tasks; explicit schema keeps it one pass (no inference
    scan) and prunes unprojected fields at the parser."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = spark.read.json(
        path,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    ).cache()  # one scan serves both branches
    valid = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return ContractLoad(valid, rejects, df)


def write_table_truncate(df: DataFrame, path: str) -> None:
    """Truncate-and-replace load (reference WRITE_TRUNCATE semantics) —
    full overwrite; incremental loads use plans/incremental.py instead."""
    df.write.mode("overwrite").parquet(path)


# Interchange formats the engine reads/writes natively. Parquet is the
# warehouse layout (columnar, predicate/column pushdown); ORC is the
# columnar alternative for systems standardized on it; JSONL and CSV are
# the row-wise interchange/dump formats (no pushdown — ingest-edge only,
# never the layout a 100 TB query scans).
FORMATS = ("parquet", "orc", "json", "csv")


def write_table_format(df: DataFrame, path: str, fmt: str) -> None:
    """Truncate-write in any supported interchange format."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)


def load_table_format(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType | str
) -> DataFrame:
    """Contract load of any supported format: explicit schema (JSON/CSV
    carry none; enforcing one on parquet/ORC pins the reader contract
    against file-level drift)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.load(path)


AUDIT_SCHEMA = (
    "table_name string, load_rows long, warehouse_rows long, load_ts timestamp"
)


def write_audit_row(
    spark: SparkSession,
    audit_path: str,
    table_name: str,
    load_rows: int,
    warehouse_rows: int,
    load_ts: str,
) -> None:
    """Append one reconciliation row per load (raw_audit,
    models/schema.yml:122-141). load_ts supplied by the caller/orchestrator
    so replays are deterministic."""
    row = spark.createDataFrame(
        [(table_name, load_rows, warehouse_rows)],
        "table_name string, load_rows long, warehouse_rows long",
    ).withColumn("load_ts", F.to_timestamp(F.lit(load_ts)))
    row.write.mode("append").parquet(audit_path)


def csv_roundtrip_load(
    spark: SparkSession,
    csv_path: str,
    table_path: str,
    audit_path: str,
    schema: T.StructType,
    load_ts: str,
) -> dict[str, int]:
    """Full reference-shaped load: CSV -> (valid, rejects) -> truncate-write
    -> audit row. Returns counts for the caller's logging."""
    load = load_csv_contract(spark, csv_path, schema)
    write_table_truncate(load.valid, table_path)
    n_valid = spark.read.parquet(table_path).count()
    n_rejects = load.rejects.count()
    load.unpersist()  # both branches consumed; release executor storage
    write_audit_row(
        spark, audit_path, table_path.rsplit("/", 1)[-1],
        n_valid + n_rejects, n_valid, load_ts,
    )
    return {"valid": n_valid, "rejects": n_rejects}
