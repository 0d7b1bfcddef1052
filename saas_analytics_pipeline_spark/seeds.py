"""Seed tables as real CSV files, loaded through the contract ingest path.

The reference declares CSV seed tables (`/root/reference/dbt_project.yml:52-57`;
`iso_countries.csv`, `fx_rates.csv` named at `/root/reference/README.md:21-23`)
that dbt materializes into the warehouse. Here each seed is a checked-in CSV
under ``saas_analytics_pipeline_spark/seeds/`` loaded via
:func:`ingest.load_csv_contract` (explicit schema, PERMISSIVE, rejects
surfaced) — editing the CSV changes the pipeline, exactly like editing a dbt
seed.

Scale note: seeds are dim-sized by definition, so every join site wraps them
in ``F.broadcast`` — the fact side never shuffles for a seed join.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from saas_analytics_pipeline_spark.ingest import load_csv_contract

SEED_DIR = Path(__file__).resolve().parent / "seeds"

SEED_SCHEMAS: dict[str, T.StructType] = {
    # rates kept as strings in the contract; call sites cast to the exact
    # decimal they need (money math must not round-trip through float)
    "fx_rates": T.StructType(
        [
            T.StructField("r_name", T.StringType()),
            T.StructField("rate", T.StringType()),
        ]
    ),
    "iso_countries": T.StructType(
        [T.StructField("country_name", T.StringType())]
    ),
    # pinned BPE merge table (rank order), learned offline with classic
    # pair-frequency BPE over the sf0.01 corpus word frequencies — see
    # operators/text.py::q_bpe_tokenize for the application contract
    "bpe_merges": T.StructType(
        [
            T.StructField("rank", T.StringType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
        ]
    ),
    # saturation-depth table (89 ranks, tools/bpe_learn.py) for the
    # multi-pass apply contract — operators/text.py::q_bpe_multipass
    "bpe_merges_full": T.StructType(
        [
            T.StructField("rank", T.StringType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
        ]
    ),
}


def seed_path(name: str) -> str:
    return str(SEED_DIR / f"{name}.csv")


# Validated-seed cache, keyed by (SparkContext, resolved path): the
# CSV-contract validation (cached scan + three actions) costs seconds per
# load while a seed file is immutable for a session's lifetime — same
# contract as sources._RELATION_CACHE. Keying by path (not name) keeps a
# redirected SEED_DIR (tests, alternate seed sets) from hitting a stale
# entry.
_SEED_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_seed(spark: SparkSession, name: str) -> DataFrame:
    """Load a seed CSV under its declared schema; raise if any row is
    malformed (a broken seed must fail the build, dbt-seed semantics).

    The seed is materialized on the driver and returned as a local
    DataFrame — dbt-seed semantics (seed file -> warehouse table), and a
    seed is dim-sized by contract so the collect is a few KB. The returned
    frame carries no CSV scan, which also sidesteps Spark's restriction on
    corrupt-record-only projections."""
    key = (spark.sparkContext.applicationId, seed_path(name))
    cached = _SEED_CACHE.get(key)
    if cached is not None:
        return cached
    load = load_csv_contract(spark, seed_path(name), SEED_SCHEMAS[name])
    # Materialize the cached scan once; both branch reads below hit it.
    load.base.count()
    bad = load.rejects.limit(1).count()
    rows = load.valid.collect()
    load.unpersist()
    if bad:
        raise ValueError(f"seed {name!r} has malformed rows")
    # Return a pure-JVM VALUES LocalRelation, NOT createDataFrame(rows):
    # a Python-list frame executes as a pickled-object RDD that launches a
    # Python worker on EVERY downstream action (measured ~5 s to collect
    # 5 rows; a seed x seed cartesian pays it per side), and parallelizes
    # a 5-row seed into defaultParallelism slices (32 x 32 near-empty
    # cartesian tasks). The VALUES form stays in whole-stage codegen,
    # broadcasts cleanly, and costs microseconds. Seed cells are strings
    # by contract (SEED_SCHEMAS), quoted with SQL escaping.
    schema = SEED_SCHEMAS[name]
    cols = ", ".join(f.name for f in schema.fields)

    def lit(v: str | None) -> str:
        if v is None:
            return "NULL"
        # Spark string literals treat backslash as an escape char (unless
        # spark.sql.parser.escapedStringLiterals flips the dialect), so
        # escape it FIRST, then the quotes.
        s = str(v).replace("\\", "\\\\").replace("'", "''")
        return "'" + s + "'"

    if rows:
        values = ", ".join(
            "(" + ", ".join(lit(row[f.name]) for f in schema.fields) + ")"
            for row in rows
        )
        out = spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")
    else:
        # 'VALUES ' with no tuples is a parse error; an all-rows-rejected
        # seed already raised above, so this is the legitimately-empty-file
        # case — an empty LocalRelation keeps downstream plans valid.
        out = spark.createDataFrame([], schema)
    _SEED_CACHE[key] = out
    return out


def oracle_read_csv(name: str) -> str:
    """DuckDB twin: read the SAME seed file the Spark side loads, with
    pinned column types so oracle dtypes stay deterministic."""
    cols = ", ".join(
        f"'{f.name}': 'VARCHAR'" for f in SEED_SCHEMAS[name].fields
    )
    return (
        f"read_csv('{seed_path(name)}', header=true, columns={{{cols}}})"
    )
