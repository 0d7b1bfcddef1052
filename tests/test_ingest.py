"""CSV ingestion: contract loads route dirty rows to rejects, discovery
loads infer types, and the audit trail reconciles counts."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F
from pyspark.sql import types as T

from saas_analytics_pipeline_spark.ingest import (
    csv_roundtrip_load,
    load_csv_contract,
    load_csv_discovery,
)

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
    ]
)

DIRTY_CSV = textwrap.dedent(
    """\
    order_id,amount,currency
    1,10.50,USD
    2,20.00,EUR
    not_a_number,99.0,USD
    3,5.25,GBP
    4,garbage_amount,USD
    """
)


def test_contract_load_routes_malformed_rows(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(DIRTY_CSV)
    valid, rejects, base = load_csv_contract(spark, str(p), SCHEMA)

    ok = {r["order_id"] for r in valid.collect()}
    # rows 1,2,3 parse fully; rows with type garbage are rejected whole
    assert {1, 2, 3} <= ok
    raw = [r["raw_line"] for r in rejects.collect()]
    assert any("not_a_number" in line for line in raw)
    assert any("garbage_amount" in line for line in raw)
    assert valid.count() + rejects.count() == 5
    base.unpersist()


def test_discovery_load_infers_types(spark, tmp_path):
    p = tmp_path / "seed.csv"
    p.write_text("code,rate\nUSD,1.0\nEUR,1.1\n")
    df = load_csv_discovery(spark, str(p))
    assert dict(df.dtypes) == {"code": "string", "rate": "double"}
    assert df.count() == 2


def test_roundtrip_load_writes_table_and_audit(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(DIRTY_CSV)
    counts = csv_roundtrip_load(
        spark,
        str(p),
        str(tmp_path / "tbl" / "orders"),
        str(tmp_path / "audit"),
        SCHEMA,
        load_ts="2026-01-01 00:00:00",
    )
    assert counts == {"valid": 3, "rejects": 2}

    audit = spark.read.parquet(str(tmp_path / "audit"))
    row = audit.collect()[0]
    assert row["table_name"] == "orders"
    assert row["load_rows"] == 5 and row["warehouse_rows"] == 3

    # truncate-and-replace: re-running the load does not duplicate the table
    csv_roundtrip_load(
        spark,
        str(p),
        str(tmp_path / "tbl" / "orders"),
        str(tmp_path / "audit"),
        SCHEMA,
        load_ts="2026-01-02 00:00:00",
    )
    assert spark.read.parquet(str(tmp_path / "tbl" / "orders")).count() == 3
    assert spark.read.parquet(str(tmp_path / "audit")).count() == 2


def test_schema_evolution_merge_read(spark, tmp_path):
    from saas_analytics_pipeline_spark.sources import load_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode(
        "append"
    ).parquet(path)
    # later load adds column b
    spark.createDataFrame(
        [(2, "y", 9.5)], "id long, a string, b double"
    ).write.mode("append").parquet(path)

    got = {r["id"]: (r["a"], r["b"]) for r in load_evolved(spark, path).collect()}
    assert got == {1: ("x", None), 2: ("y", 9.5)}


def test_custom_datasource_synth_events(spark):
    """Python DataSource API connector: partitioned, deterministic,
    executor-side generation."""
    from saas_analytics_pipeline_spark.sources_custom import register

    register(spark)
    df = (
        spark.read.format("synth_events")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500
    types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert types <= {"view", "click", "purchase", "error"}
    # deterministic across re-reads (task-retry safety)
    again = (
        spark.read.format("synth_events")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.exceptAll(again).count() == 0


def test_seed_loads_from_csv(spark):
    from saas_analytics_pipeline_spark import seeds

    fx = seeds.load_seed(spark, "fx_rates")
    rows = {r["r_name"]: r["rate"] for r in fx.collect()}
    assert rows["EUROPE"] == "1.1200"
    assert len(rows) == 5
    iso = seeds.load_seed(spark, "iso_countries")
    assert iso.count() == 25


def test_seed_malformed_raises(spark, tmp_path, monkeypatch):
    from saas_analytics_pipeline_spark import seeds

    bad = tmp_path / "fx_rates.csv"
    # second row has wrong arity -> structurally malformed
    bad.write_text("r_name,rate\nEUROPE,1.12\nonlyonefield\n")
    monkeypatch.setattr(seeds, "SEED_DIR", tmp_path)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="malformed"):
        seeds.load_seed(spark, "fx_rates")


def test_seed_values_escaping_and_empty(spark, tmp_path, monkeypatch):
    """The VALUES literal path must survive quotes AND backslashes in seed
    cells (Spark string literals treat backslash as an escape char), and
    a legitimately-empty seed file must load as an empty frame instead of
    emitting an unparseable 'VALUES '."""
    from saas_analytics_pipeline_spark import seeds

    tricky = tmp_path / "iso_countries.csv"
    tricky.write_text(
        "country_name\n"
        '"O\'Brien\\Land"\n'
        '"back\\\\slash"\n'
    )
    monkeypatch.setattr(seeds, "SEED_DIR", tmp_path)
    got = sorted(
        r["country_name"]
        for r in seeds.load_seed(spark, "iso_countries").collect()
    )
    # the CSV layer unescapes \\ -> \ ; the VALUES literal path must then
    # round-trip the parsed cells verbatim (this is what broke before the
    # backslash fix: Spark would re-interpret \L / \s as escapes)
    assert got == ["O'Brien\\Land", "back\\slash"]

    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    (empty_dir / "iso_countries.csv").write_text("country_name\n")
    monkeypatch.setattr(seeds, "SEED_DIR", empty_dir)
    empty = seeds.load_seed(spark, "iso_countries")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["country_name"]


def test_jsonl_contract_routes_malformed_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from saas_analytics_pipeline_spark.ingest import load_jsonl_contract

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta", "source": "s1"}\n'
        '{"doc_id": 2, "text": "gamma", "source": "s2"}\n'
        "this is not json at all\n"
        '{"doc_id": 3, "text": "delta epsilon zeta", "source": "s1"}\n'
        '{"doc_id": "oops_string", "text": 42}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    load = load_jsonl_contract(spark, str(p), schema)
    load.base.count()  # materialize shared scan before corrupt-only probes
    ok = {r["doc_id"] for r in load.valid.collect() if r["doc_id"] is not None}
    assert {1, 2, 3} <= ok
    raw = [r["raw_line"] for r in load.rejects.collect()]
    assert any("not json" in line for line in raw)
    load.unpersist()


def test_format_roundtrip_all_formats(spark, sf_dir, tmp_path):
    """Every interchange format round-trips the customer dim losslessly
    under a contract schema (ORC/JSON/CSV beside the parquet layout)."""
    from saas_analytics_pipeline_spark.ingest import (
        FORMATS,
        load_table_format,
        write_table_format,
    )
    from saas_analytics_pipeline_spark.sources import load_table

    dim = load_table(spark, sf_dir, "customer")
    want = sorted(map(tuple, dim.collect()))
    for fmt in FORMATS:
        path = str(tmp_path / f"rt_{fmt}")
        write_table_format(dim, path, fmt)
        back = load_table_format(spark, path, fmt, dim.schema)
        assert back.schema == dim.schema, fmt
        assert sorted(map(tuple, back.collect())) == want, fmt


def test_format_rejects_unknown(spark, tmp_path):
    import pytest as _pytest

    from saas_analytics_pipeline_spark.ingest import write_table_format

    df = spark.range(1)
    with _pytest.raises(ValueError, match="unsupported format"):
        write_table_format(df, str(tmp_path / "x"), "avro")
