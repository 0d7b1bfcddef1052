"""Oracle-regression guard for the r05 verification window's at-risk keys.

tools/selfcheck.py is the full replica of the driver's correctness gate,
but it runs out-of-band; this pytest pins the SAME value comparison (the
driver-mirroring pandas materialization) for the keys whose Spark or
oracle math was rewritten AFTER their last green driver row — the exact
class of silent regression that previously burned window slots (verdict
r01/r03). Runs at sf0.001 so the whole guard stays test-suite fast.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import selfcheck  # noqa: E402  (tools/selfcheck.py)

from saas_analytics_pipeline_spark import qcatalog  # noqa: E402

GUARD_SF = "/root/testdata/sf0.001"

# keys with no post-rewrite driver row: integer-unit TPC-H money math,
# the decimal-window ABC rollup, the inlined BM25 oracle, the new media
# header decode, and the section-2.9 streaming twins
GUARD_KEYS = [
    "q_tpch_pricing",
    "q_tpch_shipping",
    "q_tpch_local_volume",
    "q_tpch_promo_share",
    "q_tpch_top_supplier",
    "q_tpch_big_orders",
    "q_tpch_order_priority",
    "q_abc_analysis",
    "q_bm25",
    "q_media_dimensions",
    "q_stream_dedup",
    "q_stream_enrich",
]


# window keys that had no other pytest reference (selfcheck-only until
# now): same driver-mirroring comparison so every window key has an
# in-suite gate
COVERAGE_KEYS = [
    "q_dq_summary",
    "q_table_checksum",
    "q_pandas_scalar",
    "q_pandas_grouped_agg",
    "q_sessionize_pandas",
    "q_sequence_pattern",
    "q_doc_lang_matrix",
    "q_country_norm",
    "q_fx_join",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{GUARD_SF}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GUARD_KEYS + COVERAGE_KEYS)
def test_matches_oracle(spark, oracle_con, name):
    qcatalog.load_all()
    entry = qcatalog.QUERIES[name]
    assert entry.oracle is not None, f"{name} has no oracle"
    sdf = entry.fn(spark, GUARD_SF)
    s_cols, s_rows = selfcheck.pandas_frame(sdf.toPandas())
    cur = oracle_con.execute(entry.oracle)
    d_cols, d_rows = selfcheck.pandas_frame(cur.df())
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    ms = selfcheck.frame_to_multiset(
        s_cols, s_rows, selfcheck.norm_cell_pandas
    )
    md = selfcheck.frame_to_multiset(
        d_cols, d_rows, selfcheck.norm_cell_pandas
    )
    diffs = [(a, b) for a, b in zip(ms, md) if a != b][:3]
    assert ms == md, f"value mismatch, first diffs: {diffs}"


# ---------------------------------------------------------------------------
# Opt-in FULL-catalog sweep: SPARK_GRAFT_FULL_ORACLE=1 pytest
# tests/test_oracle_guard.py — every registered key against its oracle at
# sf0.001 with the driver-mirroring comparison. Off by default (adds
# ~10 min); the one-command reproduction of the round-end gold sweep that
# otherwise lives in tools/selfcheck.py invocations.
# ---------------------------------------------------------------------------

import os  # noqa: E402

qcatalog.load_all()
ALL_KEYS = sorted(qcatalog.QUERIES)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_ORACLE"),
    reason="full-catalog oracle sweep is opt-in (SPARK_GRAFT_FULL_ORACLE=1)",
)
@pytest.mark.parametrize("name", ALL_KEYS)
def test_full_catalog_matches_oracle(spark, oracle_con, name):
    entry = qcatalog.QUERIES[name]
    sdf = entry.fn(spark, GUARD_SF)
    s_cols, s_rows = selfcheck.pandas_frame(sdf.toPandas())
    if entry.oracle is None:
        # rows-only keys (documented sketches): execution + schema is the
        # strongest check an oracle-less key can get here
        assert len(s_cols) > 0
        return
    cur = oracle_con.execute(entry.oracle)
    d_cols, d_rows = selfcheck.pandas_frame(cur.df())
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    ms = selfcheck.frame_to_multiset(
        s_cols, s_rows, selfcheck.norm_cell_pandas
    )
    md = selfcheck.frame_to_multiset(
        d_cols, d_rows, selfcheck.norm_cell_pandas
    )
    diffs = [(a, b) for a, b in zip(ms, md) if a != b][:3]
    assert ms == md, f"value mismatch, first diffs: {diffs}"
