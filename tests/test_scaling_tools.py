"""Unit tests for the scaling-bench fit and replica-generator SQL.

No Spark session needed — these pin the math/SQL the scale-evidence
tools rely on (tools/bench_scaling.py, tools/gen_sf1.py), so a slope-fit
or key-shift regression fails in the suite instead of silently producing
a wrong docs/BENCH_SF1.json.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import bench_scaling  # noqa: E402
import gen_sf1  # noqa: E402


def test_fit_slope_recovers_exact_loglog_line():
    # t = c * sf^0.7 -> slope 0.7 regardless of the constant
    sfs = [0.1, 1.0, 3.0]
    xs = [math.log10(s) for s in sfs]
    ys = [math.log10(4.2 * s**0.7) for s in sfs]
    assert abs(bench_scaling.fit_slope(xs, ys) - 0.7) < 1e-9


def test_fit_slope_two_points_is_the_pairwise_ratio():
    # with two points the fit degenerates to log10(t2/t1)/log10(sf2/sf1),
    # which for one decade of sf is exactly the old recorded exponent
    xs = [math.log10(0.1), math.log10(1.0)]
    ys = [math.log10(1.3), math.log10(2.6)]
    assert abs(bench_scaling.fit_slope(xs, ys) - math.log10(2.0)) < 1e-9


def test_copy_select_shifts_keys_and_suffixes_tokens():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        "(1, 'alpha beta', 10), (2, 'gamma delta', 11)"
        ") t(doc_id, text, n_chars)"
    )
    # patch the generator to read from this in-memory table
    sql = gen_sf1.copy_select("documents", ["doc_id", "text", "n_chars"], 2)
    sql = sql.replace(
        f"read_parquet('{gen_sf1.SRC}/documents.parquet')", "src"
    )
    rows = dict(
        (r[0], (r[1], r[2])) for r in con.execute(sql).fetchall()
    )
    stride = dict(gen_sf1.SHIFTS["documents"])["doc_id"]
    assert set(rows) == {1 + 2 * stride, 2 + 2 * stride}
    text, n_chars = rows[1 + 2 * stride]
    # every whitespace token gets the copy suffix; n_chars re-derives
    assert text == "alpha2 beta2"
    assert n_chars == len(text)


def test_copy_zero_is_the_identity():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        "(7, 'alpha beta', 10)) t(doc_id, text, n_chars)"
    )
    sql = gen_sf1.copy_select("documents", ["doc_id", "text", "n_chars"], 0)
    sql = sql.replace(
        f"read_parquet('{gen_sf1.SRC}/documents.parquet')", "src"
    )
    assert con.execute(sql).fetchall() == [(7, "alpha beta", 10)]
