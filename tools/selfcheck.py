"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given sf dir, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows stringified
and sorted). Run:
  python tools/selfcheck.py [--pandas] [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs the Spark side on a bare SparkSession (no
session.get_spark configs), mirroring the driver's environment.

Two comparison modes:

* default — collect() Rows vs duckdb fetchall(): compares Python objects,
  so DuckDB HUGEINT 150 and Spark int 150 both render "150".
* ``--pandas`` — mirrors the DRIVER's materialization: Spark
  ``.toPandas()`` vs duckdb ``.df()``. Numpy dtypes leak into the cell
  reprs (HUGEINT -> float64 "150.0" vs Spark int64 "150"), which is
  exactly the class of mismatch the driver's hash sees. An oracle is only
  "done" when it passes THIS mode.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def norm_cell_pandas(v) -> str:
    """Driver-style cell render: numpy scalars keep their dtype's str form
    (int64 150 -> '150', float64 150.0 -> '150.0'), so dtype asymmetries
    between Spark's toPandas() and DuckDB's .df() become visible. Only
    genuine missing values are collapsed to NULL."""
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    # Driver-observed behavior: a DuckDB DATE materializes as a midnight
    # datetime64 while Spark's DateType stays datetime.date, and the driver
    # hashes them equal (q_revenue_daily r01 green) — normalize the same way.
    import datetime

    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return str(v)
    return str(v)


def frame_to_multiset(cols, rows, cell=norm_cell):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(cell(r[i]) for i in order) for r in rows)


def pandas_frame(pdf):
    """(cols, rows) from a pandas DataFrame, cells as the raw numpy/pandas
    objects so norm_cell_pandas sees true dtypes."""
    cols = list(pdf.columns)
    rows = list(pdf.itertuples(index=False, name=None))
    return cols, rows


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    pandas_mode = "--pandas" in argv
    if pandas_mode:
        argv.remove("--pandas")
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    cell = norm_cell_pandas if pandas_mode else norm_cell

    import __spark_entry__ as ent

    if vanilla:
        # the DRIVER builds its own session without session.get_spark's
        # configs; --vanilla reproduces that regime so a query that only
        # works under our tuned session (timezone, nanos, NTZ inference —
        # all meant to be applied at load time by ensure_session_confs)
        # fails HERE instead of in the driver window
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from saas_analytics_pipeline_spark.session import get_spark

        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if pandas_mode:
                s_cols, s_rows = pandas_frame(sdf.toPandas())
            else:
                s_cols = sdf.columns
                s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            if pandas_mode:
                d_cols, d_rows = pandas_frame(cur.df())
            else:
                d_cols = [d[0] for d in cur.description]
                d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            ms, md = frame_to_multiset(s_cols, s_rows, cell), frame_to_multiset(
                d_cols, d_rows, cell
            )
            if ms != md:
                diff = [
                    (a, b) for a, b in zip(ms, md) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(
                f"pass {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)"
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
