"""Generate an sf1 dataset (10x sf0.1) for local scale benchmarking.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB scale claims need a
second measured point to expose superlinear queries (hidden driver-side
work, skew blowups, candidate-pair explosions). This replicates sf0.1
tenfold with key-space shifting so the WORKLOAD SHAPE is preserved:

- region/nation stay fixed (TPC-H semantics: dims that don't scale);
- every scaling table gets 10 copies with keys shifted by copy * stride
  (stride = the table's dense key-space size), FKs shifted consistently —
  per-key group sizes, join fan-outs, and skew profiles are IDENTICAL to
  sf0.1, only the number of key groups grows 10x;
- document text in copy i>0 gets a per-copy suffix appended to EVERY
  whitespace token: each copy is disjoint from every other copy in token,
  shingle, and n-gram space, so dedup/similarity candidate-pair structure
  replicates per copy (10x pairs) instead of exploding cross-copy (100x)
  — the behavior a real 10x-larger corpus with 10x vocab tail exhibits;
- embedding labels shift per copy (label + copy*10): cell/IVF blocking
  gets 10x cells of constant size, matching a re-trained quantizer on
  10x data.

Timestamps are kept as-is: the calendar span is constant and per-day
volume grows 10x (traffic growth, the common production shape).

Output: .localdata/sf1/*.parquet (one file per table, like the source
layout). ~170 MB. Run:  python tools/gen_sf1.py

Any replica size works the same way:  python tools/gen_sf1.py 30 sf3
builds a 30-copy (sf3) replica into .localdata/sf3 — the third point of
the measured scaling curve (tools/bench_scaling.py fits a log-log slope
per query over every point it finds). Token suffixing stays collision-
free at multi-digit copy indices because no source token ends in a digit
(checked below): a cross-copy collision would need t + str(i) ==
t' + str(j) with t, t' source tokens, which forces the longer-suffix
side's token to end in a digit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
LOCALDATA = Path(__file__).resolve().parent.parent / ".localdata"
COPIES = 10

# table -> list of (column, stride) key shifts; stride = dense key-space
# size at sf0.1 so shifted copies never collide
SHIFTS: dict[str, list[tuple[str, int]]] = {
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "lineitem": [
        ("l_orderkey", 150_000),
        ("l_partkey", 20_000),
        ("l_suppkey", 1_000),
    ],
    "events": [("event_id", 100_000), ("user_id", 1_500)],
    "documents": [("doc_id", 5_000)],
    "embeddings": [("vec_id", 2_000), ("label", 10)],
}
STATIC = ["region", "nation"]


def copy_select(table: str, cols: list[str], i: int) -> str:
    shifted = dict(SHIFTS[table])
    parts = []
    for c in cols:
        if c in shifted:
            parts.append(f"{c} + {i * shifted[c]} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # suffix every token: copy i is disjoint in token/shingle space
            parts.append(
                f"regexp_replace(text, '(\\S+)', '\\1{i}', 'g') AS text"
            )
        elif table == "documents" and c == "n_chars" and i > 0:
            parts.append(
                "CAST(length(regexp_replace(text, '(\\S+)', "
                f"'\\1{i}', 'g')) AS BIGINT) AS n_chars"
            )
        else:
            parts.append(c)
    return (
        f"SELECT {', '.join(parts)} "
        f"FROM read_parquet('{SRC}/{table}.parquet')"
    )


def main() -> None:
    global COPIES, DST
    if len(sys.argv) > 1:
        COPIES = int(sys.argv[1])
    DST = LOCALDATA / (sys.argv[2] if len(sys.argv) > 2 else "sf1")
    con = duckdb.connect()
    # the disjointness precondition for multi-digit copy suffixes: no
    # source token may end in a digit (see module docstring)
    # split on ANY whitespace — the suffixer targets \S+ runs, so a
    # space-only split would let a digit-ending token hide before a tab
    # or newline and slip past the guard
    n_digit = con.sql(
        "SELECT count(*) FROM "
        "(SELECT unnest(regexp_split_to_array(text, '\\s+')) AS t "
        f"FROM read_parquet('{SRC}/documents.parquet')) "
        "WHERE regexp_matches(t, '[0-9]$')"
    ).fetchone()[0]
    if n_digit:
        sys.exit(f"source corpus has {n_digit} digit-ending tokens — "
                 "copy suffixing would collide across copies")
    DST.mkdir(parents=True, exist_ok=True)
    for t in STATIC:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")
    for t in SHIFTS:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        union = " UNION ALL ".join(
            copy_select(t, cols, i) for i in range(COPIES)
        )
        con.sql(
            f"COPY ({union}) TO '{DST}/{t}.parquet' "
            "(FORMAT parquet, ROW_GROUP_SIZE 200000)"
        )
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
