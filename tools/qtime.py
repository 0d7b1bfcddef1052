"""Time individual catalog queries with the noop sink (bench.py's
methodology: warm pass + median of N timed passes) and optionally dump
their formatted physical plans.

Usage:
  python tools/qtime.py [--passes N] [--plan-dir DIR] [--sf DIR] q1 [q2 ...]

Used by the r13 optimization round to isolate per-query cost (guide §1.4)
without paying for the whole headline set per iteration.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plan-dir", default=None)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from saas_analytics_pipeline_spark.session import get_spark

    spark = get_spark("qtime")
    qs = ent.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        df = qs[name](spark, args.sf)
        if args.plan_dir:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = Path(args.plan_dir) / f"{name}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(buf.getvalue())
        run(qs[name](spark, args.sf))  # warm
        samples = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            run(qs[name](spark, args.sf))
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(samples):.3f}s "
            f"min {min(samples):.3f}s over {args.passes}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
