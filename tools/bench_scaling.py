"""Two-point scaling bench: the headline set at sf0.1 AND sf1 (10x).

Measures both scale factors in ONE session (same JVM, same co-tenant
conditions) and records the per-query scaling exponent

    exponent = log10(t_sf1 / t_sf0.1)        # 1.0 == perfectly linear

into docs/BENCH_SF1.json, which bench.py attaches to its output line so
the round's BENCH record carries the scale evidence. A query whose time
step exceeds the 10x data step (exponent > 1.0 + tolerance) has a hidden
superlinear cost — driver-side work, a skew blowup, a candidate-pair
explosion — that the single-point sf0.1 bench cannot see. Fixed per-query
overhead (planning, codegen) deflates exponents below 1.0, so a LOW
exponent is expected for sub-second queries; only the high side flags.

Run:  python tools/gen_sf1.py && python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import math
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF01 = "/root/testdata/sf0.1"
SF1 = str(ROOT / ".localdata" / "sf1")
PASSES = 2
# 10x data; allow ~25% timing noise on the ratio before flagging
SUPERLINEAR_EXPONENT = 1.0 + math.log10(1.25)


def main() -> None:
    from bench import HEADLINE

    import __spark_entry__ as ent
    from saas_analytics_pipeline_spark.session import get_spark

    if not Path(SF1, "lineitem.parquet").exists():
        sys.exit(f"{SF1} missing — run python tools/gen_sf1.py first")

    spark = get_spark("bench-scaling")
    qs = ent.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]:
        for name in HEADLINE:  # warm pass: JIT + codegen caches + footers
            run(qs[name](spark, sf_dir))
        timings: dict[str, float] = {}
        for _ in range(PASSES):
            for name in HEADLINE:
                t0 = time.perf_counter()
                run(qs[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
        results[sf_name] = timings
        print(f"# {sf_name}: total {sum(timings.values()):.2f}s", file=sys.stderr)

    exponents = {
        name: round(
            math.log10(max(results["sf1"][name], 1e-3) / max(results["sf0.1"][name], 1e-3)),
            3,
        )
        for name in HEADLINE
    }
    superlinear = sorted(
        n for n, e in exponents.items() if e > SUPERLINEAR_EXPONENT
    )
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "note": (
            "recorded two-point scaling run (tools/bench_scaling.py); "
            "sf1 = 10x sf0.1 replica (tools/gen_sf1.py), both scale "
            "factors timed in one session, per-query min over "
            f"{PASSES} passes after a warm pass"
        ),
        "commit": commit,
        "sf0.1_sec": results["sf0.1"],
        "sf1_sec": results["sf1"],
        "scaling_exponent": exponents,
        "superlinear_threshold": round(SUPERLINEAR_EXPONENT, 3),
        "superlinear_queries": superlinear,
        "sf0.1_total": round(sum(results["sf0.1"].values()), 3),
        "sf1_total": round(sum(results["sf1"].values()), 3),
    }
    dst = ROOT / "docs" / "BENCH_SF1.json"
    dst.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: out[k] for k in
                      ("sf0.1_total", "sf1_total", "superlinear_queries")}))
    print(f"wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
