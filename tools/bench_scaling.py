"""Multi-point scaling bench: the headline set at sf0.1, sf1 (10x) and —
when .localdata/sf3 exists — sf3 (30x).

Measures every scale factor in ONE session (same JVM, same co-tenant
conditions) and fits, per query, the least-squares slope of
log10(seconds) over log10(sf):

    slope 1.0 == perfectly linear in data volume

into docs/BENCH_SF1.json, which bench.py attaches to its output line so
the round's BENCH record carries the scale evidence. A query whose time
grows faster than the data (slope > 1.0 + tolerance) has a hidden
superlinear cost — driver-side work, a skew blowup, a candidate-pair
explosion — that the single-point sf0.1 bench cannot see. Fixed per-query
overhead (planning, codegen) deflates slopes below 1.0, so a LOW slope is
expected for sub-second queries; only the high side flags. With two
points the fit degenerates to the pairwise ratio the tool originally
recorded; a third point (30x span) separates genuine growth from noise
on the middle measurement.

Run:  python tools/gen_sf1.py && python tools/gen_sf1.py 30 sf3 \
      && python tools/bench_scaling.py
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

# (name, sf value, dir) — sf3 is optional; measured only when generated
POINTS = [
    ("sf0.1", 0.1, "/root/testdata/sf0.1"),
    ("sf1", 1.0, str(ROOT / ".localdata" / "sf1")),
    ("sf3", 3.0, str(ROOT / ".localdata" / "sf3")),
]
PASSES = 2
# allow ~25% timing noise over one decade of data before flagging
SUPERLINEAR_EXPONENT = 1.0 + math.log10(1.25)


def fit_slope(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of ys over xs (both already log10)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def main() -> None:
    from bench import HEADLINE

    import __spark_entry__ as ent
    from saas_analytics_pipeline_spark.session import get_spark

    points = [
        (name, sf, d)
        for name, sf, d in POINTS
        if Path(d, "lineitem.parquet").exists()
    ]
    # the sf0.1 baseline anchors every slope AND the recorded note's
    # "replicas of sf0.1" claim — two replicas without it would fit a
    # one-octave span and mislabel it, so require the baseline explicitly
    if len(points) < 2 or points[0][0] != "sf0.1":
        sys.exit("need the sf0.1 baseline plus at least .localdata/sf1 — "
                 "run python tools/gen_sf1.py first")

    spark = get_spark("bench-scaling")
    qs = ent.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for sf_name, _sf, sf_dir in points:
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

    log_sfs = [math.log10(sf) for _, sf, _ in points]
    slopes = {
        name: round(
            fit_slope(
                log_sfs,
                [
                    math.log10(max(results[p_name][name], 1e-3))
                    for p_name, _, _ in points
                ],
            ),
            3,
        )
        for name in HEADLINE
    }
    superlinear = sorted(
        n for n, e in slopes.items() if e > SUPERLINEAR_EXPONENT
    )
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.strip()
    span = f"{points[0][1]:g}–{points[-1][1]:g}"
    out = {
        "note": (
            "recorded scaling run (tools/bench_scaling.py); "
            f"{len(points)} scale points (sf {span}) = replicas of sf0.1 "
            "(tools/gen_sf1.py), all timed in one session, per-query min "
            f"over {PASSES} passes after a warm pass; scaling_exponent is "
            "the per-query least-squares log-log slope over all points"
        ),
        "commit": commit,
        "scaling_exponent": slopes,
        "superlinear_threshold": round(SUPERLINEAR_EXPONENT, 3),
        "superlinear_queries": superlinear,
    }
    for p_name, _, _ in points:
        out[f"{p_name}_sec"] = results[p_name]
        out[f"{p_name}_total"] = round(sum(results[p_name].values()), 3)
    dst = ROOT / "docs" / "BENCH_SF1.json"
    dst.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({
        **{f"{p}_total": out[f"{p}_total"] for p, _, _ in points},
        "superlinear_queries": superlinear,
    }))
    print(f"wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
