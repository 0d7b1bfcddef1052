"""Run the whole measured-evidence probe suite and record docs/PROBES.json.

Each tools/*_probe.py prints one JSON result line to stdout and exits
nonzero on an internal equivalence failure; this runner executes them
sequentially (never concurrently — timings must not contend), collects
each probe's final JSON line, and writes the aggregate to
docs/PROBES.json so the round's evidence regenerates with one command on
the final tree:

  python tools/run_probes.py

Prereq: .localdata/sf3 (python tools/gen_sf1.py 30 sf3). Probes run with
their documented default arguments, EXCEPT scd2_probe, which runs at 30
versions/key — the depth where the incremental-vs-rebuild crossover is
visible (the shallow-history point is in docs/SCALE.md prose).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROBES: list[tuple[str, list[str]]] = [
    ("skew_probe", []),
    ("bucket_probe", []),
    ("scd2_probe", ["0.01", "30"]),
    ("stream_probe", []),
    ("ann_probe", []),
    ("lsh_probe", []),
    ("layout_probe", []),
    ("bloom_probe", []),
    ("html_probe", []),
    ("dupspan_probe", []),
    ("ann_fold_probe", []),
    ("skipping_probe", []),
    ("lake_maint_probe", []),
    ("catalog_maint_probe", []),
    ("catalog_reconcile_probe", []),
]


def main() -> int:
    if not (ROOT / ".localdata" / "sf3" / "lineitem.parquet").exists():
        sys.exit(".localdata/sf3 missing — run: python tools/gen_sf1.py 30 sf3")

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.strip()

    # optional probe-name args: run a SUBSET and merge into the existing
    # record (still sequential, still uncontended — lets a long regen
    # split across invocations; the commit stamp is refreshed, so finish
    # every chunk on the same tree)
    subset = set(sys.argv[1:])
    todo = [(n, a) for n, a in PROBES if not subset or n in subset]
    unknown = subset - {n for n, _ in PROBES}
    if unknown:
        sys.exit(f"unknown probes: {sorted(unknown)}")

    out: dict = {"commit": commit, "probes": {}}
    dst0 = ROOT / "docs" / "PROBES.json"
    if subset and dst0.exists():
        prev = json.loads(dst0.read_text())
        out["probes"].update(prev.get("probes") or {})
    failures = []
    for name, args in todo:
        print(f"# running {name} {' '.join(args)}", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, str(ROOT / "tools" / f"{name}.py"), *args],
                capture_output=True, text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            failures.append(name)
            out["probes"][name] = {"error": "timeout", "limit_sec": 1800}
            continue
        lines = [
            ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            failures.append(name)
            out["probes"][name] = {
                "error": proc.returncode,
                "tail": (proc.stderr or proc.stdout)[-500:],
            }
            continue
        parsed = [json.loads(ln) for ln in lines]
        # a probe may emit one line per variant (skew off/on) — keep all
        out["probes"][name] = parsed[0] if len(parsed) == 1 else parsed

    dst = ROOT / "docs" / "PROBES.json"
    dst.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {dst}", file=sys.stderr)
    print(json.dumps({"ok": sorted(set(out["probes"]) - set(failures)),
                      "failed": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
