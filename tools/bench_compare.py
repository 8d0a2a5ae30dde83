"""Per-query bench regression gate.

Compares a current bench result against a baseline round record and flags
any query slower than RATIO x its baseline time (new queries are listed,
never flagged). Usage:

    python tools/bench_compare.py BENCH_r01.json current.json [ratio]
    python tools/bench_compare.py BENCH_r01.json,BENCH_r02.json,BENCH_r03.json

A comma-separated baseline takes each query's MINIMUM across the listed
round records — the cross-session noise rule (BASELINE.md "Host-noise
note"): code-identical queries swing 2-3x between sessions on this
multi-tenant host, so a single round's time conflates plan cost with host
load; the cross-round minimum is the best observed cost of the CURRENT
plan, and only a ratio against that minimum indicates a genuine plan
regression.

Either file may be the driver's round record ({"parsed": {...}}) or the
raw one-line JSON that bench.py prints. With no current file, runs
bench.py in-process (env knobs SPARK_GRAFT_SF_DIR / BENCH_REPEATS apply).
Exit code 1 iff a regression is flagged.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return dict(doc["queries"], _total=doc.get("value"))


def load_min_queries(paths: list[str]) -> dict[str, float]:
    """Per-query minimum across several round records (see module doc)."""
    out: dict[str, float] = {}
    for p in paths:
        for name, t in load_queries(p).items():
            if t is None:
                continue
            if name not in out or t < out[name]:
                out[name] = t
    return out


def main() -> None:
    base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r01.json"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    if "," in base_path:
        base = load_min_queries(base_path.split(","))
        print(f"baseline = per-query min of {base_path}")
    else:
        base = load_queries(base_path)

    if len(sys.argv) > 2:
        cur = load_queries(sys.argv[2])
    else:
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            sys.exit(f"bench.py failed (rc={out.returncode}); stderr above")
        doc = json.loads(lines[-1])
        cur = dict(doc["queries"], _total=doc.get("value"))

    flagged = []
    print(f"{'query':24s} {'base':>8s} {'cur':>8s} {'ratio':>6s}")
    for name in sorted(set(base) | set(cur)):
        b, c = base.get(name), cur.get(name)
        if b is None and c is None:
            continue
        if b is None:
            print(f"{name:24s} {'new':>8s} {c:8.3f}")
            continue
        if c is None:
            print(f"{name:24s} {b:8.3f} {'gone':>8s}")
            continue
        r = c / b if b else float("inf")
        mark = ""
        if name != "_total" and r > ratio:
            mark = "  <-- REGRESSION"
            flagged.append((name, b, c, r))
        print(f"{name:24s} {b:8.3f} {c:8.3f} {r:6.2f}{mark}")
    if flagged:
        print(f"\n{len(flagged)} regression(s) > {ratio}x")
        sys.exit(1)
    print(f"\nno query regressed > {ratio}x")


if __name__ == "__main__":
    main()
