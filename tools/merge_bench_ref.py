#!/usr/bin/env python3
"""Min-merge a bench run into the committed per-query reference.

Usage: tools/merge_bench_ref.py [run_json ...]   (default: bench_out.json)

bench_ref.json is the durable retime baseline Bench.scala reads by
default (SPARK_GRAFT_BENCH_REF): best-known per-query seconds across
rounds, min-merged so only genuinely better numbers lower the bar and
a noisy run can never raise it. Run this after every committed clean
bench; keep the output committed. The file MUST stay compact
(separators without spaces) — Bench.referenceTimes is
whitespace-tolerant since r14, but compact is the contract the round
workflow standardizes on.
"""
import json
import sys

REF = "bench_ref.json"
SF = "/root/testdata/sf0.1"


def main() -> None:
    runs = sys.argv[1:] or ["bench_out.json"]
    try:
        ref = json.load(open(REF))
        # not an assert: asserts are stripped under `python -O`, and a
        # cross-SF ref would silently poison every retime gate
        if ref.get("sf") != SF:
            raise SystemExit(f"{REF} is not an {SF} record "
                             f"(sf={ref.get('sf')!r})")
        merged = dict(ref["queries"])
    except FileNotFoundError:
        merged = {}
    errored: set[str] = set()
    for path in runs:
        run = json.load(open(path))
        if run.get("sf") != SF:
            raise SystemExit(f"{path}: sf={run.get('sf')!r}, expected {SF} "
                             "(cross-SF numbers would poison every retime)")
        if run.get("errors"):
            print(f"note: {path} carries errors {run['errors']} — "
                  "their keys are dropped from the merged reference so a "
                  "permanently-broken query's stale min ages out")
            errored.update(str(e) for e in run["errors"])
        for k, v in run["queries"].items():
            merged[k] = min(merged.get(k, v), v)
    # a key that errored in a run this merge saw no timing for must not
    # keep its stale min forever; a run that timed it anyway wins
    for k in errored:
        if k in merged and not any(
                k in json.load(open(p)).get("queries", {}) for p in runs):
            print(f"drop: {k} errored and produced no fresh timing")
            del merged[k]
    rec = {
        "metric": "total",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "queries": {k: merged[k] for k in sorted(merged)},
        "sf": SF,
        "note": ("min-merged per-query reference across rounds; "
                 "Bench.scala default SPARK_GRAFT_BENCH_REF"),
    }
    with open(REF, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    print(f"{REF}: {len(merged)} queries, ref total {rec['value']}s")


if __name__ == "__main__":
    main()
