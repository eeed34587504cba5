#!/usr/bin/env python3
"""Min-merge a bench run into the committed per-query reference.

Usage: tools/merge_bench_ref.py [--drop-errored] [run_json ...]
       (default run: bench_out.json)

bench_ref.json is the durable retime baseline Bench.scala reads by
default (SPARK_GRAFT_BENCH_REF): best-known per-query seconds across
rounds, min-merged so only genuinely better numbers lower the bar and
a noisy run can never raise it. Run this after every committed bench;
keep the output committed. Inflated runs (controls >1.3x refs) merge
their EXISTING keys raw (min only lowers) while NEW keys enter divided
by the run's control median — a persistently slower host can no
longer deadlock the close-out, and a sick-box number still can't
loosen any gate. The file MUST stay compact (separators without
spaces) — Bench.referenceTimes is whitespace-tolerant since r14, but
compact is the contract the round workflow standardizes on.
"""
import json
import sys

REF = "bench_ref.json"
SF = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    drop_errored = "--drop-errored" in args
    runs = [a for a in args if not a.startswith("--")] or ["bench_out.json"]
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
        # Inflated runs (controls read >1.3x their refs — box health,
        # not plans) used to be refused outright, which DEADLOCKED the
        # close-out on a persistently slower host (r17 verdict task 2):
        # min-merge can never RAISE an existing bar, so existing keys
        # always merge at their raw values; only a round's NEW queries
        # would enter at sick-box values and loosen their retime gates
        # from day one — those enter NORMALIZED by the run's own
        # control median (the box's measured slowdown), recorded loud.
        # --force keeps the old raw-entry behavior for new keys.
        norm = 1.0
        if run.get("inflated") is True and "--force" not in sys.argv:
            norm = max(1.0, float(run.get("controls_median", 1.0)))
            print(f"{path}: inflated:true (control median {norm}x) — "
                  "existing keys min-merge raw; new keys enter divided "
                  f"by {norm}")
        if run.get("errors"):
            errored.update(str(e) for e in run["errors"])
        for k, v in run["queries"].items():
            if k in merged:
                merged[k] = min(merged[k], v)
            else:
                entry = round(v / norm, 3)
                if norm != 1.0:
                    print(f"new: {k} enters at {entry}s "
                          f"(raw {v}s / control median {norm})")
                merged[k] = entry
    # A key that errored and produced no timing in any merged run: keep
    # its best-known min by default — one transiently-failed run must
    # not silently disarm the retime gate for that query forever (the
    # errored key is also absent from bench_out.json, so BenchRefSpec
    # cannot detect the loss). Only --drop-errored removes it (for a
    # query deliberately deleted/renamed), and the deleted value is
    # printed so the lost baseline stays recoverable from logs.
    for k in sorted(errored):
        if k in merged and not any(
                k in json.load(open(p)).get("queries", {}) for p in runs):
            if drop_errored:
                print(f"drop: {k} errored with no fresh timing — "
                      f"removing stale min {merged[k]}s (--drop-errored)")
                del merged[k]
            else:
                print(f"keep: {k} errored with no fresh timing — retaining "
                      f"best-known {merged[k]}s (pass --drop-errored to remove)")
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
