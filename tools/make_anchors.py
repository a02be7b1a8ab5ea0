#!/usr/bin/env python3
"""Reconstruct the earliest-green per-query bench anchors from git history.

The judge's baseline rule is "each query's earliest green driver record at
the same SF with a <=2x hold" (VERDICT r9-r11). This script walks every
historical version of BENCH_full.json (oldest first, plus the committed
run-B record BENCH_full_r11_run2.json), keeps sf0.1 records only, and for
each query records the FIRST version's median as its anchor. The output
BENCH_anchors.json ships in the repo root and is read by graft.Bench at
runtime: after the suite, any query whose median breaches 2x its anchor
(or carries a contended flag) is re-measured in isolation and the record
carries `rerun_median` alongside — the self-healing record of VERDICT r11
"Next round" #2.

Usage: python3 tools/make_anchors.py   (run from the repo root)
"""
import json
import subprocess
import sys


def versions(path):
    out = subprocess.run(
        ["git", "log", "--reverse", "--format=%H", "--", path],
        capture_output=True, text=True, check=True).stdout.split()
    for sha in out:
        blob = subprocess.run(["git", "show", f"{sha}:{path}"],
                              capture_output=True, text=True)
        if blob.returncode == 0 and blob.stdout.strip():
            try:
                yield sha, json.loads(blob.stdout)
            except json.JSONDecodeError:
                continue


def main():
    anchors = {}
    source = {}
    records = list(versions("BENCH_full.json")) \
        + list(versions("BENCH_full_r11_run2.json"))
    n_sf01 = 0
    for sha, rec in records:
        if "sf0.1" not in str(rec.get("sf", "")):
            continue
        n_sf01 += 1
        for q, info in rec.get("queries", {}).items():
            med = info.get("median") if isinstance(info, dict) else info
            if med is None:
                continue
            if q not in anchors:
                anchors[q] = med
                source[q] = sha[:8]
    out = {"sf": "sf0.1", "rule": "earliest green driver median per query",
           "n_records_scanned": n_sf01,
           "anchors": dict(sorted(anchors.items(),
                                  key=lambda kv: int(kv[0][1:])))}
    with open("BENCH_anchors.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(anchors)} anchors from {n_sf01} sf0.1 records")
    worst = sorted(anchors.items(), key=lambda kv: -kv[1])[:5]
    print("largest anchors:", worst)


if __name__ == "__main__":
    sys.exit(main())
