#!/usr/bin/env python3
"""Aggregate N Bench runs into the BASELINE.md stability tables.

Usage: python3 tools/bench_medians.py run1.txt run2.txt [...]

Each input is a Bench stdout capture (the `{"metric":...}` lines).
Prints the run-summary table and the per-key median table (median wall
> 1.0 s) in BASELINE.md's markdown format. Dev tool only.
"""
import json
import statistics
import sys


def parse(path):
    wall = cpu = None
    total = None
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"metric"'):
            continue
        d = json.loads(line)
        if d["metric"] == "bench_detail":
            wall = d["queries"]
        elif d["metric"] == "cpu_detail":
            cpu = d["queries"]
        elif d["metric"] == "total":
            total = d
    return wall, cpu, total


def main(paths):
    runs = [parse(p) for p in paths]
    print("| run | total s | cpu s | gc ms | n_ok | n_err |")
    print("|---|---|---|---|---|---|")
    for i, (_, _, t) in enumerate(runs, 1):
        print(f"| {i} | {t['value']:.1f} | {t['cpu_s']:.1f} | "
              f"{t['gc_ms']} | {t['n_ok']} | {t['n_err']} |")
    keys = runs[0][0].keys()
    med = {k: statistics.median(r[0][k] for r in runs) for k in keys}
    cpm = {k: statistics.median(r[1][k] for r in runs) for k in keys}
    print(f"\nSum of per-key medians: {sum(med.values()):.1f} s\n")
    print("| query | min | median | max | cpu median |")
    print("|---|---|---|---|---|")
    for k in sorted(keys, key=lambda k: -med[k]):
        if med[k] <= 1.0:
            break
        vals = [r[0][k] for r in runs]
        print(f"| {k} | {min(vals):.2f} | {med[k]:.2f} | "
              f"{max(vals):.2f} | {cpm[k]:.2f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
