#!/usr/bin/env python3
"""Run graft.Bench N times on an idle host and aggregate per-query stats.

Usage: python3 tools/bench3.py [runs=3] [sfdir=/root/testdata/sf0.1]
Writes bench3_agg.json with per-query {median, min, max} seconds and
prints a markdown table (sorted by median desc) for BASELINE.md.
"""
import json, statistics, subprocess, sys, os

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

per = {}
totals = []
for r in range(runs):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_CPUS="32")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                   cwd="/root/repo", capture_output=True, text=True)
    bf = "bench_sf1.json" if sfdir.rstrip("/").endswith("sf1") \
        else "bench_full.json"
    d = json.load(open(f"/root/repo/{bf}"))
    totals.append(d["value"])
    for k, v in d["queries"].items():
        # per-query values are {"med":..,"min":..} objects since r11
        per.setdefault(k, []).append(v["med"] if isinstance(v, dict) else v)
    print(f"run {r+1}/{runs}: total {d['value']:.1f}s", flush=True)

agg = {k: {"median": round(statistics.median(v), 2),
           "min": round(min(v), 2), "max": round(max(v), 2)}
       for k, v in per.items()}
out = {"runs": runs, "sf": sfdir,
       "total_median": round(statistics.median(totals), 1),
       "totals": [round(t, 1) for t in totals], "queries": agg}
json.dump(out, open("/root/repo/bench3_agg.json", "w"), indent=1)

print(f"\ntotals: {out['totals']} -> median {out['total_median']}s\n")
print("| query | median s | min–max |")
print("|---|---|---|")
for k, s in sorted(agg.items(), key=lambda kv: -kv[1]["median"]):
    print(f"| {k} | {s['median']:.2f} | {s['min']:.2f}–{s['max']:.2f} |")
