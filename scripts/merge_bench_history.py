#!/usr/bin/env python3
"""Min-merge a bench out-file into bench_history.json.

Usage: python3 scripts/merge_bench_history.py <bench_out.json> [history]

Reads per-query timings from the out-file's PROBES line (the second
line — it carries every query, where the compact first line omits the
fast ones), takes min(run) per query, and min-merges into the history.

The history MUST stay machine-compact (no spaces after ':'):
graft.Bench parses it with the regex "name":number, so a
pretty-printed rewrite silently disables history — best_total
degenerates to the raw total and the contention flagging loses its
baseline (observed: a 14 s contended q91 reading went unflagged
against its honest 2.1 s history). This script always writes with
separators=(',', ':').
"""
import json, sys

def main(out_path, hist_path="bench_history.json"):
    lines = open(out_path).read().strip().split("\n")
    compact = json.loads(lines[0])
    probes = json.loads(lines[1])["probes"] if len(lines) > 1 else {
        k: {"runs": [v]} for k, v in compact["queries"].items()}
    try:
        hist = json.loads(open(hist_path).readline())
    except FileNotFoundError:
        hist = {"metric": "total", "value": 0.0, "unit": "sec",
                "queries": {}, "sf": compact["sf"]}
    hsf = str(hist.get("sf", ""))
    csf = str(compact.get("sf", ""))
    if not (hsf.endswith(csf.split("/")[-1]) or
            csf.endswith(hsf.split("/")[-1])):
        sys.exit(f"sf mismatch: history {hsf} vs run {csf}")
    merged = dict(hist["queries"])
    added = improved = 0
    for name, pr in probes.items():
        best = round(min(pr["runs"]), 3)
        if name not in merged:
            merged[name] = best; added += 1
        elif best < merged[name]:
            merged[name] = best; improved += 1
    hist["queries"] = dict(sorted(merged.items()))
    hist["value"] = round(sum(merged.values()), 2)
    with open(hist_path, "w") as f:
        json.dump(hist, f, separators=(",", ":"))
        f.write("\n")
    print(f"added {added}, improved {improved}, "
          f"best-known total {hist['value']} over {len(merged)} queries")

if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
