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
    second = json.loads(lines[1]) if len(lines) > 1 else {}
    probes = second.get("probes") or {
        k: {"runs": [v]} for k, v in compact["queries"].items()}
    calib = second.get("calib")  # the sweep's epoch bracket, if run
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
    # the epoch baseline is the calibrator's settled value BEFORE this
    # merge folds the new sweep in
    pre_base = (merged.get(calib.get("query", ""), 0) if calib else 0)
    added = improved = 0
    for name, pr in probes.items():
        best = round(min(pr["runs"]), 3)
        if name not in merged:
            merged[name] = best; added += 1
        elif best < merged[name]:
            merged[name] = best; improved += 1
    hist["queries"] = dict(sorted(merged.items()))
    hist["value"] = round(sum(merged.values()), 2)
    # Epoch log (round 17): each merged sweep records its calibration
    # bracket (both isolated q01 readings, verbatim) and the factor =
    # PRE reading vs the PRE-merge settled baseline, so cross-round
    # readings can be epoch-normalized instead of min-only
    # adjudicated. The factor uses the baseline from BEFORE this
    # merge (the settled number the sweep was actually measured
    # against — pre_base captured above); the log keeps the last 20
    # merges. Its keys carry no q-prefix names and it is appended
    # AFTER "queries", so graft.Bench's history regex (which scans
    # from "queries": on for "qNN":num) is unaffected.
    if calib and "pre" in calib:
        # factor from the PRE reading only: pre runs in the cold JVM
        # the settled history's fresh-JVM probes also ran in, post
        # runs JIT-hot after the whole sweep and is systematically
        # ~2.7x faster (the first two logged sweeps both read
        # pre 0.48-0.53 / post ~0.18 with near-identical raw totals
        # - JIT state, not host mood). Both ends are logged verbatim;
        # post is the hot-JVM floor marker, never the factor.
        entry = {"pre": round(calib["pre"], 3)}
        if "post" in calib:
            entry["post"] = round(calib["post"], 3)
        if pre_base:
            entry["factor"] = round(calib["pre"] / pre_base, 2)
        hist["epoch_log"] = (hist.get("epoch_log") or [])[-19:] + [entry]
    with open(hist_path, "w") as f:
        json.dump(hist, f, separators=(",", ":"))
        f.write("\n")
    print(f"added {added}, improved {improved}, "
          f"best-known total {hist['value']} over {len(merged)} queries"
          + (f", epoch {hist['epoch_log'][-1].get('factor', '?')}x"
             if hist.get("epoch_log") else ""))

if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
