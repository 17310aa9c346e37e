#!/usr/bin/env python3
"""Fold the round-13 probe rows into BENCH_sf10_probe.json.

Round 13 executed tools/run_probe_r12.sh (committed-but-unrun in r12)
at sf10 and sf100 for the ^(s18_|s20_|x06_|x28_) family under the
DERIVED AQE sizing (Bench.derivedInitialPartitions — no env knob).
This script parses the BENCHQ telemetry lines plus the final
self-describing JSON line (initial_partitions/input_mib, new in r13)
from one or more logs per scale (min wall per query across logs — the
shared-host min-of-N estimator the r11 blocks used) and adds two
blocks to the probe artifact:

  sf10_derived_r13   — the family at sf10 under the derived width (32,
                       the cpu floor) next to the r11 manual-256 rows
  sf100_derived_r13  — s18/s20's FIRST sf100 rows + x06/x28 re-rows
                       under the derived 256

Usage:
  python3 tools/fold_probe_r13.py --sf10 a.log [b.log ...] \
      --sf100 c.log [d.log ...] --date YYYY-MM-DD
"""
import argparse
import json
import re

# telemetry fields print as -1.000 when /proc is unreadable (Bench's
# cpuJiffies/loadAvg1m fallbacks) — the pattern must admit the minus or
# those lines silently stop matching and their samples vanish
BQ = re.compile(
    r"BENCHQ (\S+) ok=(\w+) wall=([\d.]+) run_s=([\d.]+) cpu_s=([\d.]+) "
    r"gc_s=([\d.]+) load=(-?[\d.]+) other_cores=(-?[\d.]+) "
    r"iowait_cores=(-?[\d.]+)(.*)")


def parse(path):
    """Min-wall per query over OK samples (the probe estimator) + the
    final line + the names of queries that had any failed sample (a
    failure must be visible even when a later retry succeeded — and a
    fast failed sample must never win the min)."""
    by_q, final, failed = {}, {}, set()
    with open(path, errors="replace") as f:
        for line in f:
            m = BQ.search(line)
            if m:
                q = m.group(1)
                if m.group(2) != "true":
                    failed.add(q)
                    continue
                row = {"wall": float(m.group(3)),
                       "run_s": float(m.group(4)),
                       "cpu_s": float(m.group(5)),
                       "gc_s": float(m.group(6)),
                       "load": float(m.group(7)),
                       "other_cores": float(m.group(8)),
                       "iowait_cores": float(m.group(9)),
                       "log": path}
                if q not in by_q or row["wall"] < by_q[q]["wall"]:
                    by_q[q] = row
            elif '"metric":"total"' in line:
                try:
                    final = json.loads(line[line.index("{"):])
                except ValueError:
                    pass
    return by_q, final, failed


def block(logs, label):
    by_q, runs = {}, []
    width = None
    all_failed = set()
    for path in logs:
        rows, final, failed = parse(path)
        assert rows, f"{path}: no BENCHQ rows"
        all_failed |= failed
        runs.append({"log": path, "n_queries": len(rows),
                     "total_sec": final.get("value"),
                     "initial_partitions": final.get("initial_partitions"),
                     "input_mib": final.get("input_mib"),
                     "load_max": final.get("load_max"),
                     "other_max": final.get("other_max"),
                     "failed_samples": sorted(failed)})
        w = final.get("initial_partitions")
        assert width is None or w is None or w == width, \
            f"{path}: width {w} != {width} — don't fold mixed-width logs"
        width = width or w
        for q, r in rows.items():
            if q not in by_q or r["wall"] < by_q[q]["wall"]:
                by_q[q] = r
    # every query that ever failed must also have an OK sample to fold;
    # a query with ONLY failed samples has no honest wall
    only_failed = all_failed - set(by_q)
    assert not only_failed, f"queries with no successful sample: " \
        f"{sorted(only_failed)}"
    if all_failed:
        print(f"note: failed samples seen for {sorted(all_failed)} "
              "(min taken over OK samples only)")
    return {
        "label": label,
        "estimator": "min wall per query over source_runs",
        "initial_partitions": width,
        "input_mib": runs[0].get("input_mib"),
        "source_runs": runs,
        "queries": {q: r["wall"] for q, r in sorted(by_q.items())},
        "task_metrics": {q: {k: r[k] for k in
                             ("run_s", "cpu_s", "gc_s", "load",
                              "other_cores", "iowait_cores", "log")}
                         for q, r in sorted(by_q.items())},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf10", nargs="+", required=True)
    p.add_argument("--sf100", nargs="+", required=True)
    p.add_argument("--date", required=True)
    args = p.parse_args()
    path = "BENCH_sf10_probe.json"
    doc = json.load(open(path))
    doc["sf10_derived_r13"] = block(
        args.sf10, "r13 (%s): ^(s18_|s20_|x06_|x28_) at sf10, derived "
        "width (resolves to the cpu floor 32; the r11 rows in 'sf10' "
        "above ran manual-256 for x06/x28)" % args.date)
    doc["sf100_derived_r13"] = block(
        args.sf100, "r13 (%s): first s18/s20 sf100 rows + x06/x28 "
        "re-rows at sf100 under the DERIVED sizing (resolves to 256 "
        "from 15.2 GiB input; no SPARK_GRAFT_INITIAL_PARTITIONS knob)"
        % args.date)
    b10, b100 = doc["sf10_derived_r13"], doc["sf100_derived_r13"]
    doc["wall_ratio_sf10_to_sf100_derived_r13"] = {
        q: round(b100["queries"][q] / b10["queries"][q], 2)
        for q in b100["queries"] if q in b10["queries"]}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print("folded sf10_derived_r13 (width %s): %s" %
          (b10["initial_partitions"], b10["queries"]))
    print("folded sf100_derived_r13 (width %s): %s" %
          (b100["initial_partitions"], b100["queries"]))


if __name__ == "__main__":
    main()
