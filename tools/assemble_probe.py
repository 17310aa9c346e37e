#!/usr/bin/env python3
"""Assemble BENCH_sf10_probe.json from Bench logs.

Parses BENCHQ lines (wall + task telemetry per query) from one or more
logs per scale and keeps, per query, the run with the minimum wall —
the standard min-of-N estimator for a shared host where SMT contention
and transient external tenants inflate both wall and cpu_s (all
candidate logs must be builds of the same code). Totals are the sum of
the per-query minima; the per-log load telemetry that justifies the
estimator is kept in `source_runs`. Usage:

  python3 tools/assemble_probe.py --sf1 a.log [b.log ...] \
      --sf10 c.log [d.log ...] --out out.json --date YYYY-MM-DD
"""
import argparse, json, re

BQ = re.compile(
    r"BENCHQ (\S+) ok=true wall=([\d.]+) run_s=([\d.]+) cpu_s=([\d.]+) "
    r"gc_s=([\d.]+) load=(-?[\d.]+) other_cores=(-?[\d.]+)")


def parse(path):
    rows, total = [], {}
    with open(path) as f:
        for line in f:
            m = BQ.search(line)
            if m:
                rows.append({"q": m.group(1), "wall": float(m.group(2)),
                             "run_s": float(m.group(3)),
                             "cpu_s": float(m.group(4)),
                             "gc_s": float(m.group(5)),
                             "load": float(m.group(6)),
                             "other_cores": float(m.group(7))})
            elif line.startswith('{"metric":"total"'):
                total = json.loads(line)
    return rows, total


def best(logs):
    by_q, runs = {}, []
    for path in logs:
        rows, total = parse(path)
        runs.append({"log": path, "n_queries": len(rows),
                     "total_sec": total.get("value"),
                     "load_max": total.get("load_max"),
                     "other_max": total.get("other_max")})
        for r in rows:
            if r["q"] not in by_q or r["wall"] < by_q[r["q"]]["wall"]:
                by_q[r["q"]] = r
    qs = dict(sorted((q, r["wall"]) for q, r in by_q.items()))
    metrics = {q: {"run_s": r["run_s"], "cpu_s": r["cpu_s"],
                   "gc_s": r["gc_s"], "load": r["load"],
                   "other_cores": r["other_cores"]}
               for q, r in sorted(by_q.items())}
    return {"total_sec": round(sum(qs.values()), 3),
            "estimator": "min wall per query over source_runs",
            "source_runs": runs, "queries": qs, "task_metrics": metrics}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf1", nargs="+", required=True)
    p.add_argument("--sf10", nargs="+", required=True)
    p.add_argument("--sf100", nargs="*", default=[],
                   help="optional factor-1000 logs (linear family only)")
    p.add_argument("--out", required=True)
    p.add_argument("--date", required=True)
    args = p.parse_args()
    a, b = best(args.sf1), best(args.sf10)
    wall = {q: round(b["queries"][q] / a["queries"][q], 2)
            for q in a["queries"] if q in b["queries"]}
    cpu = {q: round(b["task_metrics"][q]["cpu_s"] /
                    max(a["task_metrics"][q]["cpu_s"], 0.001), 2)
           for q in a["task_metrics"] if q in b["task_metrics"]}
    doc = {
        "probe": ("heavy-family scale probe, factor 10 (sf1) and factor "
                  "100 (sf10) replicas of sf0.1 via graft.tools.ScaleUp "
                  "(injective per-copy content decorrelation, referential "
                  "integrity preserved); min-of-N walls per query — the "
                  "host is shared (SMT + transient external tenants, see "
                  "source_runs telemetry), so single runs swing up to 2x "
                  "on identical plans"),
        "date": args.date,
        "host": "local[32], 128 GiB sandbox",
        "sf1": a, "sf10": b,
        "wall_ratio_10x_data": wall,
        "cpu_ratio_10x_data": cpu,
    }
    if args.sf100:
        c = best(args.sf100)
        doc["sf100"] = c
        doc["sf100_note"] = (
            "factor-1000 replicas (10,000x the oracle fixture scale), "
            "linear family only: the output-quadratic interval joins "
            "(q68/q69) are excluded by construction, and x06/x28 "
            "because their verify shuffle (~62 GB at this scale) "
            "exceeds sandbox disk; x06's candidate stages were pinned "
            "exactly linear at this scale by direct counts (see "
            "PLANS.md round-9 section)")
        doc["wall_ratio_sf10_to_sf100"] = {
            q: round(c["queries"][q] / b["queries"][q], 2)
            for q in c["queries"] if q in b["queries"]}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}: sf1 {a['total_sec']}s, "
          f"sf10 {b['total_sec']}s, {len(wall)} queries")


if __name__ == "__main__":
    main()
