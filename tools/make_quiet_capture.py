#!/usr/bin/env python3
"""Assemble bench/BENCH_local_rNN.json from N full quiet bench logs.

Min wall per query across the runs (the standing min-of-N estimator),
task_metrics from the winning sample, `final` rebuilt from the summed
minima with the telemetry maxima across runs. Keeps the committed
quiet-capture format {final, queries, task_metrics, failed, note}.

Usage: python3 tools/make_quiet_capture.py OUT NOTE LOG [LOG ...]
"""
import json
import re
import sys

# telemetry fields print as -1.000 when /proc is unreadable — admit the
# minus or those lines silently stop matching and samples vanish
BQ = re.compile(
    r"BENCHQ (\S+) ok=(\w+) wall=([\d.]+) run_s=([\d.]+) cpu_s=([\d.]+) "
    r"gc_s=([\d.]+) load=(-?[\d.]+) other_cores=(-?[\d.]+) "
    r"iowait_cores=(-?[\d.]+)(.*)")


def parse(path):
    by_q, final = {}, {}
    with open(path, errors="replace") as f:
        for line in f:
            m = BQ.search(line)
            if m:
                q = m.group(1)
                row = {"ok": m.group(2) == "true",
                       "wall": float(m.group(3)),
                       "run_s": float(m.group(4)),
                       "cpu_s": float(m.group(5)),
                       "gc_s": float(m.group(6))}
                if row["ok"] and (q not in by_q or
                                  row["wall"] < by_q[q]["wall"]):
                    by_q[q] = row
            elif '"metric":"total"' in line:
                try:
                    final = json.loads(line[line.index("{"):])
                except ValueError:
                    pass
    return by_q, final


def main():
    out, note, logs = sys.argv[1], sys.argv[2], sys.argv[3:]
    best, finals = {}, []
    for p in logs:
        rows, final = parse(p)
        assert rows and final, f"{p}: incomplete log"
        assert final.get("n_failed") == 0, f"{p}: failures present"
        finals.append(final)
        for q, r in rows.items():
            if q not in best or r["wall"] < best[q]["wall"]:
                best[q] = r
    sfs = {f.get("sf") for f in finals}
    assert len(sfs) == 1, f"mixed sf: {sfs}"
    total = round(sum(r["wall"] for r in best.values()), 3)
    doc = {
        "final": {
            "metric": "total", "value": total, "unit": "sec",
            "total_ok": total, "n_failed": 0,
            "load_max": max(f.get("load_max", -1) for f in finals),
            "other_max": max(f.get("other_max", -1) for f in finals),
            "n_hot": min(f.get("n_hot", 0) for f in finals),
            "initial_partitions": finals[0].get("initial_partitions"),
            "input_mib": finals[0].get("input_mib"),
            "sf": sfs.pop(),
        },
        "queries": {q: best[q]["wall"] for q in sorted(best)},
        "task_metrics": {q: {k: best[q][k]
                             for k in ("run_s", "cpu_s", "gc_s")}
                         for q in sorted(best)},
        "failed": [],
        "note": note + " (run totals: " +
                ", ".join(f"{f['value']}s" for f in finals) + ")",
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(best)} queries, min-of-{len(logs)} "
          f"total {total}s")


if __name__ == "__main__":
    main()
