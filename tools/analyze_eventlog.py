#!/usr/bin/env python3
"""Attribute per-stage executor time to bench queries from a Spark event log.

Usage: analyze_eventlog.py <eventlog-file> [query-regex]

Jobs are bucketed by their spark.job.description (Bench sets it to the
query key). For each query, prints per-stage totals: task count, executor
run ms, cpu ms, shuffle read/write bytes, and the stage's callsite name,
sorted by run time. Streaming jobs (run from other threads) land under
'' (no description) — they are attributed by wall-clock window instead
using the BENCHQ sidecar if present.
"""
import json, sys, re, collections

path = sys.argv[1]
want = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None

stage_to_job = {}
job_desc = {}
stages = {}  # sid -> dict
sql_desc = {}

for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get('Event')
    if ev == 'SparkListenerJobStart':
        desc = (e.get('Properties') or {}).get('spark.job.description', '')
        jid = e['Job ID']
        job_desc[jid] = desc
        for sid in e.get('Stage IDs', []):
            stage_to_job[sid] = jid
    elif ev == 'SparkListenerStageCompleted':
        si = e['Stage Info']
        sid = si['Stage ID']
        st = stages.setdefault(sid, collections.Counter())
        st['submit'] = si.get('Submission Time', 0)
        st['complete'] = si.get('Completion Time', 0)
        stages[sid]['name'] = si.get('Stage Name', '')
    elif ev == 'SparkListenerTaskEnd':
        sid = e['Stage ID']
        st = stages.setdefault(sid, collections.Counter())
        m = e.get('Task Metrics') or {}
        st['n_tasks'] += 1
        st['run_ms'] += m.get('Executor Run Time', 0)
        st['cpu_ms'] += m.get('Executor CPU Time', 0) // 1000000
        st['deser_ms'] += m.get('Executor Deserialize Time', 0)
        st['gc_ms'] += m.get('JVM GC Time', 0)
        st['result_ser_ms'] += m.get('Result Serialization Time', 0)
        sr = m.get('Shuffle Read Metrics') or {}
        st['sh_read_b'] += sr.get('Remote Bytes Read', 0) + sr.get('Local Bytes Read', 0)
        st['fetch_wait_ms'] += sr.get('Fetch Wait Time', 0)
        sw = m.get('Shuffle Write Metrics') or {}
        st['sh_write_b'] += sw.get('Shuffle Bytes Written', 0)
        st['sh_write_ms'] += sw.get('Shuffle Write Time', 0) // 1000000
        inp = m.get('Input Metrics') or {}
        st['input_b'] += inp.get('Bytes Read', 0)

byq = collections.defaultdict(list)
for sid, st in stages.items():
    jid = stage_to_job.get(sid)
    desc = job_desc.get(jid, '') if jid is not None else ''
    byq[desc].append((sid, st))

tot = collections.Counter()
for q, ss in sorted(byq.items(), key=lambda kv: -sum(s['run_ms'] for _, s in kv[1])):
    run = sum(s['run_ms'] for _, s in ss)
    tot[q] = run
    if want and not want.search(q):
        continue
    n_stage = len(ss)
    n_task = sum(s['n_tasks'] for _, s in ss)
    print(f"\n== {q or '(no description)'}: stages={n_stage} tasks={n_task} "
          f"run={run/1e3:.2f}s cpu={sum(s['cpu_ms'] for _, s in ss)/1e3:.2f}s "
          f"deser={sum(s['deser_ms'] for _, s in ss)/1e3:.2f}s "
          f"gc={sum(s['gc_ms'] for _, s in ss)/1e3:.2f}s")
    for sid, s in sorted(ss, key=lambda x: -x[1]['run_ms'])[:14]:
        name = str(s.get('name', ''))[:90]
        print(f"  stage {sid}: tasks={s['n_tasks']} run={s['run_ms']/1e3:.2f}s "
              f"cpu={s['cpu_ms']/1e3:.2f}s deser={s['deser_ms']/1e3:.2f}s "
              f"shr={s['sh_read_b']>>10}KiB shw={s['sh_write_b']>>10}KiB "
              f"in={s['input_b']>>10}KiB wall={(s['complete']-s['submit'])/1e3:.2f}s  {name}")

if not want:
    print("\n=== total run_s by query (top 40) ===")
    for q, r in tot.most_common(40):
        print(f"{q or '(none)'}: {r/1e3:.2f}")
