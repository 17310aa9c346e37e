#!/bin/bash
# Round-end ritual (r11 verdict #5): promote the round's quiet bench
# capture to bench/BENCH_PREV.json — the cross-round reference the next
# round's Bench retime/regression gates key off. r11 did this by hand;
# this script makes it one unforgettable command:
#
#   tools/promote_quiet.sh [bench/BENCH_local_rNN.json]
#
# With no argument, promotes the newest bench/BENCH_local_r*.json.
# Validates the capture parses and carries final.sf + a queries map
# before overwriting the reference (a malformed promotion would silently
# disable every sf-gated trigger next round).
set -e
cd "$(dirname "$0")/.."
src="${1:-$(ls -t bench/BENCH_local_r*.json 2>/dev/null | head -1)}"
[ -n "$src" ] && [ -f "$src" ] || { echo "no quiet capture found" >&2; exit 1; }
python3 - "$src" <<'EOF'
import json, os, sys
d = json.load(open(sys.argv[1]))
sf = d.get("final", {}).get("sf")
assert sf, "capture has no final.sf"
# The promoted capture must be at the SAME scale factor as the current
# reference (or the official sf0.1 suite when no reference exists yet):
# the no-arg path picks the newest BENCH_local_r*.json by mtime, so a
# probe capture at /tmp/graft_sf10 could otherwise be promoted — after
# which Bench.prevWalls(forSfDir) returns empty and every sf-gated
# retime/regression trigger is silently disabled (r12 advisor).
expected = "/root/testdata/sf0.1"
if os.path.isfile("bench/BENCH_PREV.json"):
    prev_sf = json.load(open("bench/BENCH_PREV.json")) \
        .get("final", {}).get("sf")
    if prev_sf:
        expected = prev_sf
assert sf == expected, \
    f"capture sf {sf!r} != reference sf {expected!r} — refusing to promote"
qs = d.get("queries", {})
assert len(qs) >= 50, f"capture has only {len(qs)} queries"
print(f"promoting {sys.argv[1]}: {len(qs)} queries at "
      f"{sf}, total {d['final'].get('value')}s")
EOF
cp "$src" bench/BENCH_PREV.json
echo "bench/BENCH_PREV.json <- $src"
