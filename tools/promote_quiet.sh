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
import json, sys
d = json.load(open(sys.argv[1]))
assert d.get("final", {}).get("sf"), "capture has no final.sf"
qs = d.get("queries", {})
assert len(qs) >= 50, f"capture has only {len(qs)} queries"
print(f"promoting {sys.argv[1]}: {len(qs)} queries at "
      f"{d['final']['sf']}, total {d['final'].get('value')}s")
EOF
cp "$src" bench/BENCH_PREV.json
echo "bench/BENCH_PREV.json <- $src"
