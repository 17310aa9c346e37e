#!/bin/bash
# Round-12 scale probe, closing the two r11 probe holes:
#  - s18/s20 get sf100 rows (r11's SF100FAMILY silently dropped them;
#    they are the always-on consumers of the backup spine);
#  - x06/x28 re-rowed at sf100 under the NEW derived AQE sizing
#    (Bench.derivedInitialPartitions — no SPARK_GRAFT_INITIAL_PARTITIONS
#    env knob anywhere below; the r11 row needed the manual 256).
# Replicas are the graft.tools.ScaleUp builds in /tmp/graft_sf{1,10,100}.
set -e
cd /root/repo
SF100FAMILY='^(s18_|s20_|x06_|x28_)'
run() { # dir label family
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$3" \
    sbt -batch "runMain graft.Bench" > "/tmp/probe_r12_$2.log" 2>&1
  grep -c "BENCHQ" "/tmp/probe_r12_$2.log" || true
}
case "$1" in
  sf100) run /tmp/graft_sf100 sf100_a "$SF100FAMILY" ;;
  sf10)  run /tmp/graft_sf10  sf10_a  "$SF100FAMILY" ;;
  # no silent no-op: invoking with no/unknown argument must fail loudly
  # (r12 advisor — the no-default case let the round-end ritual "succeed"
  # while producing no rows, which is exactly what happened in r12)
  *) echo "usage: run_probe_r12.sh sf10|sf100" >&2; exit 1 ;;
esac
