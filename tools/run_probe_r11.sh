#!/bin/bash
# Round-11 scale probe: the r9 heavy family (minus the output-quadratic
# q68/q69, already measured through sf10) plus the backup/restore spine
# (r12/r16/r19/r21), at sf1 (factor 10), sf10 (factor 100) and sf100
# (factor 1000) replicas built by graft.tools.ScaleUp. Two sweeps per
# scale -> min-of-N walls via tools/assemble_probe.py.
set -e
cd /root/repo
FAMILY='^(q51_|q67_|s16_|s18_|s20_|s22_|x03_|x06_|x22_|x27_|x28_|x31_|x40_|x51_|x52_|x55_|x57_|r12_restore|r16_backup|r19_backup|r21_backup)'
SF100FAMILY='^(q51_|q67_|s16_|s22_|x03_|x06_|x22_|x27_|x28_|x31_|x40_|x51_|x52_|x55_|x57_|r12_restore|r16_backup|r19_backup|r21_backup)'
run() { # dir label family
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$3" \
    sbt -batch "runMain graft.Bench" > "/tmp/probe_r11_$2.log" 2>&1
  grep -c "BENCHQ" "/tmp/probe_r11_$2.log" || true
}
case "$1" in
  sf1)   run /tmp/graft_sf1   sf1_a   "$FAMILY"; run /tmp/graft_sf1  sf1_b  "$FAMILY" ;;
  sf10)  run /tmp/graft_sf10  sf10_a  "$FAMILY"; run /tmp/graft_sf10 sf10_b "$FAMILY" ;;
  sf100) run /tmp/graft_sf100 sf100_a "$SF100FAMILY" ;;
esac
