#!/bin/bash
# GIST1M-class north star: 1M x 960 fp32 L2, calibrated cluster density
# (fixed ~400 centers), reference grid efc=100, all engines + reference
# baseline on identical data (BASELINE.json configs[3]; reference grid
# /root/reference/experiments/Makefile:333-363). d=960 exercises the
# large-per-hop-tile regime and the build-side wave memory guard.
#
# --build-dtype bfloat16: at d=960/1M capacity the f32 wave program
# alone models ~12.2 GB against ~15 GB usable HBM; bf16 halves every
# table-scaled buffer during CONSTRUCTION only (links are reattached to
# the f32 vectors for every sweep, so served results are f32-exact).
# The flag also keys the build checkpoint (_bf16) — dropping it makes a
# relaunch silently restart from scratch instead of resuming.
#
# No `timeout` around the python: a SIGTERM'd TPU client leaks its HBM
# on the remote worker for ~30-60 min (docs/benchmarking.md "HBM leak
# on abnormal client exit"). On a fault-exit (rc=3, clean) sleep before
# relaunching so a leak window drains instead of burning attempts at
# the wave-cap floor.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# this machine loads the TPU plugin from an out-of-tree site dir
[ -d /root/.axon_site ] && PYTHONPATH="$PYTHONPATH:/root/.axon_site"
rc=1
for i in 1 2 3 4 5 6 7 8 9 10; do
  echo "=== launch $i $(date +%H:%M:%S) ===" >> /tmp/ns_gist.log
  python benchmarks/run_northstar.py --config gist --efc 100 \
    --centers-per-64k 26 --build-dtype bfloat16 >> /tmp/ns_gist.log 2>&1
  rc=$?
  echo "=== rc=$rc $(date +%H:%M:%S) ===" >> /tmp/ns_gist.log
  [ "$rc" = "0" ] && break
  [ "$rc" != "3" ] && break
  sleep 720
done
exit $rc
