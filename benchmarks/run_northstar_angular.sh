#!/bin/bash
# GloVe-100-class north star: 1M x 100 normalized IP, calibrated cluster
# density (fixed ~400 centers), reference grid efc (default 100; pass a
# different value as $1, e.g. 200 for the VERDICT r03 item-6 treatment),
# all engines + reference baseline on identical data (BASELINE.json
# configs[2]; reference grid /root/reference/experiments/Makefile:333-363).
#
# The runner checkpoints builds, persists sweep/engine points, and exits
# rc=3 on a TPU worker fault so this loop can relaunch cleanly past the
# faulted point (see benchmarks/run_northstar.py). No `timeout` around
# the python: a SIGTERM'd TPU client leaks its HBM on the remote worker
# for ~30-60 min (docs/benchmarking.md "HBM leak on abnormal client
# exit"); on rc=3 sleep before relaunching so a leak window drains.
set -u
cd "$(dirname "$0")/.."
EFC="${1:-100}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# this machine loads the TPU plugin from an out-of-tree site dir
[ -d /root/.axon_site ] && PYTHONPATH="$PYTHONPATH:/root/.axon_site"
rc=1
for i in 1 2 3 4 5 6; do
  echo "=== launch $i $(date +%H:%M:%S) ===" >> /tmp/ns_angular.log
  python benchmarks/run_northstar.py --config angular --efc "$EFC" \
    --centers-per-64k 26 >> /tmp/ns_angular.log 2>&1
  rc=$?
  echo "=== rc=$rc $(date +%H:%M:%S) ===" >> /tmp/ns_angular.log
  [ "$rc" = "0" ] && break
  [ "$rc" != "3" ] && break
  sleep 720
done
exit $rc
