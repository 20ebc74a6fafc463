#!/bin/bash
# GIST1M-class north star: 1M x 960 fp32 L2, calibrated cluster density
# (fixed ~400 centers), reference grid efc=100, all engines + reference
# baseline on identical data (BASELINE.json configs[3]; reference grid
# /root/reference/experiments/Makefile:333-363). d=960 exercises the
# large-per-hop-tile regime and the build-side wave memory guard.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# this machine loads the TPU plugin from an out-of-tree site dir
[ -d /root/.axon_site ] && PYTHONPATH="$PYTHONPATH:/root/.axon_site"
rc=1
for i in 1 2 3 4 5 6 7 8; do
  echo "=== launch $i ===" >> /tmp/ns_gist.log
  python benchmarks/run_northstar.py --config gist --efc 100 \
    --centers-per-64k 26 >> /tmp/ns_gist.log 2>&1
  rc=$?
  echo "=== rc=$rc ===" >> /tmp/ns_gist.log
  [ "$rc" != "3" ] && break
done
exit $rc
