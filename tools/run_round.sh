#!/usr/bin/env bash
# Full local round cycle: tests → verify+oracle selfcheck → bench → plans.
# Mirrors what the driver runs, so regressions surface before the round ends.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests: |FAILED" | head -3

echo "== verify sf0.01 + duckdb selfcheck =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout" 2>&1 \
  | grep -E "\[verify\].*failed" || true
python3 tools/selfcheck.py /tmp/vout /root/testdata/sf0.01 | tail -3

echo "== verify sf0.001 + duckdb selfcheck =="
# scale-dependent value coincidences (round-half ties) show up at one
# SF and not another — always check both
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout001" 2>&1 \
  | grep -E "\[verify\].*failed" || true
python3 tools/selfcheck.py /tmp/vout001 /root/testdata/sf0.001 | tail -3

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -oE '\{"metric".*'

echo "== plans =="
ROUND="${ROUND:-7}"
sbt -batch "runMain graft.Plans /root/testdata/sf0.01 PLANS_r${ROUND}.md" 2>&1 | grep wrote
grep -c "ERROR:" "PLANS_r${ROUND}.md" && echo "plan errors present!" || echo "plans clean"
