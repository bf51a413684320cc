#!/bin/bash
# Run the full test suite and record the ScalaTest total where
# tools/gen_counts.py reads it (target/test-count.txt) — the README
# evidence block is generated from that file, never hand-counted.
#
# Usage: tools/run_tests.sh [logfile]
set -uo pipefail
cd "$(dirname "$0")/.."
log=${1:-/tmp/sbttest_latest.log}
sbt test 2>&1 | tee "$log"
rc=${PIPESTATUS[0]}
count=$(grep -E "Total number of tests run: [0-9]+" "$log" \
  | tail -1 | grep -oE '[0-9]+' | tail -1)
if [ -n "$count" ]; then
  mkdir -p target
  echo "$count" > target/test-count.txt
  echo "recorded test count: $count (exit $rc)"
else
  echo "WARNING: no ScalaTest total found in $log — count NOT recorded"
fi
exit "$rc"
