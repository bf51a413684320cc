#!/bin/bash
# Run a graft main (graft.Verify / graft.Bench) with plain java off a
# SNAPSHOT of the compiled classes, so `sbt compile` in the dev loop can
# never swap class files under a long-running background job (classes are
# loaded lazily — a mid-run recompile is a silent hazard otherwise).
#
# Usage: tools/run_main.sh <mainClass> [args...]
# Env passthrough: SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY, SPARK_GRAFT_SF_DIR,
#                  SPARK_GRAFT_BENCH_OUT, SPARK_DRIVER_MEM
set -euo pipefail
main="$1"; shift
snap=$(mktemp -d /tmp/graft-classes.XXXXXX)
cp -r /root/repo/target/scala-2.13/classes/. "$snap/"
trap 'rm -rf "$snap"' EXIT
opens=(java.lang java.lang.invoke java.lang.reflect java.io java.net
       java.nio java.util java.util.concurrent java.util.concurrent.atomic)
flags=()
for p in "${opens[@]}"; do flags+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  flags+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
# java runs as a CHILD (not exec) so the EXIT trap fires and the class
# snapshot is removed; exec replaced the shell and leaked one snapshot
# dir per invocation. `|| rc=$?` keeps set -e from skipping the trap.
rc=0
java "${flags[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$snap:/opt/spark/jars/*" "$main" "$@" || rc=$?
exit "$rc"
