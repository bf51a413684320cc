#!/bin/bash
# One-stop scale-gate recording: run graft.Verify + the DuckDB hash
# compare at each scale factor, write the CORRECTNESS_* artifacts, then
# REGENERATE the README evidence block from those artifacts
# (tools/gen_counts.py --write) and fail if any number would be stale
# (--check). Four rounds of hand-edited counts drifting is the reason
# this script exists — never paste gate numbers into README by hand.
#
# Usage: tools/record_gates.sh <sf1dir> <sf3dir> [sf10dir]
#   sf10 runs the SUBSET in tools/sf10_subset.txt (scale-sensitive
#   dedup/embedding/streaming representatives + every r13-r15 row).
#   q_embed_dup_pairs / q_semantic_dedup / q_dup_components are NOT in
#   the list: their DuckDB oracles are exact all-pairs / correlated-
#   NOT-EXISTS cosine scans (~2e10 ops at 200k vectors) and a recursive
#   transitive closure (quadratic in dup-class size; >50 GB temp at
#   sf10) — the single-node ORACLE is the bottleneck, not the engine;
#   all three stay gated at sf3 and their bounded siblings stay in
#   (argued in SCALE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
sf1=$1; sf3=$2; sf10=${3:-}

SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} tools/run_main.sh \
  graft.Verify "$sf1" /tmp/gate_sf1
python3 tools/check_scale.py "$sf1" /tmp/gate_sf1 CORRECTNESS_sf1.json

SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} tools/run_main.sh \
  graft.Verify "$sf3" /tmp/gate_sf3
python3 tools/check_scale.py "$sf3" /tmp/gate_sf3 CORRECTNESS_sf3.json

if [ -n "$sf10" ]; then
  subset=$(cat tools/sf10_subset.txt)
  SPARK_GRAFT_ONLY="$subset" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
    tools/run_main.sh graft.Verify "$sf10" /tmp/gate_sf10
  python3 tools/check_scale.py "$sf10" /tmp/gate_sf10 \
    CORRECTNESS_sf10_subset.json "$subset"
fi

python3 tools/gen_counts.py --write
python3 tools/gen_counts.py --check
