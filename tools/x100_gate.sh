#!/bin/bash
# Full-inventory x100 correctness gate (round-10 verdict item 1).
# Runs graft.Verify over all 160 keys in fresh-JVM batches (limits
# broadcast/persist accretion; a mid-suite OOM kills one batch, not the
# gate), then the DuckDB compare is run separately by the operator.
# Usage: tools/x100_gate.sh <sfDir> <outDir> [heap] [batchFile]
set -u
SF="${1:?sfDir}"; OUT="${2:?outDir}"; HEAP="${3:-20g}"
BATCHES="${4:-/root/repo/tools/x100_batches.txt}"
mkdir -p "$OUT"
i=0
while IFS= read -r keys; do
  i=$((i+1))
  echo "=== batch $i: $keys"
  t0=$(date +%s)
  # DUMP_PARTS=1: skip the single-file coalesce (range-partitioned part
  # files stay globally ordered for the comparers' lexicographic glob) —
  # validated round 10, astro's 585M-row dump 505s -> 93s
  SPARK_GRAFT_DUMP_PARTS=1 SPARK_GRAFT_CPUS=32 /root/repo/tools/run_class.sh "$HEAP" \
    graft.Verify "$SF" "$OUT" "$keys" 2>&1 | grep -v "^WARNING\|WARN "
  echo "=== batch $i exit=$? wall=$(( $(date +%s) - t0 ))s"
done < "$BATCHES"
echo "=== gate engine-side done"
