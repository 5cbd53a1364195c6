#!/bin/bash
# Phase 2 of the full x100 gate: DuckDB oracle compare over every key,
# with the two resource-bound oracles routed to their dedicated
# administrations (stepwise pagerank, slice-exact embed dedup).
# Usage: tools/x100_compare.sh <sfDir> <outDir>
set -u
SF="${1:?}"; OUT="${2:?}"
cd /root/repo
ALL=$(ls "$OUT" | grep -v oracle_sql.json | grep -vx "graph_pagerank\|llm_dedup_embed" | paste -sd,)
echo "=== compare.py bulk ($(echo "$ALL" | tr ',' '\n' | wc -l) keys)"
python3 tools/compare.py "$SF" "$OUT" "$ALL"
BULK=$?
echo "=== pagerank stepwise oracle"
python3 tools/pagerank_oracle_stepwise.py "$SF" "$OUT"
PR=$?
echo "=== embed dedup slice oracle"
python3 tools/compare_embed_slices.py "$SF" "$OUT"
EM=$?
echo "=== compare done: bulk=$BULK pagerank=$PR embed=$EM"
