#!/bin/bash
# Phase 2 of the full x100 gate: DuckDB oracle compare over every key,
# with the resource-bound oracles routed to their dedicated
# administrations. The skip/administration list is the single constant
# in tools/x100_skip.py — never respell it here.
# Usage: tools/x100_compare.sh <sfDir> <outDir>
set -u
SF="${1:?}"; OUT="${2:?}"
cd /root/repo
SKIP_GREP=$(python3 -c "from tools.x100_skip import SKIP; print('|'.join(sorted(SKIP)))" 2>/dev/null \
  || python3 -c "import sys; sys.path.insert(0,'tools'); from x100_skip import SKIP; print('|'.join(sorted(SKIP)))")
ALL=$(ls "$OUT" | grep -v oracle_sql.json | grep -vxE "$SKIP_GREP" | paste -sd,)
echo "=== compare.py bulk ($(echo "$ALL" | tr ',' '\n' | wc -l) keys; skipping: $SKIP_GREP)"
python3 tools/compare.py "$SF" "$OUT" "$ALL"
BULK=$?
RC=$BULK
python3 -c "import sys; sys.path.insert(0,'tools'); from x100_skip import SKIP
for k in sorted(SKIP): print(k + ' ' + SKIP[k])" | while read -r KEY TOOL; do
  if [ -d "$OUT/$KEY" ]; then
    echo "=== $KEY administration: $TOOL"
    python3 "$TOOL" "$SF" "$OUT" || echo "ADMIN_FAIL $KEY"
  fi
done
echo "=== compare done: bulk=$BULK (administrations logged above; grep ADMIN_FAIL)"
exit $RC
