#!/bin/bash
# One-command INCREMENTAL x100 re-gate (round-10 verdict item 6): any
# key changed since the last full gate re-enters the stress gate without
# re-running all 170 keys. Runs graft.Verify for ONLY the given keys at
# stress scale (multi-part dumps), then the oracle compare — bulk keys
# via tools/compare.py, administration-listed keys (tools/x100_skip.py)
# via their dedicated tools.
#
# Usage:
#   tools/x100_regate.sh <keys-csv> [sfDir] [outDir] [heap]
#   tools/x100_regate.sh --since=<commit> [sfDir] [outDir] [heap]
#
# --since derives the key list by intersecting identifiers in the
# src/main diff since <commit> with the key universe in
# tools/x100_batches.txt. That catches registration-level changes (a key
# named in a changed hunk); a change to a SHARED helper (T, Params,
# sumMoneyD...) affects keys without naming them — pass those keys
# explicitly. Compile first (sbt compile); this runs the classes dir.
set -u
KEYS="${1:?keys-csv or --since=<commit>}"
SF="${2:-/tmp/stress_x100}"; OUT="${3:-/tmp/x100_out}"; HEAP="${4:-20g}"
cd /root/repo
if [[ "$KEYS" == --since=* ]]; then
  REF="${KEYS#--since=}"
  UNIVERSE=$(tr ',' '\n' < tools/x100_batches.txt | sort -u)
  DIFF=$(git diff "$REF" -- src/main | grep -oE '[a-z0-9_]+' | sort -u)
  KEYS=$(comm -12 <(echo "$UNIVERSE") <(echo "$DIFF") | paste -sd,)
  echo "=== keys changed since $REF: ${KEYS:-<none>}"
fi
[ -z "$KEYS" ] && { echo "nothing to re-gate"; exit 0; }
t0=$(date +%s)
SPARK_GRAFT_DUMP_PARTS=1 SPARK_GRAFT_CPUS=32 tools/run_class.sh "$HEAP" \
  graft.Verify "$SF" "$OUT" "$KEYS" 2>&1 | grep -E "^\[verify\]"
echo "=== engine side done in $(( $(date +%s) - t0 ))s"
SKIP_GREP=$(python3 -c "import sys; sys.path.insert(0,'tools'); from x100_skip import SKIP; print('|'.join(sorted(SKIP)))")
BULK=$(echo "$KEYS" | tr ',' '\n' | grep -vxE "$SKIP_GREP" | paste -sd,)
RC=0
if [ -n "$BULK" ]; then
  python3 tools/compare.py "$SF" "$OUT" "$BULK" || RC=1
fi
python3 -c "import sys; sys.path.insert(0,'tools'); from x100_skip import SKIP
for k in sorted(SKIP): print(k + ' ' + SKIP[k])" | while read -r KEY TOOL; do
  if echo ",$KEYS," | grep -q ",$KEY,"; then
    echo "=== $KEY administration: $TOOL"
    python3 "$TOOL" "$SF" "$OUT" || echo "ADMIN_FAIL $KEY"
  fi
done
echo "=== re-gate done rc=$RC (grep ADMIN_FAIL above for administration failures)"
exit $RC
