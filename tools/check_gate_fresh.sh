#!/usr/bin/env bash
# Pre-snapshot freshness check: refuses when the working tree's gate-
# relevant content differs from what the last FULL tools/gate.sh run
# certified (.gate_stamp.json). This is the r9 lesson made mechanical:
# q95-q97 landed in a snapshot commit AFTER the final full gate run and
# shipped a broken oracle — with this check, a snapshot of uncertified
# source fails loudly instead.
#
# Usage: tools/check_gate_fresh.sh   (exit 0 = certified, 1 = stale)
set -euo pipefail
cd "$(dirname "$0")/.."

STAMP=.gate_stamp.json
if [ ! -f "$STAMP" ]; then
  echo "GATE STALE: no $STAMP — run tools/gate.sh (full mode) first" >&2
  exit 1
fi
want=$(python3 -c "import json; print(json.load(open('$STAMP'))['tree_md5'])")
got=$(tools/tree_state.sh)
if [ "$want" != "$got" ]; then
  echo "GATE STALE: tree $got != certified $want" >&2
  echo "  certified: $(cat $STAMP)" >&2
  echo "  gate-relevant files changed since the last full tools/gate.sh — rerun it" >&2
  exit 1
fi
echo "GATE FRESH: $(cat $STAMP)"
