#!/usr/bin/env bash
# Default correctness gate: the local replica of the driver's gate,
# run BEFORE every commit that touches query surface.
#
# Sweeps {sf0.001, sf0.01} x {32, 7} cpus: every SparkEntry query is
# dumped by graft.Verify (canonical row order, stale-output-proof) and
# compared against its DuckDB oracle by tools/check_correctness.py —
# including the dtype-family check that caught the r6 q63/q65 HUGEINT
# oracle bug before it cost a round. Two CPU counts because partition
# count is the environment variable most likely to flake a result
# (row order, float reduction order, AQE plan flips); the driver runs
# 32-ish, laptops run fewer — both must be green.
#
# The DuckDB sweep alone is NOT the whole gate: the r8 NTZ break
# shipped with every DuckDB cell green because only the ScalaTest
# suites exercise the streaming/spec-only surface. The suites are
# therefore part of the default gate. SKIP_SBT_TEST=1 skips them for
# a quick oracle-only iteration loop — but that mode is not "green".
#
# Usage: tools/gate.sh            (suites + full sweep, ~4 Verify runs)
#        SFS=/root/testdata/sf0.01 CPUS=32 tools/gate.sh   (one cell)
#        SKIP_SBT_TEST=1 tools/gate.sh   (oracle sweep only, no suites)
set -euo pipefail
cd "$(dirname "$0")/.."

SFS=${SFS:-"/root/testdata/sf0.001 /root/testdata/sf0.01"}
CPUS=${CPUS:-"32 7"}
OUTROOT=${OUTROOT:-/tmp/graft_gate}

sbt -batch compile

python3 tools/check_anchors.py
python3 tools/check_leaks.py

if [ "${SKIP_SBT_TEST:-0}" != "1" ]; then
  echo "== gate: ScalaTest suites =="
  sbt -batch test
fi

for sf in $SFS; do
  for c in $CPUS; do
    tag="$(basename "$sf")_cpu$c"
    out="$OUTROOT/$tag"
    echo "== gate: $sf @ $c cpus -> $out =="
    SPARK_GRAFT_CPUS=$c sbt -batch "runMain graft.Verify $sf $out"
    python3 tools/check_correctness.py "$sf" "$out"
    LAST_OUT="$out"
  done
done
echo "GATE GREEN: {$SFS} x {$CPUS} cpus all match their oracles"

# Certify the tree ONLY for a full run (suites + default sweep): the
# stamp is what tools/check_gate_fresh.sh compares against before a
# snapshot commit, so a narrowed or suite-skipping run must not issue
# one (the r9 q96 oracle typo shipped exactly through that gap).
if [ "${SKIP_SBT_TEST:-0}" != "1" ] && \
   [ "$SFS" = "/root/testdata/sf0.001 /root/testdata/sf0.01" ] && \
   [ "$CPUS" = "32 7" ]; then
  nq=$(find "$LAST_OUT" -maxdepth 1 -name 'q*' -type d | wc -l)
  cat > .gate_stamp.json <<EOF
{"tree_md5": "$(tools/tree_state.sh)", "head": "$(git rev-parse HEAD)", "queries": $nq, "utc": "$(date -u +%FT%TZ)"}
EOF
  echo "GATE CERTIFIED: $(cat .gate_stamp.json)"
else
  echo "(partial gate run — stamp NOT updated; full default run certifies)"
fi
