#!/usr/bin/env bash
# Pre-commit green gate (round-9 postmortem: a non-compiling tree was
# snapshotted at the turn limit; this script makes that impossible when run
# before any end-of-round commit).
#
# Usage:
#   tools/gate.sh           # compile + Test/compile (fast, default)
#   tools/gate.sh full      # + full ScalaTest suite
#   tools/gate.sh verify    # + Verify dump at sf0.001 and DuckDB oracle check
#
# Exits non-zero on the first failure; commit only when it prints GATE OK.
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-fast}"

echo "[gate] sbt compile + Test/compile"
sbt -batch "compile; Test/compile" >/tmp/gate-compile.log 2>&1 || {
  tail -30 /tmp/gate-compile.log; echo "[gate] COMPILE FAILED"; exit 1; }

if [[ "$mode" == "full" || "$mode" == "verify" ]]; then
  echo "[gate] sbt test"
  sbt -batch test >/tmp/gate-test.log 2>&1 || {
    grep -E "\*\*\*|FAILED|Tests:" /tmp/gate-test.log | tail -20
    echo "[gate] TESTS FAILED"; exit 1; }
  grep -E "Tests: succeeded" /tmp/gate-test.log | tail -1
fi

if [[ "$mode" == "verify" ]]; then
  echo "[gate] Verify dump (sf0.001) + DuckDB oracle"
  rm -rf /tmp/gate-vout
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gate-vout" \
    >/tmp/gate-verify.log 2>&1 || {
    tail -30 /tmp/gate-verify.log; echo "[gate] VERIFY FAILED"; exit 1; }
  python3 tools/check.py /root/testdata/sf0.001 /tmp/gate-vout || {
    echo "[gate] ORACLE CHECK FAILED"; exit 1; }
fi

echo "GATE OK ($mode)"
