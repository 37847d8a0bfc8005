#!/usr/bin/env bash
# Pre-commit gate: compile -> test -> verify -> oracle diff.
#
# Usage: tools/precommit.sh [--fast]
#   --fast  compile only (the 6-second floor every commit must clear;
#           use before cosmetic/doc commits)
#
# Full mode replicates the driver's t2 gate at sf0.01. Run it before any
# commit that touches src/main. The sbt server must already be warm
# (`sbt` in another shell) or the first step pays ~25s JVM startup.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 compile =="
sbt --client compile

if [[ "${1:-}" == "--fast" ]]; then
  echo "== fast mode: compile green, skipping test/verify =="
  exit 0
fi

echo "== 2/4 test =="
sbt --client test

# Data dir is overridable so the gate isn't hard-coupled to this host's
# layout; the default matches the driver's verification scale.
DATA="${GRAFT_TESTDATA:-/root/testdata/sf0.01}"

echo "== 3/4 verify ($DATA) =="
OUT="${GRAFT_PRECOMMIT_OUT:-/tmp/precommit_verify}"
rm -rf "$OUT"
sbt --client "runMain graft.Verify $DATA $OUT"

echo "== 4/4 oracle diff =="
python3 tools/local_check.py "$OUT" "$DATA"

echo "== precommit gate GREEN =="
