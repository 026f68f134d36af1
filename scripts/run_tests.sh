#!/bin/bash
# Run the test suite one file per pytest process.
#
# Rationale: on a 1-CPU host the full-suite single process accumulates tens
# of GB of XLA:CPU compiled-program state across the big staged/multichip
# programs and can abort mid-run (observed: SIGABRT inside apply_primitive
# after ~30 files-worth of compiles). Per-file processes bound the blast
# radius and let results stream; the per-host compilation cache
# (tests/conftest.py) keeps repeat runs fast.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  t0=$(date +%s)
  out=$(timeout 2400 python -m pytest "$f" -q "$@" 2>&1)
  code=$?
  dt=$(( $(date +%s) - t0 ))
  line=$(echo "$out" | grep -E '(passed|failed|error)' | tail -1)
  printf '%-34s %4ss  %s\n' "$f" "$dt" "${line:-exit=$code}"
  # exit 5 = no tests collected (all deselected by -m) — not a failure
  if [ $code -ne 0 ] && [ $code -ne 5 ]; then
    fail=1
    echo "$out" | tail -30
  fi
done
exit $fail
