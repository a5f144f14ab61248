#!/usr/bin/env bash
# Nightly slow-tier runner: executes the compile-heavy test tier and appends
# a dated pass/fail line to tests/nightly_log.txt so "the slow tests exist"
# is always backed by "they last ran on date X".
#
# Usage: tests/run_nightly.sh  (from the repo root; any pytest args pass through)
set -u
cd "$(dirname "$0")/.."
LOG=tests/nightly_log.txt
START=$(date -u +"%Y-%m-%dT%H:%M:%SZ")
OUT=$(timeout 3600 python -m pytest tests/ -m slow -q "$@" 2>&1)
STATUS=$?
TAIL=$(printf '%s\n' "$OUT" | tail -n 1)
if [ $STATUS -eq 0 ]; then
    echo "$START PASS  $TAIL" >> "$LOG"
else
    echo "$START FAIL(exit=$STATUS)  $TAIL" >> "$LOG"
    printf '%s\n' "$OUT" | tail -n 40
fi
exit $STATUS
