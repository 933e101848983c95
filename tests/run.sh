#!/usr/bin/env bash
# Process-isolated test runner (VERDICT r4 weak #8 / next #9).
#
# The suite is compile-heavy (hundreds of XLA CPU compilations in one
# process); a single toolchain crash mid-run (observed: non-reproducible
# XLA CPU segfault after ~200 compiles) must not mask the remaining
# results.  This runner executes each test FILE in its own pytest process,
# in parallel (bounded by $JOBS), and aggregates per-file exit codes.
#
# Usage: tests/run.sh [JOBS]   (default JOBS=4)
set -u
cd "$(dirname "$0")/.."
JOBS="${1:-4}"
LOGDIR=/tmp/oxide_test_logs
rm -rf "$LOGDIR" && mkdir -p "$LOGDIR"

run_one() {
    local f="$1"
    local base
    base=$(basename "$f" .py)
    python -m pytest "$f" -q --tb=short >"$LOGDIR/$base.log" 2>&1
    echo $? >"$LOGDIR/$base.rc"
    echo "$f: $(tail -1 "$LOGDIR/$base.log")"
}

for f in tests/test_*.py; do
    while [ "$(jobs -rp | wc -l)" -ge "$JOBS" ]; do wait -n; done
    run_one "$f" &
done
wait

FAIL=0
for rcfile in "$LOGDIR"/*.rc; do
    rc=$(cat "$rcfile")
    if [ "$rc" -ne 0 ]; then
        FAIL=1
        log="${rcfile%.rc}.log"
        echo "== FAILED (rc=$rc): $log"
        tail -8 "$log"
    fi
done
echo "---"
if [ "$FAIL" -ne 0 ]; then
    echo "failures above; full logs in $LOGDIR/"
    exit 1
fi
echo "all test files green"
