#!/usr/bin/env bash
# Pre-snapshot gate check — run before EVERY end-of-round commit.
#
# Round 4 shipped a red driver gate (MULTICHIP_r04 rc=1) and 3 red tests
# because nothing forced these to run together before the snapshot. This
# script is that forcing function: it runs the full test suite, the
# driver's multi-chip dryrun (8 virtual CPU devices), and a bench.py
# smoke, and exits nonzero if ANY of them fail.
#
# Usage:  bash scripts/check_gates.sh [--fast]
#   --fast  skip the flagship-shape dryrun modes (slow on a 1-core host);
#           the toy-shape dp/tp/sp/ep/pp dryrun still runs.
set -u -o pipefail
cd "$(dirname "$0")/.."

FAST=0
[ "${1:-}" = "--fast" ] && FAST=1

fail=0
note() { printf '\n=== %s ===\n' "$*"; }

note "gate 1/3: pytest tests/ (full suite)"
if ! python -m pytest tests/ -q; then
    echo "GATE FAILED: pytest"
    fail=1
fi

note "gate 2/3: dryrun_multichip(8)"
DRY_ENV=""
[ "$FAST" = "1" ] && export SIGNAL_TPU_DRYRUN_FLAGSHIP=0
if ! python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"; then
    echo "GATE FAILED: dryrun_multichip(8)"
    fail=1
fi

note "gate 3/3: bench.py smoke (JSON line parses)"
# The bench needs a chip; on a chipless box it must still exit 0 and
# print one parseable JSON line (tests/test_bench_watchdog.py contract).
if ! python bench.py > /tmp/check_gates_bench.json 2>/tmp/check_gates_bench.err; then
    echo "GATE FAILED: bench.py exited nonzero"
    cat /tmp/check_gates_bench.err
    fail=1
elif ! python - <<'EOF'
import json, sys
line = [l for l in open("/tmp/check_gates_bench.json") if l.strip().startswith("{")]
assert line, "bench.py printed no JSON line"
d = json.loads(line[-1])
assert "metric" in d and "value" in d and "unit" in d and "vs_baseline" in d, d.keys()
print("bench JSON ok:", d["metric"], "=", d["value"], d["unit"])
EOF
then
    echo "GATE FAILED: bench.py JSON contract"
    fail=1
fi

if [ "$fail" -ne 0 ]; then
    note "GATES RED — do NOT snapshot"
    exit 1
fi
note "ALL GATES GREEN"
