#!/usr/bin/env bash
# Round-end gate: the suite must COLLECT cleanly and the fast tier must pass.
# Run this as the last action of every build session (VERDICT r3 weak #1:
# a final-commit rename once shipped a suite that errored at collection).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== collect-only (whole suite, incl. slow) =="
python -m pytest tests/ --collect-only -q 2>&1 | tail -3

echo "== fast suite =="
python -m pytest tests/ -m "not slow" -q -x 2>&1 | tail -5

echo "== __graft_entry__ imports =="
python -c "import __graft_entry__ as g; assert callable(g.entry) and callable(g.dryrun_multichip); print('ok')"

echo "== bench.py syntax =="
python -m py_compile bench.py && echo ok
echo "ALL GATES GREEN"
