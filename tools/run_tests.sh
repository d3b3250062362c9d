#!/bin/bash
# Test-tier runner (round-5 VERDICT item 8).
#
#   tools/run_tests.sh           -> default tier (< 5 min single-core)
#   tools/run_tests.sh slow      -> slow tier only (heavy parity/convergence/
#                                   multi-process tests; ~1 h; run once per
#                                   round, result recorded in docs/STATUS.md)
#   tools/run_tests.sh all       -> everything (default + slow)
#
# The tier roster lives in tests/conftest.py (SLOW_ROSTER) with measured
# durations in work_dirs/pytest_durations.log.
set -u
cd "$(dirname "$0")/.."
TIER="${1:-default}"
shift || true

case "$TIER" in
  default)
    echo "== tier: default (slow tests skipped; tools/run_tests.sh slow for the rest) =="
    exec python -m pytest tests -q "$@"
    ;;
  slow)
    echo "== tier: slow (heavy parity/convergence/multi-process tests only) =="
    exec python -m pytest tests -q --runslow -m slow "$@"
    ;;
  all)
    echo "== tier: all (default + slow; ~1 h single-core) =="
    exec python -m pytest tests -q --runslow "$@"
    ;;
  *)
    echo "usage: tools/run_tests.sh [default|slow|all] [pytest args...]" >&2
    exit 2
    ;;
esac
