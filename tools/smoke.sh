#!/bin/sh
# Fast commit gate (~80 s on this box): field evaluators in both modes x
# both model kinds, fused level path, a jitted grad step, entry(), and
# dryrun_multichip(8). Run before EVERY commit (VERDICT r2 weak #5).
#
# Test-budget tiers (VERDICT r4 #7):
#   tools/smoke.sh                      ~1.5 min  (this gate, -m smoke)
#   pytest tests -m "not slow" -q       ~7 min    (everything but the
#                                       heavy interpret-mode kernel /
#                                       golden-parity / multistep tests)
#   pytest tests -q                     ~19 min   (full suite)
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests -m smoke -q "$@"
