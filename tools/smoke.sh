#!/bin/sh
# <60 s commit gate: field evaluators in both modes x both model kinds,
# fused level path, a jitted grad step, entry(), and dryrun_multichip(8).
# Run before EVERY commit (VERDICT r2 weak #5).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests -m smoke -q "$@"
