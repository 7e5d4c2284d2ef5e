#!/bin/bash
# Cold-start drill (VERDICT r4 ask #8b): wipe the persistent XLA compile
# cache and run the full driver benchmark genuinely cold, proving the
# evidence pipeline survives a cold container (rc 0, full metric set,
# "cold": true markers). The drill doubles as the cache re-warmer: every
# shape it compiles lands back in .jax_cache for the next (warm) run.
#
# Usage: bash tools/cold_drill.sh [budget_seconds]
# Writes perf_logs/bench_r5_cold.{stdout,stderr}.log.
set -u
cd "$(dirname "$0")/.."
BUDGET="${1:-7200}"
echo "[cold_drill] wiping .jax_cache ($(du -sh .jax_cache 2>/dev/null | cut -f1))"
rm -rf .jax_cache
env -u JAX_PLATFORMS SWT_BENCH_BUDGET_S="$BUDGET" \
    PYTHONPATH=/root/repo:/root/.axon_site \
    python bench.py \
    > perf_logs/bench_r5_cold.stdout.log \
    2> perf_logs/bench_r5_cold.stderr.log
rc=$?
echo "[cold_drill] rc=$rc"
echo "[cold_drill] metrics:"
grep '^{' perf_logs/bench_r5_cold.stdout.log | tail -12
exit $rc
