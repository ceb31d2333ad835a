#!/bin/bash
# Full TPU bench sweep. `python bench.py` (no args) runs the whole
# production-scale row table, each row in its own subprocess (the sandbox
# tunnel serializes a process after its first device-to-host read — PERF.md
# round 3), and prints ONE JSON line with the table; this script adds the
# scaling-curve rows the table omits. Run only when the tunnel is healthy:
#   python -c 'import jax,jax.numpy as jnp; jax.jit(lambda a:a@a)(jnp.ones((8,8))).block_until_ready()'
set -u
LOG=${1:-/tmp/tpu_bench_all.log}
cd "$(dirname "$0")/.."
echo "=== bench.py (full row table) ===" | tee -a "$LOG"
timeout 4200 python bench.py 2>>"$LOG" | tee -a "$LOG"
for args in \
    "--points=32768 --batch=1" \
    "--points=65536 --batch=1" \
    "--e2e --points=131072 --batch=1 --workers=2" \
    "--e2e --points=131072 --batch=1 --workers=1"; do
  echo "=== bench.py $args ===" | tee -a "$LOG"
  timeout 1800 python bench.py $args 2>>"$LOG" | tee -a "$LOG"
done
