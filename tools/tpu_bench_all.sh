#!/bin/bash
# Full TPU bench sweep: teacher train rows at every scale, the full-capacity
# multisweep row, the serving row, and the student distill row. Appends the
# JSON lines to the log. Run only when the tunnel is healthy
# (python -c 'import jax,jax.numpy as jnp; jax.jit(lambda a:a@a)(jnp.ones((8,8))).block_until_ready()').
set -u
LOG=${1:-/tmp/tpu_bench_all.log}
cd "$(dirname "$0")/.."
for args in \
    "" \
    "--points=32768 --batch=1" \
    "--points=65536 --batch=1" \
    "--points=131072 --batch=1" \
    "--infer" \
    "--infer --points=131072 --batch=1" \
    "--student --points=8192 --tpoints=32768 --remat" \
    "--e2e" \
    "--e2e --points=32768 --batch=1 --batches=12"; do
  echo "=== bench.py $args ===" | tee -a "$LOG"
  timeout 1800 python bench.py $args 2>>"$LOG" | tee -a "$LOG"
done
