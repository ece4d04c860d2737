#!/usr/bin/env bash
# One command to re-measure every chip-bound artifact after code changes
# (run on a host with the real TPU visible):
#   1. bench.py            — headline mapping FPS (also warms the remote
#                            compiler's program cache for the driver)
#   2. serving_bench       — device + wall decode rates (results/)
#   3. run_query_suite.sh  — 3-room map build + wide bilingual query battery
#                            (fast / slow-CLIP / slow-generative) + long-query
# Probes the tunnel first: during outages both compiles and cached-program
# execution hang (CLAUDE.md), so fail fast instead of wedging.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tunnel probe =="
timeout 120 python - <<'PY'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.full((8, 8), time.time() % 97)  # unique constant -> fresh compile
print("probe ok:", float(jax.jit(lambda a: (a @ a).sum())(x)) == float((x @ x).sum()) or True,
      f"{time.time()-t0:.1f}s")
PY

echo "== bench.py =="
timeout 3000 python bench.py

echo "== serving bench =="
timeout 1200 python -m holoagent_tpu.apps.serving_bench --out results/serving_bench_tpu.json

echo "== query suite =="
bash scripts/run_query_suite.sh

echo "all chip artifacts refreshed; commit results/ and BENCH numbers"
