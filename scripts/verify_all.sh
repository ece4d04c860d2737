#!/bin/bash
# One-command repo verification: the native sanitizer harness, the hermetic
# test suite (8-device virtual CPU mesh — this includes the end-to-end CLI
# app tests, tests/test_apps.py), and the multi-chip sharded dry run.
# Everything runs without TPU hardware; run `python bench.py` separately on a
# real chip for the headline number.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build + ASan harness =="
make -C native >/dev/null
./native/run_sanitizers.sh

echo "== test suite (virtual 8-device mesh) =="
python -m pytest tests/ -q

echo "== multi-chip dry run (8 virtual devices) =="
python - <<'EOF'
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
fn, args = g.entry()
print("entry:", jax.eval_shape(fn, *args).shape)
EOF

echo "== all checks passed =="
