#!/bin/bash
# waits for the TPU tunnel, then runs the perf sweep
cd /root/repo
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() != 'cpu'
print(float(np.asarray((jnp.ones((8,8))@jnp.ones((8,8)))[0,0])))" >/dev/null 2>&1
}
until probe; do sleep 240; done
echo "=== TPU BACK $(date) ==="
export KEEP_TPU_BENCH_VERBOSE=1
run() {
  echo "--- $1 ---"
  shift
  env "$@" timeout 900 python bench.py 2>&1 | grep -v -i warning
}
run "default (levels 1/1)"
run "gmflow packed backbone" KEEP_TPU_PACK_GMFLOW=1
run "gen levels 3" KEEP_TPU_PHASE_LEVELS=3
run "enc levels 2" KEEP_TPU_PHASE_ENC_LEVELS=2
run "gen 3 + enc 2" KEEP_TPU_PHASE_LEVELS=3 KEEP_TPU_PHASE_ENC_LEVELS=2
run "gen 2 + enc 2" KEEP_TPU_PHASE_LEVELS=2 KEEP_TPU_PHASE_ENC_LEVELS=2
run "enc levels 3" KEEP_TPU_PHASE_ENC_LEVELS=3
run "all: pack_gmflow + gen3 + enc2" KEEP_TPU_PACK_GMFLOW=1 KEEP_TPU_PHASE_LEVELS=3 KEEP_TPU_PHASE_ENC_LEVELS=2
run "f32 (ledger entry)" KEEP_TPU_BENCH_DTYPE=f32
echo "--- transformer stage probe ---"
timeout 900 python tools/_prof_transformer.py 2>&1 | grep -v -i warning
echo "--- keep attribution (profile modes + pre/post bisect) ---"
KEEP_TPU_PHASE_ENC_LEVELS=${KEEP_TPU_PHASE_ENC_LEVELS:-1} timeout 1200 python tools/_prof_keep.py 2>&1 | grep -v -i warning
echo "--- train step (B=1 T=4, full 512 config) ---"
timeout 1800 python tools/benchmark.py --train --frames 4 --iters 3 2>&1 | grep -v -i warning
echo "--- five-config suite ---"
timeout 3600 python tools/bench_suite.py --iters 3 2>&1 | grep -v -i warning
echo "=== SWEEP DONE $(date) ==="
