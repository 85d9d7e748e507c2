#!/bin/bash
# One-shot TPU measurement queue (run when the axon tunnel is up).
# Serialize all real-TPU work: one process at a time (docs/PERF.md).
# Usage: tools/tpu_session.sh [outdir]
set -u
mkdir -p "${1:-/tmp/tpu_results}"
OUT=$(cd "${1:-/tmp/tpu_results}" && pwd)  # absolute: we cd below
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M)) ===" | tee -a "$OUT/log.txt"
  timeout "$t" "$@" >"$OUT/$name.txt" 2>&1
  echo "exit=$? $(tail -c 400 "$OUT/$name.txt" | tr '\n' ' ')" \
    | tee -a "$OUT/log.txt"
}

# 1. Baseline headline (also warms the compile cache).
run bench_base 2400 python bench.py --iters 10

# 2. Head-fusion A/B at batch 48.
run bench_fuse_cls  2400 python bench.py --iters 10 --fuse cls
run bench_fuse_mask 2400 python bench.py --iters 10 --fuse mask
run bench_fuse_both 2400 python bench.py --iters 10 --fuse both

# 3. Proposal sub-stage attribution (the 18.9 ms stage, never decomposed).
run ablate_proposal 3600 env PYTHONPATH=.:${PYTHONPATH:-} \
  python tools/ablate_pipeline.py --batch 48 --proposal-detail
run prop_probe 2400 env PYTHONPATH=.:${PYTHONPATH:-} python tools/prop_probe.py

echo "done $(date +%H:%M)" | tee -a "$OUT/log.txt"
