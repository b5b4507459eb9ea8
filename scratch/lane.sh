#!/bin/bash
# Sequential BO-trace worker lane: lane.sh <core> <job>...
# job = dim:method:start:n_iter
core=$1; shift
for job in "$@"; do
  IFS=: read -r dim method start niter <<< "$job"
  log="scratch/logs/d${dim}_${method:0:1}${start}.log"
  echo "=== lane$core: $job -> $log ($(date +%T)) ==="
  env PYTHONPATH= JAX_PLATFORMS=cpu taskset -c "$core" \
    python examples/run_paper_traces.py --dim "$dim" --n-iter "$niter" \
    --worker "$method" "$start" --out-dir "results_data/full_d${dim}" \
    > "$log" 2>&1
  echo "=== lane$core: $job done ($(date +%T), exit $?) ==="
done
