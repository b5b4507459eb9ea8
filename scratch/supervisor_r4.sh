#!/bin/bash
# Campaign supervisor (round 4+): one command restarts the whole remaining
# BO-trace queue.  Every phase is RESUMABLE -- workers replay their
# per-start npz checkpoints (completed markers; legacy NaN-tail files only
# count done with the machine-precision early-stop signature), so re-running
# a finished phase is a no-op and a killed phase continues where it died.
#
#   nohup bash scratch/supervisor_r4.sh > scratch/logs/supervisor_r4.log 2>&1 &
#
# Two parallel chains (10-core host, ~8 workers at a time):
#   chain 1: d5 Rescaling leftovers (spectral cond) -> d5 ablations
#   chain 2: d10 Precondition -> d10 Rescaling+Baseline -> d20 (fro cond)
# After both: merge + summary for every out-dir with complete methods.
cd /root/repo || exit 1
export OMP_NUM_THREADS=2 OPENBLAS_NUM_THREADS=2 MKL_NUM_THREADS=2

(
  python scratch/run_campaign.py scratch/manifest_d5_rest.txt 3 \
      >> scratch/logs/campA2_d5rest.log 2>&1
  python scratch/run_campaign.py scratch/manifest_d5_ablations.txt 3 \
      >> scratch/logs/campC_abl.log 2>&1
  echo "chain1 (d5 rest + ablations) done"
) &
CHAIN1=$!

(
  python scratch/run_campaign.py scratch/manifest_d10_P.txt 5 --cond-norm fro \
      >> scratch/logs/campA_d10P.log 2>&1
  python scratch/run_campaign.py scratch/manifest_d10_RB.txt 6 --cond-norm fro \
      >> scratch/logs/campB_d10RB.log 2>&1
  python scratch/run_campaign.py scratch/manifest_d20.txt 8 --cond-norm fro \
      >> scratch/logs/campD_d20.log 2>&1
  echo "chain2 (d10 + d20) done"
) &
CHAIN2=$!

wait $CHAIN1 $CHAIN2

for spec in "5 results_data/full_d5" "5 results_data/contrast_d5" \
            "5 results_data/honest_d5" "10 results_data/full_d10" \
            "20 results_data/full_d20"; do
  set -- $spec
  python examples/run_paper_traces.py --dim "$1" --merge --out-dir "$2"
  python examples/run_paper_traces.py --dim "$1" --summary --out-dir "$2"
done
echo "supervisor_r4: all phases + merges complete"
