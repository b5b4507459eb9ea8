#!/bin/bash
# Round-5 finalize: merge per-start npz into the reference-schema _all files
# and print the method-vs-paper summary for every corpus with data.
cd /root/repo || exit 1
for spec in "5 results_data/full_d5" "5 results_data/contrast_d5" \
            "5 results_data/contrast_lcb_d5" "5 results_data/honest_d5" \
            "10 results_data/full_d10" "20 results_data/full_d20"; do
  set -- $spec
  echo "=== $2 ==="
  python examples/run_paper_traces.py --dim "$1" --merge --out-dir "$2" 2>/dev/null
  python examples/run_paper_traces.py --dim "$1" --summary --out-dir "$2" 2>/dev/null
done
