#!/bin/bash
# round-5 lane A phase 2: launched manually once d10 Baseline s0 completes.
# d=5 cells first (spectral-cond protocol, no flag), then the d=10 tail
# under the fro-cond protocol (--cond-norm is global per campaign call).
cd /root/repo || exit 1
python scratch/run_campaign.py scratch/manifest_r5_laneA_phase2.txt 1 \
    >> scratch/logs/r5_laneA.log 2>&1
python scratch/run_campaign.py scratch/manifest_r5_d10_B1.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneA.log 2>&1
echo "lane A phase 2 done" >> scratch/logs/r5_laneA.log
