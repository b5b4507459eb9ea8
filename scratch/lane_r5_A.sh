#!/bin/bash
# round-5 lane A: d=10 Baseline corpus (resumable; one worker, both cores)
cd /root/repo || exit 1
python scratch/run_campaign.py scratch/manifest_r5_d10_B.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneA.log 2>&1
python scratch/run_campaign.py scratch/manifest_r5_d20.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneA.log 2>&1
echo "lane A done" >> scratch/logs/r5_laneA.log
