#!/bin/bash
# round-5 lane B: d=10 Rescaling s0 -> d=5 ablation grid -> d=10 R rest
cd /root/repo || exit 1
python scratch/run_campaign.py scratch/manifest_r5_d10_R.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneB.log 2>&1
python scratch/run_campaign.py scratch/manifest_r5_d5_abl.txt 1 \
    >> scratch/logs/r5_laneB.log 2>&1
python scratch/run_campaign.py scratch/manifest_r5_d10_R_rest.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneB.log 2>&1
echo "lane B done" >> scratch/logs/r5_laneB.log
