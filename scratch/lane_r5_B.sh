#!/bin/bash
# round-5 lane B (post-rebalance): d=5 ablation grid only.
# The d=10 Rescaling s0 phase was removed at the mid-round rebalance: its
# convergence question is settled from the committed iteration-44 checkpoint
# (best merit 41.8 -> 0.381 by iter 37, no stall) and its remaining ~34
# explore iterations (~5.7 h at 2-core contention) cannot complete this
# round either way; the core goes to ablation cells that CAN complete.
cd /root/repo || exit 1
python scratch/run_campaign.py scratch/manifest_r5_d5_abl.txt 1 \
    >> scratch/logs/r5_laneB.log 2>&1
python scratch/run_campaign.py scratch/manifest_r5_d10_R_rest.txt 1 --cond-norm fro \
    >> scratch/logs/r5_laneB.log 2>&1
echo "lane B done" >> scratch/logs/r5_laneB.log
