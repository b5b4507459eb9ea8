#!/bin/bash
# Round-3 campaign supervisor: waits for the orphaned d5 Rescaling workers,
# then runs the remaining phases in priority order.
cd /root/repo
while pgrep -f "worker Rescaling 2" > /dev/null || pgrep -f "worker Rescaling 3" > /dev/null; do
  sleep 60
done
python scratch/run_campaign.py scratch/manifest_d5_rest.txt 2 >> scratch/logs/campaign_d5.log 2>&1
python scratch/run_campaign.py scratch/manifest_r3_rest.txt 2 --cond-norm fro > scratch/logs/campaign_d10.log 2>&1
python scratch/run_campaign.py scratch/manifest_d20.txt 2 --cond-norm fro > scratch/logs/campaign_d20.log 2>&1
python scratch/run_campaign.py scratch/manifest_d5_ablations.txt 2 > scratch/logs/campaign_abl.log 2>&1
echo "supervisor: all phases complete" >> scratch/logs/campaign_d5.log
