#!/bin/bash
# Round-3 queue #10: wait for chain_prof (pid $1), then run the two
# queue9 legs that died with the previous session.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
bash scripts/r3_queue9.sh > runs/results/r3_queue9.log 2>&1
