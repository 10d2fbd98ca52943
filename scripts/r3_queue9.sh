#!/bin/bash
# Round-3 chip queue #9 (last): flagship 8-scene recall + a putative-set
# size probe on the hard alias scene. Leaves the chip idle afterwards.
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue9 start $(date) ==="

echo "--- [1/2] config-3 recall, flagship checkpoint ---"
timeout 5400 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r3_recall_full8_presync.json" \
  > "$R/r3_recall_full8_presync.log" 2>&1
echo "rc=$? $(date)"; python -c "
import json; d=json.load(open('$R/r3_recall_full8_presync.json'))
print('protocol mean', round(d['recall']['mean'],3), 'all-pairs', round(d['recall_allpairs']['mean'],3))" 2>/dev/null

echo "--- [2/2] hard-scene probe: num_corr=4096 ---"
timeout 2700 python scripts/benchmark_pairwise.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=4096" \
  --json-out "$R/r3_recall_4096.json" > "$R/r3_recall_4096.log" 2>&1
echo "rc=$? $(date)"; python -c "
import json; d=json.load(open('$R/r3_recall_4096.json'))
print('4096 protocol', {k: round(v,3) for k,v in d['recall'].items()})" 2>/dev/null
echo "=== r3 queue9 done $(date) ==="
