#!/bin/bash
# A/B: fully unrolled layer loop (static weight slices, no scan-xs copies).
cd /root/repo
R4=/root/repo/.r4
while ! grep -q 'cascade3 complete' $R4/cascade.status 2>/dev/null; do sleep 60; done
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_step() {
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_step flag_ab:unroll env LMDEPLOY_TPU_UNROLL_LAYERS=32
status "cascade4 complete"
