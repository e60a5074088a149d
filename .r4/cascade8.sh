#!/bin/bash
# Prefill-throughput A/B: dequant regime (default, MIN_M=32) vs the old
# group-everywhere default.
cd /root/repo
R4=/root/repo/.r4
while ! grep -q 'cascade7 complete' $R4/cascade.status 2>/dev/null; do sleep 60; done
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_step() {
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_step prefill_tput:dequant env
run_step prefill_tput:group env LMDEPLOY_TPU_DEQUANT_MIN_M=1073741824
status "cascade8 complete"
