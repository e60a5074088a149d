#!/bin/bash
# Retry the packed-int4 / fused-rope A/Bs with the FIXED block mappings.
cd /root/repo
R4=/root/repo/.r4
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_step() {
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_step flag_ab:packed env LMDEPLOY_TPU_PACKED_INT4=1
run_step flag_ab:fusedrope env LMDEPLOY_TPU_FUSED_ROPE=1
run_step flag_ab:both env LMDEPLOY_TPU_PACKED_INT4=1 LMDEPLOY_TPU_FUSED_ROPE=1
status "cascade3 complete"
