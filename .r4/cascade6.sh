#!/bin/bash
# Retry packed-int4 with the i32-widened nibble split (shrui fix).
cd /root/repo
R4=/root/repo/.r4
while ! grep -q 'cascade5 complete' $R4/cascade.status 2>/dev/null; do sleep 60; done
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_step() {
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_step flag_ab:packed2 env LMDEPLOY_TPU_PACKED_INT4=1
status "cascade6 complete"
