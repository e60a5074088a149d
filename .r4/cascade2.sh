#!/bin/bash
# Follow-on A/Bs: wait for the main cascade, then measure the
# weights-by-index formulation (decode-trace fix candidate).
cd /root/repo
R4=/root/repo/.r4
while ! grep -q 'cascade complete' $R4/cascade.status 2>/dev/null; do sleep 60; done
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_step() {
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_step flag_ab:byindex env LMDEPLOY_TPU_WEIGHTS_BY_INDEX=1
status "cascade2 complete"
