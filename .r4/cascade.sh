#!/bin/bash
# Round-4 on-chip measurement cascade. Sequential (one chip). NO timeouts,
# NO kills: killing a TPU client mid-compile wedges the remote chip for
# 10-60+ min (CLAUDE.md). Risky compile-hang-class A/Bs run LAST so a
# hang only costs the tail.
cd /root/repo
R4=/root/repo/.r4
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }

run_step() {  # name, then env/cmd...
  local name=$1; shift
  status "START $name"
  "$@" python $R4/${name%%:*}.py > $R4/$name.log 2>&1
  local rc=$?
  # last line that parses as JSON becomes the artifact
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}

status "cascade begin"
run_step mm_regime env
run_step topk_ab:on  env LMDEPLOY_TPU_APPROX_TOPK=1
run_step topk_ab:off env LMDEPLOY_TPU_APPROX_TOPK=0
run_step trace_decode env
run_step flag_ab:base env
run_step flag_ab:packed env LMDEPLOY_TPU_PACKED_INT4=1
run_step flag_ab:fusedrope env LMDEPLOY_TPU_FUSED_ROPE=1
run_step flag_ab:both env LMDEPLOY_TPU_PACKED_INT4=1 LMDEPLOY_TPU_FUSED_ROPE=1
status "cascade complete"
