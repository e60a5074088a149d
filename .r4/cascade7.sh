#!/bin/bash
# Clean rerun of host-timing-sensitive measurements (the first pass ran
# while a CPU pytest suite shared the single host core).
cd /root/repo
R4=/root/repo/.r4
while ! grep -q 'cascade6 complete' $R4/cascade.status 2>/dev/null; do sleep 60; done
# also wait for any pytest to drain
while pgrep -f 'pytest tests' > /dev/null 2>&1; do sleep 60; done
status() { echo "$(date -u +%H:%M:%S) $1" >> $R4/cascade.status; }
run_mod() {
  local name=$1; shift
  status "START $name"
  "$@" > $R4/$name.log 2>&1
  local rc=$?
  tail -5 $R4/$name.log | grep '^{' | tail -1 > $R4/$name.json
  status "DONE $name rc=$rc json=$(wc -c < $R4/$name.json)"
}
run_mod saturation python -m benchmark.saturation --bs 8,16,32 --out-tokens 96 --requests 24 --concurrency 12
run_mod interleave python -m benchmark.interleave --interleave 0,8
status "cascade7 complete"
