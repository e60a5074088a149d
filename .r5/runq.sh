#!/bin/bash
# Serialized TPU measurement queue (VERDICT r4 "next round" item 5).
# One job at a time; a chip-health + free-HBM probe gates each job; jobs
# are NEVER killed on a timer (killing a TPU client mid-compile wedges
# the chip and leaks its HBM — CLAUDE.md).  Usage:
#   .r5/runq.sh jobname1 jobname2 ...
# where .r5/<jobname%%:*>.py exists; a "name:variant" job runs the same
# script with the env prefix read from .r5/<name:variant>.env if present.
cd /root/repo
R5=/root/repo/.r5
status() { echo "$(date -u +%H:%M:%S) $1" >> $R5/queue.status; }

for job in "$@"; do
  script=${job%%:*}
  # gate: require a healthy chip with >=8GB free before burning a slot
  for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
    python $R5/probe.py --gb 8 > $R5/probe_last.json 2>/dev/null
    prc=$?
    if [ $prc -eq 0 ]; then break; fi
    status "WAIT $job probe_rc=$prc attempt=$attempt ($(cat $R5/probe_last.json))"
    sleep 300
  done
  if [ $prc -ne 0 ]; then
    status "SKIP $job chip unhealthy after 12 probes"
    continue
  fi
  envfile=$R5/$job.env
  spath=$R5/$script.py
  [ -f "$spath" ] || spath=/root/repo/.r4/$script.py
  status "START $job"
  if [ -f "$envfile" ]; then
    env $(cat $envfile) python $spath > $R5/$job.log 2>&1
  else
    python $spath > $R5/$job.log 2>&1
  fi
  rc=$?
  grep '^{' $R5/$job.log | tail -1 > $R5/$job.json
  status "DONE $job rc=$rc json_bytes=$(wc -c < $R5/$job.json)"
done
status "queue complete: $*"
