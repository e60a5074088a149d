#!/bin/bash
# Chip-recovery watcher: probe every 10 min; on the first healthy probe
# hand the full measurement queue to runq.sh (which re-probes between
# jobs).  Never kills a TPU client mid-compile (probe.py's subprocess
# timeout only fires on the handshake-wedge class, which is safe).
cd /root/repo
R5=/root/repo/.r5
log() { echo "$(date -u +%H:%M:%S) $1" >> $R5/watch.log; }
log "watcher start: $*"
for i in $(seq 1 60); do
  python $R5/probe.py --gb 8 --timeout 420 > $R5/probe_last.json 2>/dev/null
  prc=$?
  log "probe rc=$prc $(cat $R5/probe_last.json)"
  if [ $prc -eq 0 ]; then
    log "chip healthy -> running queue"
    bash $R5/runq.sh "$@"
    log "queue finished"
    exit 0
  fi
  sleep 600
done
log "gave up after 60 probes"
exit 1
