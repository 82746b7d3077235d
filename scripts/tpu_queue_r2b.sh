#!/bin/bash
# Post-reboot TPU work queue (tunnel confirmed up): runs the jobs that were
# queued during the outage STRICTLY sequentially (one TPU client at a time —
# CLAUDE.md).  Logs to /tmp/tpu_queue/.
# Launch: nohup setsid bash scripts/tpu_queue_r2b.sh > /tmp/tpu_queue/driver2.log 2>&1 &
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "$(date -u +%H:%M:%S) START $tag" >> /tmp/tpu_queue/status.log
  timeout "$to" "$@" > "/tmp/tpu_queue/$tag.log" 2>&1
  local rc=$?
  echo "$(date -u +%H:%M:%S) DONE $tag rc=$rc" >> /tmp/tpu_queue/status.log
  sleep 60
}

run vcheck_r33 2400 python -u scripts/vcheck_r33.py
run probe_r33 3600 python -u scripts/probe_r33.py
run probe_r34 4800 python -u scripts/probe_r34.py
run bench 2700 python -u bench.py
run hwtests 3600 env FFT_WGPU_TPU_HW=1 python -m pytest tests/ -m tpu -q
echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/tpu_queue/status.log
