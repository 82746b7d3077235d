#!/bin/bash
# Post-outage TPU work queue: waits for tunnel recovery, then runs the
# queued hardware jobs STRICTLY sequentially (one TPU client at a time —
# CLAUDE.md).  Logs to /tmp/tpu_queue/.
# Launch: nohup setsid bash scripts/tpu_queue_r2.sh > /tmp/tpu_queue/driver.log 2>&1 &
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

probe() {
  timeout 300 python -u -c "
import jax, jax.numpy as jnp
print('TUNNEL_OK', float(jax.jit(lambda v: (v*2).sum())(jnp.arange(8.0))))
" 2>&1 | grep -q TUNNEL_OK
}

echo "$(date -u +%H:%M:%S) waiting for tunnel" >> /tmp/tpu_queue/status.log
until probe; do
  echo "$(date -u +%H:%M:%S) still down" >> /tmp/tpu_queue/status.log
  sleep 240
done
echo "$(date -u +%H:%M:%S) first OK; settling" >> /tmp/tpu_queue/status.log
sleep 120
until probe; do
  echo "$(date -u +%H:%M:%S) second probe failed; re-waiting" >> /tmp/tpu_queue/status.log
  sleep 240
done
echo "$(date -u +%H:%M:%S) TUNNEL RECOVERED — starting queue" >> /tmp/tpu_queue/status.log

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "$(date -u +%H:%M:%S) START $tag" >> /tmp/tpu_queue/status.log
  timeout "$to" "$@" > "/tmp/tpu_queue/$tag.log" 2>&1
  local rc=$?
  echo "$(date -u +%H:%M:%S) DONE $tag rc=$rc" >> /tmp/tpu_queue/status.log
  # settle between jobs: give the tunnel a clean gap
  sleep 60
}

run vcheck_r33 2400 python -u scripts/vcheck_r33.py
run probe_r33 3600 python -u scripts/probe_r33.py
run bench 2700 python -u bench.py
run hwtests 3000 env FFT_WGPU_TPU_HW=1 python -m pytest tests/ -m tpu -q
echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/tpu_queue/status.log
