#!/bin/bash
# Periodically probe the axon TPU tunnel with a trivial bounded jit.
# Appends one status line per attempt to /tmp/tunnel_status.log.
# Stop by: kill $(cat /tmp/tunnel_monitor2.pid)
while true; do
  ts=$(date -u +%H:%M:%S)
  out=$(timeout 240 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda v: (v*2).sum())(jnp.arange(8.0))
print('OK', float(y))
" 2>&1 | tail -1)
  echo "$ts $out" >> /tmp/tunnel_status.log
  case "$out" in OK*) echo "$ts TUNNEL_UP" >> /tmp/tunnel_status.log; exit 0;; esac
  sleep 180
done
