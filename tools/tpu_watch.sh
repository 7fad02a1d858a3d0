#!/bin/bash
# TPU-tunnel liveness poller (VERDICT r4 #8: the round-4 recovery pattern,
# promoted from .scratch so future sessions don't rediscover it).
#
# Background: the axon tunnel can wedge -- every device program, even a
# trivial matmul, hangs indefinitely. Observed twice in round 4, both
# times right after axon client processes were killed mid-compile /
# mid-transfer. Recovery is waiting it out (~minutes to ~1 h); nothing
# host-side unwedges it faster. Rules that avoid it in the first place:
#   * never kill axon clients by pattern; prefer not killing them at all
#     mid-compile or mid-transfer -- run probes under `timeout` instead,
#   * run big compiles in subprocesses so a device fault cannot poison
#     the main process's TPU client.
#
# Usage: tools/tpu_watch.sh [logfile]   (default /tmp/tpu_watch.log)
# Runs until one trivial device program succeeds, logging a line every
# ~100 s; exits 0 on recovery. Start it detached when the tunnel wedges:
#   nohup tools/tpu_watch.sh & tail -f /tmp/tpu_watch.log
LOG="${1:-/tmp/tpu_watch.log}"
while true; do
  if timeout -k 10 60 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) TPU RECOVERED" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) down" >> "$LOG"
  sleep 100
done
