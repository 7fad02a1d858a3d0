#!/bin/bash
cd /root/repo
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) UP - launching chain" >> .scratch/tpu_autorun.log
    timeout 1500 python .scratch/probe_r4_b.py > .scratch/probe_r4_b4.log 2>&1 \
      && timeout 1500 python .scratch/probe_r4_diag.py > .scratch/probe_r4_diag.log 2>&1 \
      && timeout 900 python .scratch/probe_r4_overlap.py > .scratch/probe_r4_overlap.log 2>&1 \
      && timeout 2400 python .scratch/probe_r4_contact.py > .scratch/probe_r4_contact.log 2>&1 \
      && { echo "$(date +%H:%M:%S) CHAIN DONE" >> .scratch/tpu_autorun.log; exit 0; }
    echo "$(date +%H:%M:%S) chain died/timed out, re-polling" >> .scratch/tpu_autorun.log
  else
    echo "$(date +%H:%M:%S) down" >> .scratch/tpu_autorun.log
  fi
  sleep 90
done
