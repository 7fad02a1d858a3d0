#!/bin/bash
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) TPU RECOVERED" >> /root/repo/.scratch/tpu_watch.log
    exit 0
  fi
  echo "$(date +%H:%M:%S) down" >> /root/repo/.scratch/tpu_watch.log
  sleep 100
done
