#!/bin/bash
# Probe the axon TPU relay every INTERVAL seconds until jax.devices() answers.
# Writes status lines to /tmp/relay_status; exits 0 on first success.
# One probe at a time, bounded by timeout -- never piles on a wedged relay.
INTERVAL=${1:-600}
while true; do
  ts=$(date +%H:%M:%S)
  if timeout 120 python -c "import jax; d=jax.devices(); print(d)" > /tmp/relay_probe.out 2>&1; then
    echo "$ts ALIVE $(cat /tmp/relay_probe.out | tail -1)" >> /tmp/relay_status
    exit 0
  else
    echo "$ts wedged" >> /tmp/relay_status
  fi
  sleep "$INTERVAL"
done
