#!/bin/bash
# Claim-or-retry loop for a flaky relay: launch the one-claim sequence
# DIRECTLY (no separate probe -- round 3 showed a successful probe can burn
# the only grant of a ~20-min recovery window) and judge health by artifact
# progress. If ROUND4_ONECLAIM.json is not (re)written within GRACE seconds
# the PJRT client is wedged: kill the process and retry after INTERVAL.
# On a live claim, wait for the sequence, then run bench.py (fresh claim,
# warm compile cache) so the full evidence chain lands unattended.
# Usage: nohup bash tools/claim_loop.sh [INTERVAL] [GRACE] &
cd "$(dirname "$0")/.." || exit 1
INTERVAL=${1:-600}
GRACE=${2:-300}
ART=ROUND4_ONECLAIM.json
# If this loop is torn down (session end), take the in-flight attempt with
# it: an orphaned attempt blocked in PJRT creation would otherwise grab the
# chip when the relay recovers and stall the driver's own bench run.
# (timeout below is the SIGKILL-proof backstop.)
pid=""
trap '[ -n "$pid" ] && kill "$pid" 2>/dev/null' EXIT TERM INT
while true; do
  start=$(date +%s)
  timeout 7500 python tools/round4_one_claim.py > /tmp/oneclaim4.log 2>&1 &
  pid=$!
  echo $pid > /tmp/oneclaim4.pid
  echo "$(date +%H:%M:%S) launched one-claim pid $pid" >> /tmp/relay_status
  ok=0
  while [ $(( $(date +%s) - start )) -lt "$GRACE" ]; do
    sleep 10
    if [ -f "$ART" ] && [ "$(stat -c %Y "$ART")" -ge "$start" ]; then
      ok=1; break
    fi
    kill -0 "$pid" 2>/dev/null || break  # died outright (import error etc.)
  done
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) CLAIM LIVE -- sequence running" >> /tmp/relay_status
    wait "$pid"
    echo "$(date +%H:%M:%S) one-claim exited rc=$?" >> /tmp/relay_status
    timeout 1700 python bench.py > /tmp/bench_r04_live.json 2>/tmp/bench_r04_live.log
    echo "$(date +%H:%M:%S) bench exited rc=$? (/tmp/bench_r04_live.json)" >> /tmp/relay_status
    exit 0
  fi
  kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null
  echo "$(date +%H:%M:%S) wedged (no artifact in ${GRACE}s)" >> /tmp/relay_status
  sleep "$INTERVAL"
done
