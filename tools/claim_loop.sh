#!/bin/bash
# Claim-or-retry loop for a flaky relay: launch the one-claim sequence
# DIRECTLY (no separate probe -- round 3 showed a successful probe can burn
# the only grant of a ~20-min recovery window) and judge health by artifact
# progress. If ROUND4_ONECLAIM.json is not (re)written within GRACE seconds
# the PJRT client is wedged: kill the process and retry after INTERVAL.
# On a live claim, wait for the sequence, then run bench.py (fresh claim,
# warm compile cache) so the full evidence chain lands unattended.
# Usage: nohup bash tools/claim_loop.sh [INTERVAL] [GRACE] &
# Round-5 reuse: the sequence script / artifact / post-bench are env-
# parameterized (defaults preserve the round-4 invocation):
#   CLAIM_SCRIPT=tools/round5_claim.py CLAIM_ART=ROUND5_CLAIM1.json \
#   RUN_BENCH=0 nohup bash tools/claim_loop.sh 600 300 2700 &
cd "$(dirname "$0")/.." || exit 1
INTERVAL=${1:-600}
GRACE=${2:-300}
BUDGET=${3:-5400}   # per-attempt one-claim step budget (seconds)
SCRIPT=${CLAIM_SCRIPT:-tools/round4_one_claim.py}
ART=${CLAIM_ART:-ROUND4_ONECLAIM.json}
RUN_BENCH=${RUN_BENCH:-1}
# If this loop is torn down (session end), take the in-flight attempt AND
# our own bench with it: an orphaned process blocked in PJRT creation (or a
# deadline-less bench -- it deliberately has no `timeout` wrapper, see below)
# would otherwise hold the chip when the relay recovers and stall the
# driver's own bench run. (timeout on the one-claim is the SIGKILL-proof
# backstop for $pid.)
pid=""
bench_pid=""
trap '[ -n "$pid" ] && kill "$pid" 2>/dev/null; [ -n "$bench_pid" ] && kill "$bench_pid" 2>/dev/null' EXIT
trap '[ -n "$pid" ] && kill "$pid" 2>/dev/null; [ -n "$bench_pid" ] && kill "$bench_pid" 2>/dev/null; exit 143' TERM INT

# The round driver runs `python bench.py` itself at round end. Two TPU
# processes through the relay stall EACH OTHER, so a foreign bench.py (one
# we did not start) means: kill any in-flight attempt and stand down until
# it is gone. Detection only -- never kill by pattern.
foreign_bench() {
  for b in $(pgrep -f 'python[^ ]* ([^ ]*/)?bench\.py' 2>/dev/null); do
    [ "$b" != "$$" ] && [ "$b" != "${bench_pid:-x}" ] && return 0
  done
  return 1
}

# Root cause of the round-4 outage (diagnosed 00:09 Aug 19): the loopback
# relay TERMINAL listener (127.0.0.1:8082/8083, forwarded to the real TPU
# by the harness) is absent from this container's netns -- the PJRT client
# then retries its dial at 1/s forever, which is the "wedge". A TCP
# pre-probe makes recovery reaction near-instant (30 s polls cost nothing)
# and stops burning a 5-min python launch per blind attempt. The transport
# diagnosis could be wrong, so a FULL launch still runs every FULL_EVERY
# seconds regardless of the probe.
FULL_EVERY=2700
last_full=0
probe_ok() {
  timeout 2 bash -c "</dev/tcp/127.0.0.1/8083" 2>/dev/null && return 0
  timeout 2 bash -c "</dev/tcp/127.0.0.1/8082" 2>/dev/null && return 0
  return 1
}

while true; do
  if foreign_bench; then
    [ -n "$pid" ] && { kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null; pid=""; }
    echo "$(date +%H:%M:%S) standing down (driver bench.py running)" >> /tmp/relay_status
    sleep 60
    continue
  fi
  if ! probe_ok && [ $(( $(date +%s) - last_full )) -lt "$FULL_EVERY" ]; then
    sleep 30
    continue
  fi
  probe_ok && echo "$(date +%H:%M:%S) PORT PROBE LIVE (8082/8083 accepting)" >> /tmp/relay_status
  last_full=$(date +%s)
  start=$(date +%s)
  timeout 7500 python "$SCRIPT" "$BUDGET" > /tmp/oneclaim4.log 2>&1 &
  pid=$!
  echo $pid > /tmp/oneclaim4.pid
  echo "$(date +%H:%M:%S) launched one-claim pid $pid" >> /tmp/relay_status
  ok=0
  while [ $(( $(date +%s) - start )) -lt "$GRACE" ]; do
    sleep 10
    if foreign_bench; then ok=2; break; fi
    if [ -f "$ART" ] && [ "$(stat -c %Y "$ART")" -ge "$start" ]; then
      ok=1; break
    fi
    kill -0 "$pid" 2>/dev/null || break  # died outright (import error etc.)
  done
  if [ "$ok" = "2" ]; then
    kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null; pid=""
    echo "$(date +%H:%M:%S) yielded attempt to driver bench" >> /tmp/relay_status
    continue
  fi
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) CLAIM LIVE -- sequence running" >> /tmp/relay_status
    while kill -0 "$pid" 2>/dev/null; do
      if foreign_bench; then
        # The driver's end-of-round bench outranks everything: incremental
        # artifacts are already on disk, so yield the chip immediately.
        kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null
        echo "$(date +%H:%M:%S) killed live sequence: yielding to driver bench" >> /tmp/relay_status
        exit 0
      fi
      sleep 10
    done
    wait "$pid"
    echo "$(date +%H:%M:%S) one-claim exited rc=$?" >> /tmp/relay_status
    foreign_bench && exit 0
    [ "$RUN_BENCH" = "0" ] && exit 0
    # No `timeout` wrapper here: the python process must BE $bench_pid so
    # foreign_bench can exclude it; the poll loop enforces the deadline.
    python bench.py > /tmp/bench_r04_live.json 2>/tmp/bench_r04_live.log &
    bench_pid=$!
    bstart=$(date +%s)
    while kill -0 "$bench_pid" 2>/dev/null; do
      if foreign_bench || [ $(( $(date +%s) - bstart )) -gt 1700 ]; then
        kill "$bench_pid" 2>/dev/null; sleep 2; kill -9 "$bench_pid" 2>/dev/null
        echo "$(date +%H:%M:%S) killed our bench (yield or 1700s deadline)" >> /tmp/relay_status
        exit 0
      fi
      sleep 10
    done
    wait "$bench_pid"
    echo "$(date +%H:%M:%S) bench exited rc=$? (/tmp/bench_r04_live.json)" >> /tmp/relay_status
    exit 0
  fi
  kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null
  echo "$(date +%H:%M:%S) wedged (no artifact in ${GRACE}s)" >> /tmp/relay_status
  sleep "$INTERVAL"
done
