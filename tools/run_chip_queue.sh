#!/bin/bash
# Serial on-chip benchmark queue for the round-2 streaming levers.
#
# Runs each pending A/B protocol (docs/PERFORMANCE.md "pending real-chip
# measurement") strictly one at a time — the axon tunnel time-slices the
# single chip between processes and concurrent jobs corrupt ALL timings.
# Probes the tunnel before each stage and stops early if it is down, so
# a partial window still yields partial results.
#
# Usage:  nohup bash tools/run_chip_queue.sh > /tmp/chipqueue/driver.log 2>&1 &
# Results land in /tmp/chipqueue/<stage>.log

set -u
OUT=/tmp/chipqueue
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
export DBBENCH_CACHE=/tmp/dbcache
export STREAMBENCH_CACHE=/tmp/sbcache

probe() {
  timeout 150 python -c "import jax; print('DEVOK', jax.devices())" 2>/dev/null \
    | grep -q DEVOK
}

stage() {
  local name=$1; shift
  # Never start a stage after the deadline (the round driver runs its
  # own bench on the chip at round end; contention corrupts BOTH).
  if [ -n "${QUEUE_DEADLINE_EPOCH:-}" ] && \
     [ "$(date +%s)" -ge "$QUEUE_DEADLINE_EPOCH" ]; then
    echo "$(date +%H:%M:%S) deadline passed — stopping queue"
    exit 0
  fi
  if [ -e "$OUT/$name.log" ] && grep -q "STAGE_DONE" "$OUT/$name.log"; then
    echo "$(date +%H:%M:%S) skip $name (done)"; return 0
  fi
  if ! probe; then
    echo "$(date +%H:%M:%S) tunnel DOWN before $name — stopping queue"
    exit 1
  fi
  echo "$(date +%H:%M:%S) start $name: $*"
  # Cap each stage so a dead tunnel mid-stage cannot hang the queue.
  timeout 5400 "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then echo "STAGE_DONE" >> "$OUT/$name.log"; fi
  echo "$(date +%H:%M:%S) end $name rc=$rc"
}

cd /root/repo
# Ordered fastest/highest-value first so a partial window still covers
# the headline stages; `mixed` is the longest and mostly duplicated by
# small+partial, so it runs last.
stage small   env BENCH_REPS=2 python tools/streampackbench.py small
stage ladder  env BENCH_REPS=2 python tools/streampackbench.py ladder
# Resident-mode headline refresh (unaffected by the streaming levers;
# confirms no regression from the round-2 engine work).
stage peak    python bench.py
stage partial env BENCH_REPS=2 python tools/streampackbench.py partial
# Full reference-protocol sweep: the batch tail-group fix (column
# passes skip empty slots) should lift the 768-2048 col configs.
stage setdb   env BENCH_REPS=2 python tools/setdbbench.py      
#tage mixed   env BENCH_REPS=2 python tools/streampackbench.py mixed
echo "$(date +%H:%M:%S) QUEUE_COMPLETE"
