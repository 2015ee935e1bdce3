#!/bin/bash
# Babysit a long ladder-5 TPU run on the hang-prone tunnel: launch
# quality_eval.py highdim, watch the checkpoint mtime, and kill+resume
# (exact resume via infer(resume_from=)) when no checkpoint lands for
# STALL_S seconds. Known failure mode: the tunnel RPC wedges after a
# checkpoint flush (BASELINE.md round-5: 8k run hung at step 6000; slow
# run hung after step 5000) — the host process blocks forever at ~0% CPU.
# Usage: babysit_highdim.sh NAME RESULT_JSON CKPT MAX_RESUMES "ARGS..."
set -u
NAME="$1"; RESULT="$2"; CKPT="$3"; MAX_RESUMES="$4"; shift 4
ARGS=("$@")
cd /root/repo/benchmarks

STALL_S=2400           # compile ~20min + first ckpt ~10min after resume
POLL_S=120

# Persistent compilation cache: every resume otherwise pays the full ~20 min
# remote compile of the big IW-8/accum-4 program on this tunnel.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-10}"

for attempt in $(seq 0 "$MAX_RESUMES"); do
  if [ -f "$RESULT" ]; then echo "[babysit] $RESULT exists; done"; exit 0; fi
  CMD=(python quality_eval.py highdim "${ARGS[@]}" --ckpt-every 2500 --name "$NAME")
  if [ -f "$CKPT" ]; then CMD+=(--resume "$CKPT"); fi
  echo "[babysit] attempt $attempt: ${CMD[*]}"
  "${CMD[@]}" >> "/tmp/${NAME}_babysit.log" 2>&1 &
  PID=$!
  echo "$PID" > "/tmp/${NAME}_babysit.pid"
  LAST_PROGRESS=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep "$POLL_S"
    if [ -f "$CKPT" ]; then
      M=$(stat -c %Y "$CKPT")
      [ "$M" -gt "$LAST_PROGRESS" ] && LAST_PROGRESS=$M
    fi
    NOW=$(date +%s)
    if [ $((NOW - LAST_PROGRESS)) -gt "$STALL_S" ]; then
      echo "[babysit] stall: no checkpoint for $((NOW - LAST_PROGRESS))s; killing $PID"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null; sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if [ -f "$RESULT" ]; then echo "[babysit] completed on attempt $attempt"; exit 0; fi
  echo "[babysit] attempt $attempt ended without result; resuming"
done
echo "[babysit] exhausted $MAX_RESUMES resumes without completing"
exit 1
