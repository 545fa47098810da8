#!/bin/bash
# Relaunch tools/tpu_worker.py until the TPU tunnel accepts a claim
# ("worker ready" appears in the log / .ready sentinel exists). The axon
# tunnel drops occasionally (remote_compile: connection refused); a worker
# started while it is down dies at backend init.
cd /root/repo
while true; do
  if [ -f tools/jobs/.stopall ]; then exit 0; fi
  pid=$(cat tools/worker.pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 30
    continue
  fi
  # only relaunch when there is pending work: an idle worker holds the
  # chip claim and would block the driver's end-of-round bench.py
  pending=0
  for j in tools/jobs/*.py; do
    [ -e "$j" ] || continue
    [ -f "${j%.py}.out" ] || { pending=1; break; }
  done
  if [ "$pending" = "0" ]; then
    sleep 30
    continue
  fi
  rm -f tools/jobs/.ready
  nohup python tools/tpu_worker.py > tools/worker.log 2>&1 &
  echo $! > tools/worker.pid
  # wait for ready or death
  for i in $(seq 1 60); do
    if [ -f tools/jobs/.ready ]; then break; fi
    pid=$(cat tools/worker.pid)
    kill -0 "$pid" 2>/dev/null || break
    sleep 10
  done
  sleep 5
done
