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
    # Stall watchdog: a tunnel drop mid-dispatch leaves the worker ALIVE
    # but wedged forever (0% CPU, no progress — observed 08-20 06:33, the
    # dropped RPC never raised). If NOTHING the worker writes (job .out
    # files, outputs/, the compile cache) has changed in 40 min while jobs
    # are pending, kill it; this loop relaunches it on a fresh backend.
    # 40 min clears the longest observed legitimate quiet period (a 27-29
    # min cold remote-compile).
    if grep -q tpu_worker "/proc/$pid/cmdline" 2>/dev/null; then
      # tools/jobs/.alive is the worker's heartbeat (touched per poll pass
      # and at each job start) so a job's quiet compute period only counts
      # from the job's start, not from the previous job's last write.
      recent=$(find tools/jobs outputs .jax_cache -newermt "-40 minutes" \
                 -print -quit 2>/dev/null)
      pending_w=0
      for j in tools/jobs/*.py; do
        [ -e "$j" ] || continue
        [ -f "${j%.py}.out" ] || { pending_w=1; break; }
      done
      if [ -z "$recent" ] && [ "$pending_w" = "1" ]; then
        echo "$(date -u +%H:%M:%S) watchdog: worker $pid stalled >40min, killing" >> tools/keepalive.log
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        # a SIGKILL mid-cache-write leaves a CORRUPT .jax_cache entry that
        # SIGABRTs every later reader (CLAUDE.md hazard). Scrub anything the
        # dead worker may have been writing. Window is generous: corrupt
        # entries only come from in-flight writes, and re-compiling a few
        # evicted entries is cheap next to a crash-loop.
        find .jax_cache -type f -newermt "-45 minutes" -delete 2>/dev/null
        echo "$(date -u +%H:%M:%S) watchdog: scrubbed recent .jax_cache entries" >> tools/keepalive.log
      fi
    fi
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
