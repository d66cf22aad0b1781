#!/bin/bash
# Opportunistic on-chip job runner. The tunneled TPU is held by other
# processes for long stretches (see docs / round-3 postmortem): probe with a
# hard timeout, and when the chip answers, drain the job queue in
# chip_jobs/*.sh (lexicographic order), one at a time. Each job's stdout and
# stderr go to logs/chip_queue_r4.log; completed jobs are renamed *.sh.done
# (failed ones *.sh.failed but the queue keeps draining).
#
# Start:  nohup bash scripts/chip_watch.sh > /dev/null 2>&1 &  (pid -> /tmp/chip_watch.pid)
# Pause:  touch chip_jobs/PAUSE    Resume: rm chip_jobs/PAUSE
# Stop:   kill $(cat /tmp/chip_watch.pid)
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/chip_watch.pid
LOG=logs/chip_queue_r4.log
STATUS=logs/chip_watch_status
mkdir -p chip_jobs logs
echo "=== chip watch started $(date -u)" >> "$LOG"

while true; do
  jobs=$(ls chip_jobs/*.sh 2>/dev/null | sort)
  if [ -z "$jobs" ] || [ -e chip_jobs/PAUSE ]; then
    echo "idle ($(date -u)): no runnable jobs$( [ -e chip_jobs/PAUSE ] && echo ' [PAUSED]')" > "$STATUS"
    sleep 120
    continue
  fi
  if timeout 180 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    for j in $jobs; do
      [ -e chip_jobs/PAUSE ] && break
      [ -f "$j" ] || continue
      echo "running $j since $(date -u)" > "$STATUS"
      echo "=== job $j start $(date -u)" >> "$LOG"
      if bash "$j" >> "$LOG" 2>&1; then
        mv "$j" "$j.done"
        echo "=== job $j DONE $(date -u)" >> "$LOG"
      else
        mv "$j" "$j.failed"
        echo "=== job $j FAILED $(date -u)" >> "$LOG"
      fi
    done
  else
    echo "chip held ($(date -u)); $(echo "$jobs" | wc -l) job(s) queued" > "$STATUS"
    sleep 240
  fi
done
