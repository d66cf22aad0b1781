#!/bin/bash
# Round-2 chip benchmark battery: run after the chip is free.
# Produces logs/bench_battery_r2.log with one labeled JSON line per config.
cd "$(dirname "$0")/.."
LOG=logs/bench_battery_r2.log
: > "$LOG"
run() {
  echo "=== $1 ===" >> "$LOG"
  shift
  env "$@" timeout 2400 python bench.py >> "$LOG" 2>&1
  echo >> "$LOG"
}
run "host-env flagship (shared-patch-stream) + live naive A/B" BENCH_UPDATES=3
run "host-env exact dual-token semantics" BENCH_FAST=1 BENCH_SHARED=0 BENCH_UPDATES=3
run "host-env exact no-overlap (double-buffer ablation)" BENCH_FAST=1 BENCH_SHARED=0 BENCH_NO_OVERLAP=1 BENCH_UPDATES=3
run "zero-host device env exact" BENCH_FAST=1 BENCH_SHARED=0 BENCH_DEVICE_ENV=1 BENCH_UPDATES=3
run "zero-host device env shared (flagship)" BENCH_FAST=1 BENCH_DEVICE_ENV=1 BENCH_UPDATES=3
echo BATTERY_DONE >> "$LOG"
