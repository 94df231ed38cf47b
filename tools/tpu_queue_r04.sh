#!/bin/bash
# Round-4 serial TPU measurement battery (VERDICT r03 #1-#7): every output
# lands IN-REPO as a committed artifact — commit-or-it-didn't-happen.
# Run AFTER the convergence proof (one TPU client at a time).
set -u
LOG=${1:-/tmp/tpu_r04}
mkdir -p "$LOG"
cd /root/repo

echo "[$(date +%T)] bisect_body (shipped defaults)" >&2
timeout 2700 python tools/bisect_body.py --steps 20 \
  > BISECT_r04.json 2> "$LOG/bisect_body.err"
echo "[$(date +%T)] bisect_body rc=$? $(tail -c 300 BISECT_r04.json)" >&2

echo "[$(date +%T)] sweep_grad" >&2
FAST=1 timeout 7200 bash tools/sweep_grad.sh SWEEP_r04.json 2> "$LOG/sweep.err"
echo "[$(date +%T)] sweep rc=$?" >&2

echo "[$(date +%T)] kbench (defaults)" >&2
timeout 2700 python tools/kbench.py > KBENCH_r04.json 2> "$LOG/kbench.err"
echo "[$(date +%T)] kbench rc=$? $(tail -c 300 KBENCH_r04.json)" >&2

echo "[$(date +%T)] profile_events" >&2
timeout 3600 python tools/profile_events.py \
  > EVENTS_r04.json 2> "$LOG/events.err"
echo "[$(date +%T)] events rc=$?" >&2

echo "[$(date +%T)] bisect_flagship" >&2
timeout 2400 python tools/bisect_flagship.py --steps 20 \
  > FLAGSHIP_r04.json 2> "$LOG/flagship.err"
echo "[$(date +%T)] flagship rc=$? $(tail -c 300 FLAGSHIP_r04.json)" >&2

echo "[$(date +%T)] bench" >&2
timeout 2400 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
echo "[$(date +%T)] bench rc=$? $(tail -c 400 "$LOG/bench.json")" >&2
echo "[$(date +%T)] QUEUE DONE" >&2
