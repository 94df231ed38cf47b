#!/bin/bash
# Run the convergence proof with a progress watchdog: the remote TPU tunnel
# can hang a client mid-run (observed twice at event boundaries). The proof
# checkpoints at every eval, so kill+relaunch RESUMES rather than restarts.
# A run with no .partial mtime progress for STALL_S seconds is killed and
# relaunched, up to MAX_TRIES attempts.
set -u
PRESET=${1:-full}
LOG=${2:-/tmp/tpu_r05/convergence_wd.log}
STALL_S=${STALL_S:-1500}
MAX_TRIES=${MAX_TRIES:-4}
# Each preset gets its own artifact so a stretch-scale run can't clobber
# the flagship proof.
OUT=${OUT:-/root/repo/CONVERGENCE_r05.json}
cd /root/repo

for try in $(seq 1 "$MAX_TRIES"); do
  echo "[watchdog] attempt $try" >> "$LOG"
  setsid python tools/convergence_proof.py --preset "$PRESET" \
      --out "$OUT" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    # Progress signal = the run log's mtime (eval rows + setup prints).
    # Long legit silences are compile storms (~10-17 min observed);
    # STALL_S must exceed them. The real hang is permanent either way.
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "[watchdog] stalled $((now - mt))s; killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if [ -f "$OUT" ] && python - "$OUT" << 'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
sys.exit(0 if "reduction_vs_unpruned" in d else 1)
EOF
  then
    echo "[watchdog] done after attempt $try" >> "$LOG"
    exit 0
  fi
done
echo "[watchdog] gave up after $MAX_TRIES attempts" >> "$LOG"
exit 1
