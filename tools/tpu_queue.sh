#!/bin/bash
# Serial TPU job runner: retries until the axon pool grants a device, then
# runs the round-3 measurement battery one job at a time (concurrent
# clients would contend for pool grants). Logs to /tmp/tpu_r03/.
set -u
OUT=/tmp/tpu_r03
mkdir -p $OUT
cd /root/repo
while true; do
  echo "[$(date +%T)] probing for TPU grant..." >> $OUT/queue.log
  timeout 3600 python - <<'PY' >> $OUT/queue.log 2>&1
import time, jax
t0 = time.time()
d = jax.devices()
print(f"granted: {d} after {time.time()-t0:.1f}s", flush=True)
PY
  rc=$?
  echo "[$(date +%T)] probe rc=$rc" >> $OUT/queue.log
  if [ $rc -eq 0 ]; then break; fi
  sleep 120
done
echo "[$(date +%T)] bisect_body" >> $OUT/queue.log
timeout 1800 python tools/bisect_body.py --steps 20 > $OUT/bisect_body.json 2> $OUT/bisect_body.err
echo "[$(date +%T)] bisect_body rc=$?" >> $OUT/queue.log
echo "[$(date +%T)] bench" >> $OUT/queue.log
timeout 2400 python bench.py > $OUT/bench.json 2> $OUT/bench.err
echo "[$(date +%T)] bench rc=$?" >> $OUT/queue.log
echo "[$(date +%T)] DONE" >> $OUT/queue.log
