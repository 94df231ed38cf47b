#!/bin/bash
# One-shot perf sweep on the real chip: times bench.py (fwd+bwd+adam
# train step) across the binning/sort/kernel/ssim strategy matrix.
# Each combo is a fresh process (the knobs are read at import time).
# Usage: bash tools/perf_sweep.sh [out.jsonl]
set -u
OUT="${1:-/tmp/PERF_SWEEP.jsonl}"
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "=== $tag ($*)" >&2
  local line
  line=$(env "$@" BENCH_PARITY=0 BENCH_STEPS=20 timeout 1500 \
         python bench.py 2>/dev/null | tail -1)
  echo "{\"tag\": \"$tag\", \"env\": \"$*\", \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> $(echo "$line" | python -c 'import json,sys
try:
    d = json.load(sys.stdin); print(d["detail"]["step_ms"], "ms")
except Exception: print("FAILED")')" >&2
}

# baseline (round-1 defaults)
run r1_defaults R3DGS_SORT=2key R3DGS_EMISSION=gather R3DGS_SSIM=shift R3DGS_CHUNK=256
# one knob at a time
run sort_packed R3DGS_SORT=packed R3DGS_EMISSION=gather R3DGS_SSIM=shift R3DGS_CHUNK=256
run emission_carry R3DGS_SORT=2key R3DGS_EMISSION=carry R3DGS_SSIM=shift R3DGS_CHUNK=256
run emission_scan R3DGS_SORT=2key R3DGS_EMISSION=scan R3DGS_SSIM=shift R3DGS_CHUNK=256
run ssim_matmul R3DGS_SORT=2key R3DGS_EMISSION=gather R3DGS_SSIM=matmul R3DGS_CHUNK=256
run chunk512 R3DGS_SORT=2key R3DGS_EMISSION=gather R3DGS_SSIM=shift R3DGS_CHUNK=512
# all promising knobs together (both chunk sizes)
run combo256 R3DGS_SORT=packed R3DGS_EMISSION=carry R3DGS_SSIM=matmul R3DGS_CHUNK=256
run combo512 R3DGS_SORT=packed R3DGS_EMISSION=carry R3DGS_SSIM=matmul R3DGS_CHUNK=512
echo "sweep done -> $OUT" >&2
