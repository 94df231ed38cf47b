#!/bin/bash
# On-chip sweep of the fwd+bwd(+loss) program across the kernel/bin
# strategy knobs. Metric: bisect_body's grad(base) (the step's compute
# core), plus the K the adaptive buffer settled at (printed to stderr).
# Usage: bash tools/sweep_grad.sh [out.jsonl]
set -u
OUT="${1:-/tmp/tpu_r03/SWEEP_GRAD.jsonl}"
: > "$OUT"
cd /root/repo
run() {
  local tag="$1"; shift
  echo "=== $tag ($*)" >&2
  local line kline
  line=$(env "$@" BISECT_ONLY="grad(base)" timeout 1500 \
         python tools/bisect_body.py --steps 20 2>/tmp/sweep_err.txt | tail -1)
  kline=$(grep '^# K=' /tmp/sweep_err.txt | tail -1)
  echo "{\"tag\": \"$tag\", \"env\": \"$*\", \"k\": \"${kline:-}\", \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> ${line:-FAILED}  ${kline:-}" >&2
}
run align1_c256_ladder R3DGS_ALIGN=1 R3DGS_CHUNK=256 R3DGS_SCAN=ladder
run align0_c256_ladder R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=ladder
run align1_c512_ladder R3DGS_ALIGN=1 R3DGS_CHUNK=512 R3DGS_SCAN=ladder
run align0_c512_ladder R3DGS_ALIGN=0 R3DGS_CHUNK=512 R3DGS_SCAN=ladder
run align1_c256_mxu    R3DGS_ALIGN=1 R3DGS_CHUNK=256 R3DGS_SCAN=mxu
run align0_c256_mxu    R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu
run align1_c512_mxu    R3DGS_ALIGN=1 R3DGS_CHUNK=512 R3DGS_SCAN=mxu
run align0_c512_mxu    R3DGS_ALIGN=0 R3DGS_CHUNK=512 R3DGS_SCAN=mxu
run best_sort_packed   R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=ladder R3DGS_SORT=packed
run best_emit_carry    R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=ladder R3DGS_EMISSION=carry
echo "sweep done -> $OUT" >&2
