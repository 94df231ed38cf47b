#!/bin/bash
# On-chip sweep of the fwd+bwd(+loss) program across the kernel/bin
# strategy knobs. Metric: bisect_body's grad(base) (the step's compute
# core), plus the K the adaptive buffer settled at (printed to stderr).
#
# Output is a committed-artifact JSON (VERDICT r03 #7: measurements land
# in git, not /tmp): a {"runs": [...]} object at the repo root.
# Usage: bash tools/sweep_grad.sh [out.json]
set -u
OUT="${1:-/root/repo/SWEEP_r04.json}"
TMP="$(mktemp)"
cd /root/repo
run() {
  local tag="$1"; shift
  echo "=== $tag ($*)" >&2
  local line kline
  line=$(env "$@" BISECT_ONLY="grad(base)" timeout 1500 \
         python tools/bisect_body.py --steps 20 2>/tmp/sweep_err.txt | tail -1)
  kline=$(grep '^# K=' /tmp/sweep_err.txt | tail -1)
  if [ -z "${line:-}" ]; then
    echo "--- $tag FAILED; stderr tail:" >&2
    tail -5 /tmp/sweep_err.txt >&2
  fi
  echo "{\"tag\": \"$tag\", \"env\": \"$*\", \"k\": \"${kline:-}\", \"result\": ${line:-null}}" >> "$TMP"
  echo "$tag -> ${line:-FAILED}  ${kline:-}" >&2
}
# FAST=1 trims to the decisive configs (defaults + the new-variant A/Bs)
# when TPU wall-clock is the binding constraint.
run align0_c256_mxu    R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu
run align0_c256_ladder R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=ladder
if [ "${FAST:-0}" != "1" ]; then
run align1_c256_ladder R3DGS_ALIGN=1 R3DGS_CHUNK=256 R3DGS_SCAN=ladder
run align1_c512_ladder R3DGS_ALIGN=1 R3DGS_CHUNK=512 R3DGS_SCAN=ladder
run align0_c512_ladder R3DGS_ALIGN=0 R3DGS_CHUNK=512 R3DGS_SCAN=ladder
run align1_c256_mxu    R3DGS_ALIGN=1 R3DGS_CHUNK=256 R3DGS_SCAN=mxu
run align1_c512_mxu    R3DGS_ALIGN=1 R3DGS_CHUNK=512 R3DGS_SCAN=mxu
run align0_c512_mxu    R3DGS_ALIGN=0 R3DGS_CHUNK=512 R3DGS_SCAN=mxu
run best_sort_packed   R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_SORT=packed
run best_emit_carry    R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_EMISSION=carry
fi
# tri3 = manual bf16x3 decomposition (HIGH's arithmetic at half HIGHEST's
# passes; Mosaic can't lower Precision.HIGH natively); default = 1-pass
# bf16 (speed ceiling of the scan stage, precision NOT production-safe).
run best_tri3          R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_TRI_PRECISION=tri3
run best_tri_default   R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_TRI_PRECISION=default
run moments_tri3       R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_BWD_MOMENTS=1 R3DGS_TRI_PRECISION=tri3
# CHUNK=128 halves the tri-matmul MACs per entry (the scan is O(CHUNK) per
# pixel-entry pair) at the cost of ~1.5x more grid steps; c512 measuring
# WORSE in r03 says the scan term is real, so probe the other direction.
run align0_c128_mxu    R3DGS_ALIGN=0 R3DGS_CHUNK=128 R3DGS_SCAN=mxu
run align0_c128_ladder R3DGS_ALIGN=0 R3DGS_CHUNK=128 R3DGS_SCAN=ladder
# Backward moment-matmul reductions (R3DGS_BWD_MOMENTS): ten cross-sublane
# reduction ladders + ~8 [P,C] VPU intermediates -> two small MXU matmuls.
run best_bwd_moments   R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_BWD_MOMENTS=1
run moments_c128       R3DGS_ALIGN=0 R3DGS_CHUNK=128 R3DGS_SCAN=mxu R3DGS_BWD_MOMENTS=1
# Early-exit SMEM chain off (identical output; trades dead-step work for
# pipeline freedom) — alone and stacked with moments.
run best_no_earlyexit  R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_EARLY_EXIT=0
run moments_no_ee      R3DGS_ALIGN=0 R3DGS_CHUNK=256 R3DGS_SCAN=mxu R3DGS_BWD_MOMENTS=1 R3DGS_EARLY_EXIT=0
# Assemble a single valid-JSON artifact.
python - "$TMP" "$OUT" <<'EOF'
import json, sys, datetime
runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
doc = {"tool": "tools/sweep_grad.sh", "metric": "grad(base) ms/step",
       "runs": runs}
ok = [r for r in runs if r["result"]]
if ok:
    best = min(ok, key=lambda r: r["result"]["grad(base)"])
    doc["best"] = {"tag": best["tag"], "ms": best["result"]["grad(base)"]}
doc["failed"] = [r["tag"] for r in runs if not r["result"]]
json.dump(doc, open(sys.argv[2], "w"), indent=1)
print(json.dumps({k: doc[k] for k in doc if k != "runs"}))
EOF
rm -f "$TMP"
echo "sweep done -> $OUT" >&2
