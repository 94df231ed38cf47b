"""Global constants for the TPU rasterizer.

Behavioral contract mirrors the reference CUDA rasterizer configuration
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/config.h:15-17):
16x16 pixel tiles, 3 color channels. Values here are *our* choices for the
TPU implementation; the tile size is kept at 16x16 because the binning math
(rect computation, tile ranges) is defined in units of these tiles and 256
pixels maps well onto an (8, 32) or (16, 16) VPU-friendly block.
"""

BLOCK_X = 16
BLOCK_Y = 16
BLOCK_SIZE = BLOCK_X * BLOCK_Y
NUM_CHANNELS = 3

# Alpha-compositing thresholds (reference forward.cu:546-554)
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

# Near-plane cull distance (reference auxiliary.h:149)
NEAR_CULL_Z = 0.2

# EWA low-pass filter added to the 2D covariance diagonal (forward.cu:199-200)
COV2D_LOWPASS = 0.3

# Chunk of Gaussians composited per scan step inside the renderers.
# Within a chunk compositing is evaluated with an (exclusive) cumulative
# product along the chunk axis, which is exact and fully parallel.
CHUNK = 32

# Default capacity bucket granularity for the growable Gaussian store.
CAPACITY_GRANULARITY = 256

# --- binning/sort strategy knobs (measured on v5e; env-overridable) ---------
import os as _os

# "packed": single uint32 sort key (tile bits | truncated positive-float
# depth bits) — one-key sort, depth quantized to the remaining bits (order
# deviations only between depths closer than ~2^-10 relative, invisible in
# compositing and identical across this repo's render paths).
# "2key": exact (tile int32, depth f32) two-key sort.
SORT_MODE = _os.environ.get("R3DGS_SORT", "2key")

# Pallas path: pad every tile's sorted segment to a CHUNK multiple at
# emission time (bin_and_sort align_chunk) so each kernel grid step covers
# exactly one tile — removes all boundary double-work steps and the
# sentinel walk (~40% of grid steps at bench scale) for ~1.4x buffer slots.
# Default OFF: the r03 on-chip sweep measured align1 neutral-to-slower at
# bench scale (padding work ate the grid-step savings: 862,464 occupied
# slots vs 622,048, key buffer 1,075,200 vs 811,008) — see SWEEP_r04.json.
ALIGN_SEGMENTS = _os.environ.get("R3DGS_ALIGN", "0") == "1"

# "gather": per-entry fields via one fused [rows, K] row gather.
# "scan": one row scatter of per-Gaussian records at segment starts + a
# carry-forward associative scan (no big gather).
# "carry": one max-scan carries (gidx, emission offset) together — both are
# monotone at run starts — so validity needs no per-entry counts gather and
# the remaining lookups shrink to a [2, K] gather (packed tile-rect + depth).
EMISSION_MODE = _os.environ.get("R3DGS_EMISSION", "gather")
