from .lpips import lpips, lpips_available  # noqa: F401
from ..utils.math import psnr  # noqa: F401
from ..ops.ssim import ssim  # noqa: F401
