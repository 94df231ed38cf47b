from .math import l1_loss, psnr  # noqa: F401
from .schedule import get_expon_lr_func  # noqa: F401
