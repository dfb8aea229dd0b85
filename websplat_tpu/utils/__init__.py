from websplat_tpu.utils import gmath
from websplat_tpu.utils.image import psnr, write_png

__all__ = ["gmath", "psnr", "write_png"]
