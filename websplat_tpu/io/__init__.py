from websplat_tpu.io.loader import GaussianCloud, load_gaussian_cloud

__all__ = ["GaussianCloud", "load_gaussian_cloud"]
