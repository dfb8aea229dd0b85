from websplat_tpu.ops.preprocess import CameraParams, DeviceCloud, DeviceSettings, preprocess
from websplat_tpu.ops.sort import sort_instances, tile_ranges

__all__ = [
    "CameraParams",
    "DeviceCloud",
    "DeviceSettings",
    "preprocess",
    "sort_instances",
    "tile_ranges",
]
