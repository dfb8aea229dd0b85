from websplat_tpu.models.camera import (
    PerspectiveCamera,
    PerspectiveProjection,
    build_proj,
    focal2fov,
    fov2focal,
    world2view,
)
from websplat_tpu.models.scene import Scene, SceneCamera, Split

__all__ = [
    "PerspectiveCamera",
    "PerspectiveProjection",
    "build_proj",
    "focal2fov",
    "fov2focal",
    "world2view",
    "Scene",
    "SceneCamera",
    "Split",
]
