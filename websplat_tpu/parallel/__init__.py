from websplat_tpu.parallel.multiview import (
    make_view_parallel_renderer,
    render_views,
    stack_cameras,
    view_mesh,
)

__all__ = [
    "make_view_parallel_renderer",
    "render_views",
    "stack_cameras",
    "view_mesh",
]
