from websplat_tpu.render.renderer import GaussianRenderer, render_frame

__all__ = ["GaussianRenderer", "render_frame"]
