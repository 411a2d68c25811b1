from sdn3d_tpu.render.renderer import (
    RenderType, render, render_targets, Renderer)
