from sdn3d_tpu.ops.rasterize import (
    rasterize_face_maps,
    rasterize_silhouettes,
    rasterize_depth,
    rasterize_face_colors,
)
