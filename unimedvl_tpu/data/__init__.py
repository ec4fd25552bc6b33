from unimedvl_tpu.data.imaging import (
    ImageTransform,
    compute_resize_shape,
    patchify,
    position_ids_extrapolate,
    position_ids_interpolate,
    pil_img2rgb,
)

__all__ = [
    "ImageTransform",
    "compute_resize_shape",
    "patchify",
    "position_ids_extrapolate",
    "position_ids_interpolate",
    "pil_img2rgb",
]
