from .preprocess import (
    FIXED_EDGE_SIZE,
    MAX_EDGE_SIZE,
    MIN_EDGE_SIZE,
    PIXEL_MEAN,
    PIXEL_STD,
    compute_resize_shape,
    get_sample_inputs,
    preprocess_for_model,
    postprocess_scale,
    read_image_bgr,
    resize_shortest_edge,
    single_preprocessing,
)
from .postprocess import (
    detector_postprocess,
    paste_masks_np,
    postprocess,
    single_wrap_outputs,
)
from . import bin_io
