"""Host-side preprocessing, bit-compatible with the reference pipeline.

Replicates (reference: deploy_utils.py:19-21, 60-98):
- ResizeShortestEdge(800, max 1333) with PIL bilinear on the BGR uint8
  image (detectron2 ResizeTransform semantics),
- BGR mean subtraction [103.53, 116.28, 123.675], std 1,
- zero-pad bottom/right to the fixed 1344x1344 deployment shape.

The resize stays on host (PIL) exactly because bit parity with the
reference .bin pipeline requires PIL's resampling, not XLA's
(SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from PIL import Image

MIN_EDGE_SIZE = 800
MAX_EDGE_SIZE = 1333
FIXED_EDGE_SIZE = 1344

PIXEL_MEAN = np.array([103.53, 116.28, 123.675], np.float32)  # BGR
PIXEL_STD = np.array([1.0, 1.0, 1.0], np.float32)


def compute_resize_shape(
    h: int, w: int, short: int = MIN_EDGE_SIZE, max_size: int = MAX_EDGE_SIZE
) -> Tuple[int, int]:
    """detectron2 ResizeShortestEdge.get_output_shape: returns (newh, neww)."""
    scale = short * 1.0 / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        scale = max_size * 1.0 / max(newh, neww)
        newh = newh * scale
        neww = neww * scale
    return int(newh + 0.5), int(neww + 0.5)


def read_image_bgr(path: str) -> np.ndarray:
    """Read an image as HWC uint8 BGR (detectron2 read_image(format='BGR'))."""
    with Image.open(path) as img:
        img = img.convert("RGB")
        arr = np.asarray(img)
    return arr[:, :, ::-1].copy()


def resize_shortest_edge(
    img: np.ndarray, short: int = MIN_EDGE_SIZE, max_size: int = MAX_EDGE_SIZE
) -> np.ndarray:
    """PIL-bilinear resize of an HWC uint8 image (ResizeTransform)."""
    h, w = img.shape[:2]
    newh, neww = compute_resize_shape(h, w, short, max_size)
    if (newh, neww) == (h, w):
        return img
    pil = Image.fromarray(img)
    pil = pil.resize((neww, newh), Image.BILINEAR)
    return np.asarray(pil)


def get_sample_inputs(path: str) -> Dict:
    """Read + resize one image (reference deploy_utils.py:60-73).
    Returns {"image": HWC float32 BGR (resized), "height", "width"}."""
    original = read_image_bgr(path)
    h, w = original.shape[:2]
    image = resize_shortest_edge(original).astype(np.float32)
    return {"image": image, "height": h, "width": w}


def single_preprocessing(
    image_hwc: np.ndarray, fixed_size: int = FIXED_EDGE_SIZE
) -> np.ndarray:
    """Normalize + zero-pad bottom/right to (fixed, fixed)
    (reference deploy_utils.py:76-98). HWC in, HWC out."""
    img = (image_hwc.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
    h, w = img.shape[:2]
    if h > fixed_size or w > fixed_size:
        raise ValueError(
            f"resized image ({h}x{w}) exceeds the padded canvas "
            f"{fixed_size}x{fixed_size}; pick a TPU.FIXED_EDGE_SIZE >= the "
            f"resize max edge (INPUT.MAX_SIZE_TEST rounded up to /32)")
    out = np.zeros((fixed_size, fixed_size, 3), np.float32)
    out[:h, :w] = img
    return out


def _s2d2(x: np.ndarray) -> np.ndarray:
    """One 2x2 space-to-depth level: 4 phases stacked channel-wise in
    (row-parity, col-parity) major order."""
    return np.concatenate(
        [x[:, 0::2, 0::2], x[:, 0::2, 1::2],
         x[:, 1::2, 0::2], x[:, 1::2, 1::2]], axis=-1)


def stem_space_to_depth(images_nhwc: np.ndarray) -> np.ndarray:
    """Host-side double space-to-depth feeding the TPU stem (free relabel).

    Produces the (B, H/4+1, W/4+1, 48) layout the s2d stem
    (models/backbones/vovnet.py:s2d_stem_forward) expects: top/left
    zero-pad by 2 (so a 2x2/VALID conv on the first s2d level equals the
    reference conv3x3/s2/pad1 on the raw image), one s2d level, even-pad,
    second s2d level. The whole stem then evaluates at stride-4 spatial
    size with >=48-channel tensors — bit-identical outputs while the
    device never touches the MXU-hostile 3-channel layout (the in-graph
    transform costs ~2-3 ms at 1344; here it is host arithmetic off the
    device clock, like the resize/normalize/pad it joins). Requires
    H % 4 == W % 4 == 0.
    """
    B, H, W, _ = images_nhwc.shape
    assert H % 4 == 0 and W % 4 == 0, (H, W)
    x = np.pad(images_nhwc, ((0, 0), (2, 0), (2, 0), (0, 0)))
    xd = _s2d2(x)  # (B, H/2+1, W/2+1, 4C)
    xd = np.pad(xd, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _s2d2(xd)  # (B, H/4+1, W/4+1, 16C)


def input_transform_for(model):
    """The host-side layout transform a model's input contract needs:
    stem_space_to_depth when CenterMask.s2d_input (TPU.S2D_STEM_INPUT),
    identity otherwise."""
    if getattr(model, "s2d_input", False):
        return stem_space_to_depth
    return lambda a: a


def preprocess_for_model(
    path: str,
    fixed_size: int = FIXED_EDGE_SIZE,
    short: int = MIN_EDGE_SIZE,
    max_size: int = MAX_EDGE_SIZE,
) -> Dict:
    """Full host pipeline for one image: returns the NHWC network input plus
    the metadata postprocessing needs."""
    original = read_image_bgr(path)
    h, w = original.shape[:2]
    image = resize_shortest_edge(original, short, max_size).astype(np.float32)
    padded = single_preprocessing(image, fixed_size)
    return {
        "input": padded[None],  # (1, F, F, 3)
        "resized_hw": image.shape[:2],
        "original_hw": (h, w),
        "short": short,
        "max_size": max_size,
    }


def postprocess_scale(h: int, w: int, short: int = MIN_EDGE_SIZE,
                      max_size: int = MAX_EDGE_SIZE) -> float:
    """Recompute the resize scale from the original size
    (reference deploy_utils.py:138-144)."""
    scale = short / min(h, w)
    new_h = int(np.floor(h * scale))
    new_w = int(np.floor(w * scale))
    if max(new_h, new_w) > max_size:
        scale = max_size / max(new_h, new_w) * scale
    return scale
