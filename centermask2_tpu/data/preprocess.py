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

import ctypes
import os
import subprocess
import threading
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


def stem_space_to_depth(images_nhwc: np.ndarray) -> np.ndarray:
    """Host-side factor-4 space-to-depth feeding the TPU s2d stem.

    Produces the (B, H/4+1, W/4+1, 16C) natural-order layout
    (models/backbones/vovnet.py:s2d_stem_forward expects it): output
    channel rho*4C + kap*C + c at spatial (i, j) holds input pixel
    (4i + rho - 2, 4j + kap - 2), zero outside — i.e. pad 2 on every
    side, then a single reshape/transpose. The whole stem then evaluates
    at stride-4 spatial size with >=48-channel tensors, bit-identical
    outputs, while the device never touches the MXU-hostile 3-channel
    layout. One pass over the data (~9 ms at 1344 f32 on this host; the
    round-2 strided-slice double-s2d formulation cost 36-100 ms).
    Serving uses the fused C++ kernel instead (s2d_preprocess: normalize
    + pad + s2d in one pass, ~1 ms). Requires H % 4 == W % 4 == 0.
    """
    B, H, W, C = images_nhwc.shape
    assert H % 4 == 0 and W % 4 == 0, (H, W)
    P = np.pad(images_nhwc, ((0, 0), (2, 2), (2, 2), (0, 0)))
    Ho, Wo = H // 4 + 1, W // 4 + 1
    out = np.ascontiguousarray(
        P.reshape(B, Ho, 4, Wo, 4, C).transpose(0, 1, 3, 2, 4, 5))
    return out.reshape(B, Ho, Wo, 16 * C)


_S2D_SRC = os.path.join(os.path.dirname(__file__), "native", "s2d.cpp")
_S2D_SO = os.path.join(os.path.dirname(__file__), "native", "libs2d.so")
_S2D_LIB = None
_S2D_LOCK = threading.Lock()


def _build_s2d_so() -> None:
    """Compile the kernel if stale. Cross-process safe: an fcntl lock
    serializes concurrent builders (multi-host launch, pytest-xdist,
    train+eval sharing a checkout), and the compile goes to a temp file
    that is os.rename()d into place (atomic on POSIX) so no process can
    ever CDLL a partially written .so."""
    import fcntl
    import tempfile

    with open(_S2D_SRC + ".lock", "a+") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            if (os.path.exists(_S2D_SO)
                    and os.path.getmtime(_S2D_SO)
                    >= os.path.getmtime(_S2D_SRC)):
                return
            fd, tmp = tempfile.mkstemp(
                suffix=".so", dir=os.path.dirname(_S2D_SO))
            os.close(fd)
            try:
                subprocess.check_call(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", "-std=c++17", "-o", tmp, _S2D_SRC])
                os.rename(tmp, _S2D_SO)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)


def _s2d_lib():
    """Build (once) and load the fused native preprocessing kernel.
    Returns None when no compiler is available (numpy fallback)."""
    global _S2D_LIB
    with _S2D_LOCK:
        if _S2D_LIB is None:
            try:
                _build_s2d_so()
                lib = ctypes.CDLL(_S2D_SO)
                i64 = ctypes.c_int64
                f32p = np.ctypeslib.ndpointer(np.float32)
                u8p = np.ctypeslib.ndpointer(np.uint8)
                lib.s2d_preprocess_u8.restype = None
                lib.s2d_preprocess_u8.argtypes = [
                    u8p, i64, i64, i64, i64, f32p, f32p]
                lib.s2d_preprocess_f32.restype = None
                lib.s2d_preprocess_f32.argtypes = [
                    f32p, i64, i64, i64, i64, f32p, f32p]
                lib.s2d_pack_u8.restype = None
                lib.s2d_pack_u8.argtypes = [u8p, i64, i64, i64, i64, u8p]
                lib.s2d_pack_u8_rect.restype = None
                lib.s2d_pack_u8_rect.argtypes = [
                    u8p, i64, i64, i64, i64, i64, u8p]
                _S2D_LIB = lib
            except (OSError, subprocess.CalledProcessError):  # pragma: no cover
                _S2D_LIB = False
    return _S2D_LIB or None


def s2d_preprocess(image_hwc: np.ndarray,
                   fixed_size: int = FIXED_EDGE_SIZE) -> np.ndarray:
    """Fused normalize + pad-to-canvas + space-to-depth for ONE resized
    image (uint8 or float32 HWC BGR). Returns the (1, F/4+1, F/4+1, 48)
    f32 network input — bit-identical to
    stem_space_to_depth(single_preprocessing(img)[None]) but one pass
    over the data (native kernel; numpy fallback when g++ is absent).
    """
    h, w, C = image_hwc.shape
    if h > fixed_size or w > fixed_size:
        raise ValueError(
            f"resized image ({h}x{w}) exceeds the padded canvas "
            f"{fixed_size}x{fixed_size}")
    if C > 16:  # native kernel's per-phase mean buffer holds 4*C floats
        raise ValueError(f"s2d_preprocess supports C <= 16 channels, got {C}")
    assert fixed_size % 4 == 0, fixed_size
    lib = _s2d_lib()
    if lib is not None:
        Ho = fixed_size // 4 + 1
        out = np.empty((Ho, Ho, 16 * C), np.float32)
        img = np.ascontiguousarray(image_hwc)
        mean = np.ascontiguousarray(PIXEL_MEAN[:C], np.float32)
        if img.dtype == np.uint8:
            lib.s2d_preprocess_u8(img, h, w, C, fixed_size, mean, out)
        else:
            lib.s2d_preprocess_f32(img.astype(np.float32, copy=False),
                                   h, w, C, fixed_size, mean, out)
        return out[None]
    return stem_space_to_depth(
        single_preprocessing(image_hwc, fixed_size)[None])


def s2d_pack_u8(image_hwc: np.ndarray,
                fixed_size=FIXED_EDGE_SIZE) -> np.ndarray:
    """Pad + space-to-depth ONE resized uint8 image WITHOUT normalizing:
    returns the (1, Fh/4+1, Fw/4+1, 48) uint8 network input for the
    on-device normalization path (CenterMask._normalize_u8_s2d). 1/4 the
    host->device bytes of the f32 canvas — the transfer is the dominant
    per-image cost on bandwidth-limited links. ``fixed_size``: the canvas,
    an int (square) or an (Fh, Fw) pair (rectangular — see
    s2d_pack_u8_tight)."""
    h, w, C = image_hwc.shape
    # np.ndim == 0 also catches numpy scalar ints (np.isscalar does not)
    fh, fw = ((int(fixed_size),) * 2 if np.ndim(fixed_size) == 0
              else tuple(int(v) for v in fixed_size))
    if h > fh or w > fw:
        raise ValueError(
            f"resized image ({h}x{w}) exceeds the padded canvas {fh}x{fw}")
    if C > 16:  # native kernel's per-phase mean buffer holds 4*C floats
        raise ValueError(f"s2d_pack_u8 supports C <= 16 channels, got {C}")
    if fh % 4 or fw % 4:
        raise ValueError(
            f"s2d canvas must be divisible by 4, got {fh}x{fw} (check "
            "TPU.FIXED_EDGE_SIZE / TPU.SIZE_BUCKETS)")
    img = np.ascontiguousarray(image_hwc, np.uint8)
    lib = _s2d_lib()
    if lib is not None:
        out = np.empty((fh // 4 + 1, fw // 4 + 1, 16 * C), np.uint8)
        lib.s2d_pack_u8_rect(img, h, w, C, fh, fw, out)
        return out[None]
    canvas = np.zeros((fh, fw, C), np.uint8)
    canvas[:h, :w] = img
    return stem_space_to_depth(canvas[None])


def s2d_pack_u8_tight(image_hwc: np.ndarray,
                      fixed_size: int = FIXED_EDGE_SIZE,
                      multiple: int = 32) -> np.ndarray:
    """s2d_pack_u8 over the TIGHT canvas: the smallest
    (multiple-aligned) rectangle covering the resized image instead of
    the full deployment square. The device zero-pads the pack back to
    the square (CenterMask.inference canvas_hw=...) — bit-identical
    outputs, because every s2d cell outside the tight pack reads only
    canvas padding, which is zero in both formulations.

    At the reference serving shape (800x1333 resize, 1344 canvas) this
    ships 201x337 u8 cells instead of 337x337 — 1.67x fewer bytes over
    the host->device link, which is the binding constraint of this
    deployment (bench.py link_mb_per_sec). ``multiple`` quantizes the
    tight canvas to bound the number of compiled program shapes."""
    h, w, _ = image_hwc.shape
    align = lambda v: min(-(-v // multiple) * multiple, fixed_size)
    return s2d_pack_u8(image_hwc, (align(h), align(w)))


def s2d_serving_canvas(h: int, w: int,
                       fixed_size=FIXED_EDGE_SIZE,
                       short: int = MIN_EDGE_SIZE) -> Tuple[int, int]:
    """Quantized tight canvas for a resized (h, w) image: each dim is
    either align32(short) (the dim a ResizeShortestEdge(short) output
    can't exceed in its short direction) or the full ``fixed_size``.
    At most 4 distinct canvases per deployment -> at most 4 compiled
    programs, while landscape/portrait images ship ~60% of the full
    square's bytes (s2d_pack_u8_tight rationale). Aligned to 32 — the
    detectron2 size_divisibility — so the canvas is also valid for
    tight-COMPUTE serving (a non-/32 canvas breaks the FPN top-down 2x
    upsample against the ceil-divided lateral shapes; for the standard
    short=800 the alignment changes nothing).

    ``fixed_size`` may be an int (square deployment canvas) or an
    (H, W) pair — the cap each dim escalates to is per-axis, so a
    non-square deployment canvas (e.g. (800, 1344)) keeps its full
    width for landscape images instead of mis-capping at the height."""
    fh, fw = ((fixed_size, fixed_size) if isinstance(fixed_size, int)
              else (int(fixed_size[0]), int(fixed_size[1])))
    s = min(-(-short // 32) * 32, fh, fw)
    return (s if h <= s else fh, s if w <= s else fw)


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
    s2d: bool = False,
    u8: bool = False,
    tight: bool = False,
) -> Dict:
    """Full host pipeline for one image: returns the NHWC network input plus
    the metadata postprocessing needs. With ``s2d`` (the
    TPU.S2D_STEM_INPUT serving layout), normalize + pad + space-to-depth
    run as ONE fused native pass straight off the uint8 resize output and
    "input" is the (1, F/4+1, F/4+1, 48) s2d tensor — no separate
    input_transform_for step needed. ``u8`` (implies s2d) skips host
    normalization and returns the raw uint8 s2d pack — pass "valid_hw"
    to the model so it normalizes on device (4x less transfer). ``tight``
    (u8 only) packs over the quantized tight canvas (s2d_serving_canvas,
    ~1.67x fewer bytes again) — the consumer MUST then call the model
    with canvas_hw=(fixed_size, fixed_size) so the device pads it back."""
    original = read_image_bgr(path)
    h, w = original.shape[:2]
    image = resize_shortest_edge(original, short, max_size)
    if u8 and tight:
        inp = s2d_pack_u8(
            image, s2d_serving_canvas(image.shape[0], image.shape[1],
                                      fixed_size, short))
    elif u8:
        inp = s2d_pack_u8(image, fixed_size)
    elif s2d:
        inp = s2d_preprocess(image, fixed_size)
    else:
        inp = single_preprocessing(image.astype(np.float32), fixed_size)[None]
    return {
        "input": inp,
        "resized_hw": image.shape[:2],
        "original_hw": (h, w),
        "valid_hw": np.asarray([image.shape[:2]], np.int32),
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
