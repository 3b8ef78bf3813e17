"""Pixel-preprocessing parity kernels (reference P3/P4), pixel-free.

The reference's global-view preprocessing is::

    global_view = ImageOps.pad(image, (base, base),
                               color=tuple(int(x*255) for x in mean))
    tensor = Normalize(mean, std)(ToTensor()(global_view))

(``DeepSeek-OCR2-vllm/process/image_process.py:99-102,409-411``, with
``mean = std = (0.5, 0.5, 0.5)``).  The *resample* itself sits behind
the decode boundary (no codec in this container), but everything else —
the contain/letterbox geometry with PIL's exact rounding, the canvas
fill color, the paste offsets, and the ToTensor+Normalize arithmetic —
is pure integer/float math, reimplemented here in numpy so
preprocessing has the same parity evidence as postprocessing.

Parity subtleties pinned by tests:

* PIL ``ImageOps.contain`` rounds the scaled edge with banker-free
  ``round()`` (Python round-half-even) and only replaces the edge that
  changes, comparing ``im_ratio != dest_ratio`` on exact floats.
* ``ImageOps.pad`` pastes at ``round((size - new) * centering)`` on the
  single axis that needs padding.
* The pad color is ``int(0.5*255) = 127`` per channel, which after
  ToTensor+Normalize is ``(127/255 - .5)/.5 = -1/255`` — NOT exactly
  zero.  Anyone re-deriving attention masks from "pad == 0" would be
  silently wrong; the constant is exported as ``PAD_VALUE_NORMALIZED``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MEAN = (0.5, 0.5, 0.5)
STD = (0.5, 0.5, 0.5)
# ImageOps.pad color in the reference: tuple(int(x * 255) for x in mean)
PAD_COLOR: Tuple[int, int, int] = tuple(int(x * 255) for x in MEAN)
# the normalized value every padded pixel takes: (127/255 - .5) / .5
PAD_VALUE_NORMALIZED: float = (PAD_COLOR[0] / 255.0 - MEAN[0]) / STD[0]


def contain_size(
    width: int, height: int, box_w: int, box_h: int
) -> Tuple[int, int]:
    """Exact ``PIL.ImageOps.contain`` output size: scale to fit inside
    (box_w, box_h) preserving aspect, PIL's rounding included."""
    if width <= 0 or height <= 0:
        raise ValueError("image dims must be positive")
    im_ratio = width / height
    dest_ratio = box_w / box_h
    if im_ratio != dest_ratio:
        if im_ratio > dest_ratio:
            new_height = round(height / width * box_w)
            if new_height != box_h:
                return box_w, new_height
        else:
            new_width = round(width / height * box_h)
            if new_width != box_w:
                return new_width, box_h
    return box_w, box_h


def pad_offsets(
    new_w: int,
    new_h: int,
    box_w: int,
    box_h: int,
    centering: Tuple[float, float] = (0.5, 0.5),
) -> Tuple[int, int]:
    """Exact ``PIL.ImageOps.pad`` paste position for the contained image.

    PIL pads only the axis that needs it: x-offset when width differs,
    else y-offset (both zero when the contained size fills the box).
    """
    cx = max(0.0, min(centering[0], 1.0))
    cy = max(0.0, min(centering[1], 1.0))
    if new_w != box_w:
        return round((box_w - new_w) * cx), 0
    if new_h != box_h:
        return 0, round((box_h - new_h) * cy)
    return 0, 0


def letterbox_geometry(
    width: int, height: int, base: int
) -> dict:
    """The full global-view pad plan for one page: resize target +
    paste offsets + fill color — everything the decode-side resampler
    needs, with PIL-identical arithmetic."""
    new_w, new_h = contain_size(width, height, base, base)
    off_x, off_y = pad_offsets(new_w, new_h, base, base)
    return {
        "resize_w": new_w,
        "resize_h": new_h,
        "offset_x": off_x,
        "offset_y": off_y,
        "canvas": base,
        "pad_color": PAD_COLOR,
    }


def letterbox_pad(
    resized: np.ndarray, box_w: int, box_h: int,
    color: Tuple[int, int, int] = PAD_COLOR,
) -> np.ndarray:
    """Paste an already-resized HWC uint8 array onto the pad canvas —
    the numpy version of ``ImageOps.pad``'s new-canvas + paste step."""
    if resized.ndim != 3:
        raise ValueError("expected HWC array")
    h, w, c = resized.shape
    if w > box_w or h > box_h:
        raise ValueError("resized image exceeds the canvas")
    canvas = np.empty((box_h, box_w, c), dtype=resized.dtype)
    canvas[:, :, :] = np.asarray(color[:c], dtype=resized.dtype)
    off_x, off_y = pad_offsets(w, h, box_w, box_h)
    canvas[off_y:off_y + h, off_x:off_x + w, :] = resized
    return canvas


def to_tensor(arr: np.ndarray) -> np.ndarray:
    """``torchvision.transforms.ToTensor`` semantics: HWC uint8 ->
    CHW float32 in [0, 1] by /255."""
    if arr.dtype != np.uint8:
        raise ValueError("ToTensor parity path expects uint8 input")
    if arr.ndim != 3:
        raise ValueError("expected HWC array")
    return (arr.astype(np.float32) / 255.0).transpose(2, 0, 1)


def normalize(
    chw: np.ndarray,
    mean: Tuple[float, ...] = MEAN,
    std: Tuple[float, ...] = STD,
) -> np.ndarray:
    """``torchvision.transforms.Normalize``: per-channel (x - mean)/std,
    computed in float32 like torchvision."""
    m = np.asarray(mean, dtype=np.float32).reshape(-1, 1, 1)
    s = np.asarray(std, dtype=np.float32).reshape(-1, 1, 1)
    return (chw - m) / s


def tile_boxes(
    wtiles: int, htiles: int, image_size: int
) -> list:
    """The crop boxes ``dynamic_preprocess`` cuts from the resized
    image (``image_process.py:69-79``): row-major over a
    (image_size*wtiles, image_size*htiles) canvas, box i at column
    ``i % wtiles``, row ``i // wtiles`` — each (x0, y0, x1, y1)."""
    boxes = []
    for i in range(wtiles * htiles):
        x0 = (i % wtiles) * image_size
        y0 = (i // wtiles) * image_size
        boxes.append((x0, y0, x0 + image_size, y0 + image_size))
    return boxes


def tile_crops(
    resized: np.ndarray, wtiles: int, htiles: int, image_size: int
) -> list:
    """Split the resized page into local-view tiles (P1's crop loop) —
    numpy slicing over the exact reference boxes; the resize that
    precedes it stays behind the decode boundary."""
    h, w = resized.shape[:2]
    if (w, h) != (image_size * wtiles, image_size * htiles):
        raise ValueError(
            f"resized dims {(w, h)} do not match the "
            f"{wtiles}x{htiles} grid of {image_size}px tiles"
        )
    return [
        resized[y0:y1, x0:x1]
        for (x0, y0, x1, y1) in tile_boxes(wtiles, htiles, image_size)
    ]


def transform_global_view(resized: np.ndarray, base: int) -> np.ndarray:
    """resized HWC uint8 page -> normalized CHW float32 global view,
    the reference's exact ``image_transform(ImageOps.pad(...))`` minus
    the resample (which happens before this kernel, behind the decode
    boundary)."""
    return normalize(to_tensor(letterbox_pad(resized, base, base)))
