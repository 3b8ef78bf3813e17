"""EXIF orientation correction kernels (reference S1), pixel-codec-free.

The reference has TWO divergent orientation paths:

* API server + single-image runner: ``ImageOps.exif_transpose``
  (``deepseek_ocr2_api/processors/image.py:44-47``,
  ``DeepSeek-OCR2-vllm/run_dpsk_ocr2_image.py:33``) — corrects all 8
  EXIF orientations including the mirrored ones (2, 4, 5, 7).
* Batch eval runner: a manual handler
  (``DeepSeek-OCR2-vllm/run_dpsk_ocr2_eval_batch.py:24-47``) that only
  rotates for orientations 3, 6, 8 — mirrored images pass through
  UNCORRECTED.  For right-angle rotations ``Image.rotate(a, expand)``
  equals the corresponding transpose op, so on {1, 3, 6, 8} the two
  paths agree exactly; they diverge only on {2, 4, 5, 7}.

Both are reimplemented here as pure numpy array ops (orientation
transforms are index permutations — no codec needed), so the Spark
decode path can choose either contract explicitly and the divergence
is pinned by tests instead of lore.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# exif_transpose's orientation -> transpose-op table (PIL ImageOps).
# Ops here are named by their PIL Image.Transpose constant.
_FULL_OPS = {
    1: None,
    2: "FLIP_LEFT_RIGHT",
    3: "ROTATE_180",
    4: "FLIP_TOP_BOTTOM",
    5: "TRANSPOSE",
    6: "ROTATE_270",
    7: "TRANSVERSE",
    8: "ROTATE_90",
}

# the eval-batch runner's reduced table: rotations only
_EVAL_BATCH_OPS = {
    1: None, 2: None, 4: None, 5: None, 7: None,
    3: "ROTATE_180",
    6: "ROTATE_270",  # image.rotate(270, expand=True)
    8: "ROTATE_90",   # image.rotate(90, expand=True)
}

# orientations whose op swaps width/height
_SWAPS_DIMS = {"TRANSPOSE", "TRANSVERSE", "ROTATE_90", "ROTATE_270"}


def orientation_op(orientation: int, mode: str = "full") -> str | None:
    """The transpose op (or None) a given EXIF orientation triggers.

    ``mode='full'`` is the exif_transpose contract; ``mode='eval_batch'``
    is the batch runner's rotation-only contract.
    """
    table = _FULL_OPS if mode == "full" else _EVAL_BATCH_OPS
    if mode not in ("full", "eval_batch"):
        raise ValueError(f"unknown mode: {mode}")
    # unknown/absent orientation values pass through, as both reference
    # paths do (exif.get(key, 1) / .get returning None)
    return table.get(orientation)


def oriented_dims(
    width: int, height: int, orientation: int, mode: str = "full"
) -> Tuple[int, int]:
    """Post-correction (width, height) — the value the tiling planner
    must use, since tile grids are chosen from corrected dims."""
    op = orientation_op(orientation, mode)
    if op in _SWAPS_DIMS:
        return height, width
    return width, height


def apply_orientation(
    arr: np.ndarray, orientation: int, mode: str = "full"
) -> np.ndarray:
    """Apply the orientation correction to an HWC array — numpy
    equivalents of PIL's transpose ops (image displayed row-0-on-top):

    ROTATE_90/270 are counterclockwise/clockwise quarter turns,
    TRANSPOSE mirrors about the main diagonal, TRANSVERSE about the
    anti-diagonal.
    """
    op = orientation_op(orientation, mode)
    if op is None:
        return arr
    if op == "FLIP_LEFT_RIGHT":
        return arr[:, ::-1]
    if op == "FLIP_TOP_BOTTOM":
        return arr[::-1]
    if op == "ROTATE_180":
        return arr[::-1, ::-1]
    if op == "ROTATE_90":  # PIL: 90 deg counterclockwise
        return np.rot90(arr, k=1)
    if op == "ROTATE_270":  # PIL: 90 deg clockwise
        return np.rot90(arr, k=3)
    if op == "TRANSPOSE":
        return arr.swapaxes(0, 1)
    if op == "TRANSVERSE":
        # anti-diagonal mirror: out[i, j] = arr[H-1-j, W-1-i]
        return arr.swapaxes(0, 1)[::-1, ::-1]
    raise AssertionError(f"unhandled op {op}")


# the inverse orientation: applying orientation o then invert restores
# the original pixels (rotations invert to the opposite rotation;
# flips/transposes are self-inverse)
_INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def inverse_orientation(orientation: int) -> int:
    return _INVERSE.get(orientation, 1)
