"""EXIF orientation parity (reference S1): full exif_transpose contract
vs the eval-batch rotation-only contract, as pure numpy index math."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_2_spark.functions import exifori as E


def _img(h=5, w=7):
    rng = np.random.RandomState(42)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_orientation_op_tables_match_reference_semantics():
    # full contract: all 8 handled (exif_transpose)
    assert E.orientation_op(1) is None
    assert E.orientation_op(2) == "FLIP_LEFT_RIGHT"
    assert E.orientation_op(6) == "ROTATE_270"
    assert E.orientation_op(8) == "ROTATE_90"
    # eval-batch contract: ONLY 3/6/8 corrected — the reference
    # divergence (run_dpsk_ocr2_eval_batch.py:24-47 leaves mirrored
    # orientations untouched)
    for o in (1, 2, 4, 5, 7):
        assert E.orientation_op(o, "eval_batch") is None
    for o in (3, 6, 8):
        assert E.orientation_op(o, "eval_batch") == E.orientation_op(o)


def test_exact_pixel_mappings():
    arr = _img()
    h, w = arr.shape[:2]
    # mirrored (2): out[i, j] = arr[i, W-1-j]
    assert (E.apply_orientation(arr, 2) == arr[:, ::-1]).all()
    # 180 (3)
    assert (E.apply_orientation(arr, 3) == arr[::-1, ::-1]).all()
    # 90 CW stored (6) -> correct by 90 CCW? no: orientation 6 corrects
    # with ROTATE_270 (90 CW): top-left of output = bottom-left of input
    out6 = E.apply_orientation(arr, 6)
    assert out6.shape[:2] == (w, h)
    assert (out6[0, 0] == arr[h - 1, 0]).all()
    # orientation 8 corrects with ROTATE_90 (CCW): top-left of output =
    # top-right of input
    out8 = E.apply_orientation(arr, 8)
    assert (out8[0, 0] == arr[0, w - 1]).all()
    # transpose (5): main diagonal; transverse (7): anti-diagonal
    assert (E.apply_orientation(arr, 5) == arr.swapaxes(0, 1)).all()
    out7 = E.apply_orientation(arr, 7)
    assert (out7[0, 0] == arr[h - 1, w - 1]).all()
    assert (out7[w - 1, h - 1] == arr[0, 0]).all()


@settings(max_examples=100, deadline=None)
@given(
    o=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
)
def test_orientation_roundtrip_and_dims(o, h, w):
    rng = np.random.RandomState(o * 100 + h * 10 + w)
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = E.apply_orientation(arr, o)
    # dims match the planner's prediction
    pw, ph = E.oriented_dims(w, h, o)
    assert out.shape[:2] == (ph, pw)
    # applying the inverse orientation restores the original exactly
    back = E.apply_orientation(out, E.inverse_orientation(o))
    assert back.shape == arr.shape and (back == arr).all()


@settings(max_examples=50, deadline=None)
@given(o=st.integers(min_value=1, max_value=8))
def test_eval_batch_divergence_is_exactly_the_mirrored_set(o):
    arr = _img()
    full = E.apply_orientation(arr, o, "full")
    evalb = E.apply_orientation(arr, o, "eval_batch")
    if o in (1, 3, 6, 8):
        assert full.shape == evalb.shape and (full == evalb).all()
    else:
        # eval-batch leaves mirrored images uncorrected
        assert (evalb == arr).all()


def test_unknown_orientation_passes_through():
    arr = _img()
    assert (E.apply_orientation(arr, 0) == arr).all()
    assert (E.apply_orientation(arr, 99) == arr).all()
    assert E.oriented_dims(7, 5, 99) == (7, 5)


def test_mode_validation():
    with pytest.raises(ValueError):
        E.orientation_op(1, mode="nope")
