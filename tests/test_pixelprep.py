"""Preprocessing-parity kernels (reference P3 pad / P4 normalize):
PIL-exact letterbox geometry and torchvision-exact tensor arithmetic,
pixel-codec-free."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_2_spark.functions import pixelprep as P

BASE = 1024  # the reference's global-view base size


def test_known_contain_sizes():
    # 2:1 landscape into a square: width pins, height rounds
    assert P.contain_size(1000, 500, 768, 768) == (768, 384)
    # 1:2 portrait
    assert P.contain_size(500, 1000, 768, 768) == (384, 768)
    # exact fit passes through untouched
    assert P.contain_size(768, 768, 768, 768) == (768, 768)
    assert P.contain_size(1536, 1536, 768, 768) == (768, 768)
    # PIL quirk: rounding uses python round (half-even) — 333/1000
    # scaled to 768 = 255.744 -> 256
    assert P.contain_size(1000, 333, 768, 768) == (768, 256)


def test_known_pad_offsets():
    assert P.pad_offsets(768, 384, 768, 768) == (0, 192)
    assert P.pad_offsets(384, 768, 768, 768) == (192, 0)
    assert P.pad_offsets(768, 768, 768, 768) == (0, 0)
    # odd leftover: round((768-383)*0.5) = round(192.5) = 192 (half-even)
    assert P.pad_offsets(383, 768, 768, 768) == (192, 0)


@settings(max_examples=300, deadline=None)
@given(
    w=st.integers(min_value=8, max_value=8192),
    h=st.integers(min_value=8, max_value=8192),
)
def test_contain_invariants(w, h):
    nw, nh = P.contain_size(w, h, BASE, BASE)
    assert 0 < nw <= BASE and 0 < nh <= BASE
    assert nw == BASE or nh == BASE  # one edge always pins
    # aspect preserved to within the 1-pixel rounding of the free edge
    if nw == BASE:
        assert abs(nh - h / w * BASE) <= 0.5 + 1e-9
    if nh == BASE:
        assert abs(nw - w / h * BASE) <= 0.5 + 1e-9
    # offsets center: leftover splits within 1px
    ox, oy = P.pad_offsets(nw, nh, BASE, BASE)
    assert abs((BASE - nw - ox) - ox) <= 1
    assert abs((BASE - nh - oy) - oy) <= 1


def test_pad_color_matches_reference_formula():
    # tuple(int(x*255) for x in mean) with mean 0.5 -> 127, NOT 128
    assert P.PAD_COLOR == (127, 127, 127)
    # and its normalized value is -1/255, not 0.0
    assert P.PAD_VALUE_NORMALIZED == pytest.approx(-1.0 / 255.0)
    assert P.PAD_VALUE_NORMALIZED != 0.0


def test_to_tensor_normalize_exact_values():
    arr = np.zeros((2, 3, 3), dtype=np.uint8)
    arr[0, 0] = (0, 127, 255)
    chw = P.to_tensor(arr)
    assert chw.shape == (3, 2, 3)
    assert chw.dtype == np.float32
    out = P.normalize(chw)
    assert out[0, 0, 0] == np.float32(-1.0)  # byte 0 -> -1
    # torchvision normalizes IN float32 ((x/255 - .5) / .5 sequentially);
    # the float64-then-cast value differs by one ulp — parity means the
    # float32-sequential result
    expect_127 = (
        np.float32(127) / np.float32(255) - np.float32(0.5)
    ) / np.float32(0.5)
    assert out[1, 0, 0] == expect_127
    assert out[2, 0, 0] == np.float32(1.0)  # byte 255 -> +1


def test_letterbox_pad_places_image_and_fills_pad():
    img = np.full((384, 768, 3), 200, dtype=np.uint8)
    canvas = P.letterbox_pad(img, 768, 768)
    assert canvas.shape == (768, 768, 3)
    # image block sits at y offset 192
    assert (canvas[192:576] == 200).all()
    # pad rows carry the exact PIL fill color
    assert (canvas[:192] == 127).all() and (canvas[576:] == 127).all()


def test_transform_global_view_end_to_end():
    img = np.full((384, 768, 3), 255, dtype=np.uint8)
    out = P.transform_global_view(img, 768)
    assert out.shape == (3, 768, 768)
    assert out.dtype == np.float32
    assert (out[:, 192:576, :] == 1.0).all()
    pad_rows = np.concatenate([out[:, :192, :], out[:, 576:, :]], axis=1)
    assert np.allclose(pad_rows, P.PAD_VALUE_NORMALIZED)


def test_letterbox_geometry_plan():
    g = P.letterbox_geometry(2000, 1000, 1024)
    assert (g["resize_w"], g["resize_h"]) == (1024, 512)
    assert (g["offset_x"], g["offset_y"]) == (0, 256)
    assert g["pad_color"] == (127, 127, 127)


def test_guards():
    with pytest.raises(ValueError):
        P.contain_size(0, 10, 768, 768)
    with pytest.raises(ValueError):
        P.to_tensor(np.zeros((4, 4, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        P.letterbox_pad(np.zeros((800, 800, 3), dtype=np.uint8), 768, 768)


def test_tile_boxes_row_major_reference_order():
    # 3x2 grid of 4px tiles: box i at (i%3, i//3)
    boxes = P.tile_boxes(3, 2, 4)
    assert boxes == [
        (0, 0, 4, 4), (4, 0, 8, 4), (8, 0, 12, 4),
        (0, 4, 4, 8), (4, 4, 8, 8), (8, 4, 12, 8),
    ]


def test_tile_crops_partition_exactly():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(8, 12, 3), dtype=np.uint8)  # 3x2 @4px
    tiles = P.tile_crops(img, 3, 2, 4)
    assert len(tiles) == 6
    assert all(t.shape == (4, 4, 3) for t in tiles)
    # reassembling the tiles in box order reproduces the image exactly
    rebuilt = np.zeros_like(img)
    for t, (x0, y0, x1, y1) in zip(tiles, P.tile_boxes(3, 2, 4)):
        rebuilt[y0:y1, x0:x1] = t
    assert (rebuilt == img).all()
    with pytest.raises(ValueError):
        P.tile_crops(img, 2, 2, 4)  # wrong grid for these dims
