import numpy as np
import jax.numpy as jnp
import pytest

from omniparser_tpu.ops import boxes as B
from tests.conftest import random_boxes
from tests import oracles


def test_box_conversions_roundtrip(rng):
    b = random_boxes(rng, 64)
    cxcywh = B.box_xyxy_to_cxcywh(b)
    back = B.box_cxcywh_to_xyxy(cxcywh)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)

    xywh = B.box_xyxy_to_xywh(b)
    back = B.box_xywh_to_xyxy(xywh)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)


def test_cxcywh_to_xywh_matches_composition(rng):
    b = random_boxes(rng, 16)
    cxcywh = B.box_xyxy_to_cxcywh(b)
    direct = B.box_cxcywh_to_xywh(cxcywh)
    via = B.box_xyxy_to_xywh(B.box_cxcywh_to_xyxy(cxcywh))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via), atol=1e-6)


def test_pairwise_max_overlap_ratio_matches_oracle(rng):
    a = random_boxes(rng, 20)
    b = random_boxes(rng, 15)
    got = np.asarray(B.pairwise_max_overlap_ratio(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[oracles.max_overlap_ratio(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_overlap_ratio_zero_area():
    a = np.array([[0.1, 0.1, 0.1, 0.5]], np.float32)  # zero width
    b = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    got = np.asarray(B.pairwise_max_overlap_ratio(jnp.asarray(a), jnp.asarray(b)))
    # ratios forced to 0 when either area is 0; iou is 0 too
    assert got[0, 0] == 0.0


def test_containment_ratio_matches_is_inside(rng):
    inner = random_boxes(rng, 12)
    outer = random_boxes(rng, 9)
    got = np.asarray(B.containment_ratio(jnp.asarray(inner), jnp.asarray(outer)))
    for i, bi in enumerate(inner):
        for j, bo in enumerate(outer):
            want = oracles._inter(bi, bo) / oracles._area(bi)
            assert got[i, j] == pytest.approx(want, abs=1e-6)


def test_int_box_area_truncation():
    # int() truncates toward zero: int(0.999*100)=99, so a box spanning
    # [0.001, 0.999] of a 100px image has int width 99-0=99
    box = np.array([[0.001, 0.0, 0.999, 0.5]], np.float32)
    got = np.asarray(B.int_box_area(jnp.asarray(box), 100, 100))
    x1, y1, x2, y2 = 0.001 * 100, 0.0, 0.999 * 100, 0.5 * 100
    want = (int(x2) - int(x1)) * (int(y2) - int(y1))
    assert got[0] == want


def test_int_box_area_zero_detection():
    # 1-px-tall box in normalized coords on a small image -> zero int area
    box = np.array([[0.1, 0.5, 0.9, 0.504]], np.float32)
    assert np.asarray(B.int_box_area(jnp.asarray(box), 200, 200))[0] == 0
