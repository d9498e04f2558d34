"""Native C++ hostops vs cv2 reference — must agree exactly."""

import numpy as np
import pytest

from omniparser_tpu.utils import hostops


def _cv2_reference(prob, thr, min_area, min_score):
    import cv2

    binary = (prob > thr).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(binary, connectivity=4)
    out = []
    for i in range(1, n):
        x, y, w, h, area = stats[i]
        if area < min_area:
            continue
        score = float(prob[labels == i].mean())
        if score < min_score:
            continue
        out.append(((int(x), int(y), int(x + w), int(y + h)), score, int(area)))
    return out


@pytest.fixture(scope="module")
def native_lib():
    if not hostops.native_available():
        pytest.skip("native hostops could not be built")
    return True


def test_native_builds(native_lib):
    assert hostops.native_available()


def test_components_match_cv2_random(native_lib, rng):
    for trial in range(5):
        prob = (rng.random((64, 96)) ** 3).astype(np.float32)  # sparse blobs
        got = hostops.extract_components(prob, 0.7, 2, 0.0)
        want = _cv2_reference(prob, 0.7, 2, 0.0)
        got_set = {(b, a) for b, s, a in got}
        want_set = {(b, a) for b, s, a in want}
        assert got_set == want_set, f"trial {trial}"
        gs = {b: s for b, s, a in got}
        ws = {b: s for b, s, a in want}
        for b in gs:
            assert gs[b] == pytest.approx(ws[b], abs=1e-5)


def test_components_structured(native_lib):
    prob = np.zeros((32, 32), np.float32)
    prob[2:6, 3:20] = 0.9     # text line
    prob[10:12, 10:12] = 0.95 # small blob
    prob[20, 20] = 0.9        # single pixel (area 1)
    got = hostops.extract_components(prob, 0.5, 2, 0.3)
    boxes = sorted(b for b, s, a in got)
    assert boxes == [(3, 2, 20, 6), (10, 10, 12, 12)]


def test_u_shape_merges(native_lib):
    # U-shaped region exercises union-find (two provisional labels merge)
    prob = np.zeros((10, 10), np.float32)
    prob[0:8, 1] = 0.9
    prob[0:8, 5] = 0.9
    prob[7, 1:6] = 0.9
    got = hostops.extract_components(prob, 0.5, 1, 0.0)
    assert len(got) == 1
    (box, score, area) = got[0]
    assert box == (1, 0, 6, 8)


def test_empty_map(native_lib):
    assert hostops.extract_components(np.zeros((16, 16), np.float32), 0.5, 1, 0.0) == []


def test_threshold_boundary(native_lib):
    # strict > threshold (matches prob > thr in both paths)
    prob = np.full((4, 4), 0.5, np.float32)
    assert hostops.extract_components(prob, 0.5, 1, 0.0) == []
