"""Prefilter-window parity with the reference's unbounded NMS.

The reference feeds EVERY above-threshold candidate into NMS
(util/utils.py:378-399 -> ultralytics, no prefilter cap); our jitted graph
needs a static top-k window between the confidence filter and NMS.  These
tests pin, on the shipped trained checkpoint over the reference
screenshots (the bench configuration), that

  1. the default window (DetectorConfig.prefilter_topk=4096) never
     overflows — zero above-threshold candidates are dropped, and
  2. the device keep-set is identical to an unbounded numpy greedy-NMS
     oracle run on the exact same decoded tensors.

VERDICT r2 #2: BENCH_r02 ran with a 1024 window and warned about 1005
dropped candidates on these images.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniparser_tpu.config import DetectorConfig
from omniparser_tpu.models.yolov8 import Detector, default_detector_weights
from omniparser_tpu.ops.preprocess import pad_to_bucket, pick_bucket_2d
from omniparser_tpu.utils.image import load_image_rgb
from tests import oracles

IMAGES = ["demo_image.jpg", "google_page.png", "windows.png", "mobile.png",
          "ios.png", "word.png", "excel.png", "onenote.png"]
CONF, NMS_IOU = 0.05, 0.1  # server defaults (BOX_TRESHOLD / predict_yolo iou)


@pytest.fixture(scope="module")
def trained_det():
    cfg = DetectorConfig(default_imgsz=640)
    ckpt = default_detector_weights(cfg)
    if ckpt is None:
        pytest.skip("shipped trained detector checkpoint unavailable")
    det = Detector(variant="n", num_classes=1, imgsz=640,
                   max_det=cfg.max_detections, prefilter=cfg.prefilter_topk)
    from omniparser_tpu.weights.checkpoints import load_checkpoint

    like = {"det": jax.tree.map(np.asarray,
                                det.init_params(jax.random.PRNGKey(0)))}
    params = jax.device_put(load_checkpoint(ckpt, like=like)["det"])
    fn = jax.jit(
        lambda v, p, hw: det.detect_graph(v, p, hw, CONF, NMS_IOU,
                                          with_stats=True, with_raw=True)
    )
    return det, params, fn


@pytest.mark.parametrize("name", IMAGES)
def test_no_overflow_and_unbounded_nms_parity(trained_det, name):
    path = f"/root/reference/imgs/{name}"
    if not os.path.exists(path):
        pytest.skip("reference image unavailable")
    det, params, fn = trained_det
    img = load_image_rgb(path)
    hb, wb = pick_bucket_2d(*img.shape[:2])
    padded, (h, w) = pad_to_bucket(img, hb, wb)
    boxes, scores, valid, overflow, (raw_boxes, raw_scores) = fn(
        params, jnp.asarray(padded), jnp.asarray([h, w], jnp.int32)
    )
    assert int(overflow) == 0, (
        f"{name}: {int(overflow)} above-threshold candidates dropped — "
        "raise DetectorConfig.prefilter_topk"
    )

    # unbounded oracle on the same decoded tensors
    raw_boxes = np.asarray(raw_boxes)
    raw_scores = np.asarray(raw_scores)
    cand = np.nonzero(raw_scores > CONF)[0]
    keep = oracles.greedy_nms(raw_boxes[cand], raw_scores[cand], NMS_IOU)
    want_boxes = raw_boxes[cand][keep][: det.max_det]
    got_boxes = np.asarray(boxes)[np.asarray(valid)]
    assert got_boxes.shape == want_boxes.shape, (
        f"{name}: keep-set size {got_boxes.shape[0]} vs oracle {want_boxes.shape[0]}"
    )
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-6)
