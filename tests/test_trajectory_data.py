"""Agent trajectory -> training batches (the reference persists trajectories
'for training data pipelines' but ships no consumer; ours closes the loop)."""

import json
import os

import numpy as np
import pytest

from omniparser_tpu.train.trajectory_data import (
    caption_examples,
    detection_examples,
    iter_steps,
    make_caption_batch,
    make_detection_batch,
)


@pytest.fixture()
def traj_dir(tmp_path, rng):
    import cv2

    d = str(tmp_path / "traj")
    os.makedirs(d)
    for step in range(2):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(d, f"step{step}_raw.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        elements = [
            {"type": "text", "bbox": [0.05, 0.05, 0.4, 0.12], "interactivity": False,
             "content": "File", "source": "box_ocr_content_ocr"},
            {"type": "icon", "bbox": [0.5, 0.5, 0.75, 0.8], "interactivity": True,
             "content": "save button", "source": "box_yolo_content_yolo"},
            {"type": "icon", "bbox": [0.9, 0.9, 0.905, 0.905], "interactivity": True,
             "content": "tiny", "source": "box_yolo_content_yolo"},  # <2px, skipped
        ]
        json.dump(elements, open(os.path.join(d, f"step{step}_elements.json"), "w"))
        with open(os.path.join(d, "trajectory.json"), "a") as f:
            f.write(json.dumps({"step": step, "action": {"Next Action": "wait"},
                                "ledger": {}, "latency_s": 0.1}) + "\n")
    return d


def test_iter_steps(traj_dir):
    steps = list(iter_steps(traj_dir))
    assert len(steps) == 2
    assert steps[0]["image"].shape == (120, 160, 3)
    assert len(steps[0]["elements"]) == 3
    assert steps[1]["action"]["Next Action"] == "wait"


def test_detection_examples_and_batch(traj_dir):
    ex = list(detection_examples([traj_dir]))
    assert len(ex) == 2  # one per step (icons present)
    img, boxes = ex[0]
    assert boxes.shape[1] == 4
    batch = make_detection_batch(ex, imgsz=64)
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["gt_mask"][0].sum() == 2  # both icons (tiny one has boxes too)
    assert 0.0 <= batch["images"].max() <= 1.0


def test_caption_examples_and_batch(traj_dir):
    from omniparser_tpu.models.tokenizer import FallbackTokenizer

    ex = list(caption_examples([traj_dir], crop_size=32))
    # 2 steps x 1 usable icon (the tiny icon is skipped)
    assert len(ex) == 2
    crop, text = ex[0]
    assert crop.shape == (32, 32, 3) and text == "save button"
    batch = make_caption_batch(ex, FallbackTokenizer(), max_len=8)
    assert batch["crops"].shape == (2, 32, 32, 3)
    assert batch["caption_ids"].shape == (2, 8)


def test_batches_feed_train_losses(traj_dir):
    """The bridge output must flow into the real training objectives."""
    import jax
    import jax.numpy as jnp

    from omniparser_tpu.models.yolov8 import Detector
    from omniparser_tpu.train.losses import detection_loss

    ex = list(detection_examples([traj_dir]))
    batch = make_detection_batch(ex, imgsz=64)
    det = Detector(variant="n", num_classes=1, imgsz=64)
    params = det.init_params(jax.random.PRNGKey(0))
    outs = det.module.apply(params, jnp.asarray(batch["images"]), train=False)
    loss = detection_loss(outs, jnp.asarray(batch["gt_boxes"]),
                          jnp.asarray(batch["gt_mask"]), 64)
    assert np.isfinite(float(loss))
