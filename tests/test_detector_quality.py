"""Quality gate for the shipped synthetic-GUI-trained icon detector.

The reference loads a fine-tuned icon_detect YOLOv8 (util/utils.py:71-75);
ours trains from scratch on synthetic scenes (train/train_detector.py —
TPU eval at training time: P 0.97 / R 0.98 on held-out scenes). This gate
keeps the shipped checkpoint honest: detection on NEW held-out scenes must
stay well above random-init behavior.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "omniparser_tpu", "weights", "det_synth")


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="shipped det ckpt absent")
def test_trained_detector_quality():
    from omniparser_tpu.models.yolov8 import Detector
    from omniparser_tpu.train.train_detector import evaluate_detector
    from omniparser_tpu.weights.checkpoints import load_checkpoint

    det = Detector(variant="n", num_classes=1, imgsz=640)
    like = {"det": det.init_params(__import__("jax").random.PRNGKey(0))}
    variables = load_checkpoint(os.path.abspath(CKPT), like=like)["det"]
    report = evaluate_detector(variables, n_scenes=4, seed=123321)
    # training-time TPU eval: P .97 / R .98; loose gates absorb CPU-vs-TPU
    # numerics and scene-sample variance at n=4
    assert report["recall"] >= 0.80, report
    assert report["precision"] >= 0.70, report


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="shipped det ckpt absent")
def test_pipeline_auto_loads_trained_detector():
    """detector_weights='auto' (the default) must load the shipped
    checkpoint, not random-init (mirrors default_ocr_weights)."""
    import jax

    from omniparser_tpu.config import DetectorConfig
    from omniparser_tpu.models.yolov8 import Detector, default_detector_weights
    from omniparser_tpu.weights.checkpoints import load_checkpoint

    path = default_detector_weights(DetectorConfig())
    assert path and os.path.isdir(path)
    det = Detector(variant="n", num_classes=1)
    like = {"det": det.init_params(jax.random.PRNGKey(0))}
    loaded = load_checkpoint(path, like=like)["det"]
    rand = det.init_params(jax.random.PRNGKey(0))
    l0 = np.asarray(jax.tree.leaves(loaded["params"])[0])
    r0 = np.asarray(jax.tree.leaves(rand["params"])[0])
    assert l0.shape == r0.shape and not np.allclose(l0, r0)
    # variant-mismatch configs must NOT resolve to the checkpoint
    assert default_detector_weights(DetectorConfig(variant="s")) is None
