import numpy as np
import jax
import pytest

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.parallel.mesh import make_mesh
from omniparser_tpu.parallel.sharded import ShardedCaptioner, ShardedDetector


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(dp=4, tp=2)


@pytest.fixture(scope="module")
def small_det():
    det = Detector(variant="n", num_classes=1, imgsz=128, max_det=16)
    return det, det.init_params(jax.random.PRNGKey(0))


def test_sharded_detect_matches_single(mesh, small_det, rng):
    det, params = small_det
    sharded = ShardedDetector(det, mesh)
    images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8) for _ in range(4)]
    boxes, scores, valid = sharded.detect_images(params, images)
    assert boxes.shape == (4, 16, 4)
    # per-image single-device path must agree up to bf16 vmap-vs-single
    # fusion noise (~1e-3 on box coords; score-threshold ties can flip a
    # borderline detection's validity)
    from omniparser_tpu.ops.preprocess import pad_to_bucket
    import jax.numpy as jnp

    padded, (h, w) = pad_to_bucket(images[0], 512, 512)
    b1, s1, v1 = det.detect(params, jnp.asarray(padded), jnp.asarray([h, w]), 0.05, 0.1)
    b1, v1 = np.asarray(b1), np.asarray(v1)
    both = valid[0] & v1
    np.testing.assert_allclose(boxes[0][both], b1[both], atol=5e-3)
    assert int(np.sum(valid[0] != v1)) <= 1


def test_sharded_detect_batch_padding(mesh, small_det, rng):
    det, params = small_det
    sharded = ShardedDetector(det, mesh)
    # 5 images -> padded to 8 (dp=4 multiple)
    images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(5)]
    boxes, scores, valid = sharded.detect_images(params, images)
    assert boxes.shape[0] == 5


def test_sharded_detect_rejects_bad_batch(mesh, small_det, rng):
    det, params = small_det
    sharded = ShardedDetector(det, mesh)
    with pytest.raises(ValueError, match="multiple of dp"):
        sharded(params, np.zeros((3, 128, 128, 3), np.uint8),
                np.ones((3, 2), np.int32), 0.05, 0.1)


def test_sharded_captioner(mesh):
    from omniparser_tpu.models.florence2 import FlorenceCaptioner
    from tests.test_florence import TINY

    cap = FlorenceCaptioner(CaptionerConfig(crop_size=32, max_new_tokens=4), dims=TINY)
    sharded = ShardedCaptioner(cap, mesh)
    crops = np.random.default_rng(0).uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)
    texts = sharded.caption(crops)
    assert len(texts) == 8
    # must match the unsharded decode exactly (greedy is deterministic)
    single = cap.caption_crops(crops, np.ones(8, bool))
    assert texts == single
