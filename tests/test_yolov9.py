"""YOLOv9 (GELAN) detector: decode/preprocess/NMS parity with the
reference wrapper (/root/reference/util/yolov9.py) + converter round-trip.

The reference's own YOLOv9 support is a thin host wrapper around an
opaque TorchScript (load at util/yolov9.py:50); its testable surface is
the preprocess (:73-87), the multi-stride anchor decode (:89-109) and the
predict postprocess (:116-136).  Oracles below restate those loops in
NumPy and pin our device path against them.
"""

import numpy as np
import pytest

from omniparser_tpu.models import yolov9 as y9
from omniparser_tpu.weights import convert_yolov9 as cvt

TINY = dict(variant="test", num_classes=3, imgsz=64, max_det=16, prefilter=64)


@pytest.fixture(scope="module")
def tiny_det():
    import jax

    det = y9.YOLOv9Detector(**TINY)
    params = det.init_params(jax.random.PRNGKey(0))
    return det, params


# --------------------------------------------------------------------- #
# decode parity: NumPy restatement of util/yolov9.py:89-109 (+ the DFL   #
# the TorchScript applies internally before emitting stride-unit dists)  #
# --------------------------------------------------------------------- #


def _oracle_decode(level_outputs):
    REG_MAX = 16
    scores_all, boxes_all = [], []
    for (box, cls), stride in zip(
        [(np.asarray(b, np.float32), np.asarray(c, np.float32))
         for b, c in level_outputs],
        y9.STRIDES,
    ):
        b, h, w, _ = box.shape
        logits = box.reshape(b, h * w, 4, REG_MAX)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        dist = (e / e.sum(-1, keepdims=True)) @ np.arange(REG_MAX, dtype=np.float32)
        grid_y, grid_x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        anchors = (np.stack([grid_x, grid_y], -1).reshape(-1, 2) + 0.5)  # :104
        lt, rb = dist[..., :2], dist[..., 2:]
        boxes = np.concatenate([anchors[None] - lt, anchors[None] + rb], -1) * stride
        scores = 1.0 / (1.0 + np.exp(-cls.reshape(b, h * w, -1)))  # :109 sigmoid
        boxes_all.append(boxes)
        scores_all.append(scores)
    return np.concatenate(boxes_all, 1), np.concatenate(scores_all, 1)


def test_decode_matches_reference_oracle(tiny_det):
    import jax
    from omniparser_tpu.models.yolov8 import decode_predictions

    det, params = tiny_det
    rng = np.random.default_rng(0)
    img = rng.random((1, 64, 64, 3), np.float32)
    outs = det.module.apply(params, jax.numpy.asarray(img), train=False)
    ours_b, ours_s = map(np.asarray, decode_predictions(outs))
    ref_b, ref_s = _oracle_decode([(np.asarray(b), np.asarray(c)) for b, c in outs])
    np.testing.assert_allclose(ours_b, ref_b, atol=2e-3)
    np.testing.assert_allclose(ours_s, ref_s, atol=1e-5)


# --------------------------------------------------------------------- #
# preprocess: exact util/yolov9.py:52-87 semantics                       #
# --------------------------------------------------------------------- #


def test_normalize_image_size():
    assert y9.normalize_image_size(640) == (640, 640)
    assert y9.normalize_image_size(100) == (128, 128)       # round UP to 32
    assert y9.normalize_image_size((96, 100)) == (128, 96)  # (h, w) -> (w, h)
    with pytest.raises(ValueError):
        y9.normalize_image_size((1, 2, 3))


def test_preprocess_semantics():
    img = np.zeros((80, 100, 3), np.uint8)
    img[:] = 200
    arr, scale, pad_left, pad_top = y9.preprocess_pil(img, 96)
    assert arr.shape == (96, 96, 3)
    assert scale == min(96 / 100, 96 / 80)       # 0.96
    rw, rh = int(100 * scale), int(80 * scale)   # int-truncated, :77-78
    assert (pad_left, pad_top) == ((96 - rw) // 2, (96 - rh) // 2)
    # 114 gray fill outside the paste region, content inside
    np.testing.assert_allclose(arr[0, 0], 114 / 255.0, atol=1e-6)
    np.testing.assert_allclose(arr[pad_top + 1, pad_left + 1], 200 / 255.0,
                               atol=1e-2)


# --------------------------------------------------------------------- #
# predict(): ultralytics-shaped result, reference postprocess            #
# --------------------------------------------------------------------- #


def test_predict_contract(tiny_det):
    det, params = tiny_det
    rng = np.random.default_rng(1)
    img = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
    (res,) = det.predict(params, img, conf=0.01, imgsz=64, iou=0.7, max_det=16)
    boxes, conf = res.boxes.xyxy, res.boxes.conf
    assert boxes.shape[1] == 4 and boxes.shape[0] == conf.shape[0] <= 16
    # clamped to the ORIGINAL image bounds (util/yolov9.py:133-134)
    assert (boxes[:, [0, 2]] >= 0).all() and (boxes[:, [0, 2]] <= 100).all()
    assert (boxes[:, [1, 3]] >= 0).all() and (boxes[:, [1, 3]] <= 80).all()
    assert (np.diff(conf) <= 1e-6).all()  # score-sorted like batched_nms
    # random init scores hover near sigmoid(0): conf=0.6 keeps nothing
    (res2,) = det.predict(params, img, conf=0.9999, imgsz=64)
    assert len(res2.boxes.conf) == 0


def test_per_class_nms_offset_keeps_overlapping_classes():
    """torchvision.ops.batched_nms semantics: identical boxes of different
    classes never suppress each other (the offset trick predict() uses)."""
    import jax.numpy as jnp
    from omniparser_tpu.ops.nms import nms_fixed_shape

    boxes = jnp.asarray([[10, 10, 50, 50], [10, 10, 50, 50]], jnp.float32)
    cls = jnp.asarray([0, 1], jnp.float32)
    offset = (cls * 200.0)[:, None]
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    valid = jnp.ones(2, bool)
    _, _, _, kept = nms_fixed_shape(boxes + offset, scores, valid, 0.5, 4)
    assert int(np.asarray(kept).sum()) == 2  # same class would keep 1
    _, _, _, kept1 = nms_fixed_shape(boxes, scores, valid, 0.5, 4)
    assert int(np.asarray(kept1).sum()) == 1


# --------------------------------------------------------------------- #
# detect_graph protocol (drops into SOMPipeline / compat)                #
# --------------------------------------------------------------------- #


def test_detect_graph_protocol(tiny_det):
    import jax.numpy as jnp

    det, params = tiny_det
    padded = jnp.zeros((64, 64, 3), jnp.uint8)
    nb, ns, nv = det.detect(params, padded, jnp.asarray([50, 60], jnp.int32),
                            jnp.float32(0.01), jnp.float32(0.7))
    assert nb.shape == (16, 4) and ns.shape == (16,) and nv.shape == (16,)
    b = np.asarray(nb)[np.asarray(nv)]
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()  # normalized xyxy


def test_compat_routes_icon_detect_v3(monkeypatch):
    from omniparser_tpu import compat

    seen = {}

    def fake_load(path, det):
        seen["path"], seen["det"] = path, det
        return det.init_params(__import__("jax").random.PRNGKey(0))

    monkeypatch.setattr(
        "omniparser_tpu.weights.convert_yolov9.load_yolov9_params", fake_load)
    det, params = compat.get_yolo_model("weights/icon_detect_v3/model.pt")
    assert type(det).__name__ == "YOLOv9Detector" and det.variant == "e"
    assert seen["path"].endswith("model.pt")
    # explicit tiny variant without a path: random init, still v9 family
    det2, _ = compat.get_yolo_model(variant="v9test")
    assert type(det2).__name__ == "YOLOv9Detector" and det2.variant == "test"


# --------------------------------------------------------------------- #
# converter round-trip on source-spelling state dicts                    #
# --------------------------------------------------------------------- #


_INV = {"cv2_csp": "cv2.0", "cv2_conv": "cv2.1",
        "cv3_csp": "cv3.0", "cv3_conv": "cv3.1"}


def _src_name(part: str) -> str:
    if part in _INV:
        return _INV[part]
    if part.startswith("m") and part[1:].isdigit():
        return f"m.{part[1:]}"
    if part.startswith(("box", "cls")):  # head: box0_1 -> cv2.0.1
        stem, j = part.rsplit("_", 1)
        branch = "cv2" if stem.startswith("box") else "cv3"
        return f"{branch}.{stem[3:]}.{j}"
    return part


def _emit(sd, prefix, pnode, snode, fuse_rep, in_rep=False):
    keys = set(pnode)
    if keys == {"conv", "bn"}:  # ConvBNAct
        w = np.transpose(np.asarray(pnode["conv"]["kernel"]), (3, 2, 0, 1))
        if fuse_rep and in_rep and prefix.endswith("cv1"):
            # deploy-fused RepConvN: conv weight+bias, BN folded away
            sd[f"{prefix}.conv.weight"] = w
            sd[f"{prefix}.conv.bias"] = np.asarray(pnode["bn"]["bias"])
            return
        sd[f"{prefix}.conv.weight"] = w
        sd[f"{prefix}.bn.weight"] = np.asarray(pnode["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(pnode["bn"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(snode["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(snode["bn"]["var"])
        sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0)
        return
    if "kernel" in keys:  # plain nn.Conv (head final 1x1s)
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(pnode["kernel"]), (3, 2, 0, 1))
        if "bias" in keys:
            sd[f"{prefix}.bias"] = np.asarray(pnode["bias"])
        return
    for k in pnode:
        _emit(sd, f"{prefix}.{_src_name(k)}", pnode[k],
              (snode or {}).get(k, {}), fuse_rep,
              in_rep=in_rep or (k.startswith("m") and k[1:].isdigit()))


def _synth_sd(tree, fuse_rep=False):
    sd = {}
    params, stats = tree["params"], tree["batch_stats"]
    order = cvt._MODULE_ORDER_DUAL if "stemA" in params else cvt._MODULE_ORDER
    for i, mod in enumerate(order):
        _emit(sd, f"model.{i}", params[mod], stats.get(mod, {}), fuse_rep)
    return sd


def _assert_trees_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_equal(a[k], b[k], f"{path}{k}/")
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=f"{path}{k}")


def test_converter_roundtrip_unfused(tiny_det):
    import jax

    det, params = tiny_det
    host = jax.tree.map(np.asarray, params)
    got = cvt.convert_yolov9_state_dict(_synth_sd(host, fuse_rep=False))
    _assert_trees_equal(host["params"], got["params"])
    _assert_trees_equal(host["batch_stats"], got["batch_stats"])


def test_converter_roundtrip_fused_repconv(tiny_det):
    """Fused RepConvN convs load as identity-BN + bias."""
    import jax

    det, params = tiny_det
    host = jax.tree.map(np.asarray, params)
    got = cvt.convert_yolov9_state_dict(_synth_sd(host, fuse_rep=True))

    def walk(exp, g, s_exp, s_got, path=""):
        for k in exp:
            if isinstance(exp[k], dict):
                walk(exp[k], g[k], s_exp.get(k, {}), s_got.get(k, {}) if
                     isinstance(s_got, dict) else {}, f"{path}{k}/")

    # spot-check one known fused site: elan2/cv2_csp/m0/cv1
    site_p = got["params"]["elan2"]["cv2_csp"]["m0"]["cv1"]
    site_s = got["batch_stats"]["elan2"]["cv2_csp"]["m0"]["cv1"]
    exp = host["params"]["elan2"]["cv2_csp"]["m0"]["cv1"]
    np.testing.assert_allclose(site_p["conv"]["kernel"], exp["conv"]["kernel"])
    np.testing.assert_allclose(site_p["bn"]["bias"], exp["bn"]["bias"])
    np.testing.assert_allclose(site_p["bn"]["scale"], 1.0)
    np.testing.assert_allclose(site_s["bn"]["mean"], 0.0)
    np.testing.assert_allclose(site_s["bn"]["var"], 1.0 - 1e-3)
    # identity check: y = 1*(x-0)/sqrt((1-eps)+eps) + bias == x + bias


def test_converter_rejects_partial(tiny_det):
    import jax

    det, params = tiny_det
    host = jax.tree.map(np.asarray, params)
    sd = _synth_sd(host)
    sd["model.3.cv1.bogus.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    with pytest.raises(ValueError, match="unmatched"):
        cvt.convert_yolov9_state_dict(sd)


def test_pipeline_accepts_v9_variant():
    """config.detector.variant='v9test' builds a GELAN pipeline end-to-end."""
    import dataclasses

    from omniparser_tpu.config import (CaptionerConfig, DetectorConfig,
                                       OcrConfig, PipelineConfig)
    from omniparser_tpu.pipeline import SOMPipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(variant="v9test", default_imgsz=64,
                                max_detections=8, prefilter_topk=64),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        detector_weights=None,
        use_local_semantics=False,
    )
    p = SOMPipeline(cfg)
    assert type(p.detector).__name__ == "YOLOv9Detector"
    img = np.full((60, 70, 3), 128, np.uint8)
    _ann, coords, elements = p.parse_image(img)
    assert isinstance(elements, list)


def test_pipeline_routes_v9_pt_weights(tiny_det, tmp_path):
    """SOMPipeline(variant='v9*', detector_weights='*.pt') must dispatch to
    the YOLOv9 converter, not the v8 one (ADVICE r3: the v8 converter
    rejects yolov9-repo spellings with a key/shape mismatch crash)."""
    import jax
    import torch

    from omniparser_tpu.config import (CaptionerConfig, DetectorConfig,
                                       OcrConfig, PipelineConfig)
    from omniparser_tpu.pipeline import SOMPipeline

    det, params = tiny_det
    host = jax.tree.map(np.asarray, params)
    sd = {k: torch.from_numpy(v.copy()) for k, v in _synth_sd(host).items()}
    pt = tmp_path / "model.pt"
    torch.save(sd, pt)

    cfg = PipelineConfig(
        detector=DetectorConfig(variant="v9test", num_classes=TINY["num_classes"],
                                default_imgsz=64, max_detections=8,
                                prefilter_topk=64),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        detector_weights=str(pt),
        use_local_semantics=False,
    )
    p = SOMPipeline(cfg)
    got = jax.tree.map(np.asarray, p.detector_params)
    _assert_trees_equal(host["params"], got["params"])


# --------------------------------------------------------------------- #
# dual (gelan-e / icon_detect_v3) deploy form                            #
# --------------------------------------------------------------------- #


def test_dual_form_forward_and_converter_roundtrip():
    """The 'e' family is the DUAL deploy form (CBLinear taps + CBFuse
    sites + second backbone, ADVICE r3: the single-chain 'e' could never
    load a genuine icon_detect_v3 checkpoint).  Tiny dual variant:
    forward produces 3-level outputs and the converter round-trips a
    source-spelling state dict (31 parametric layers) exactly."""
    import jax
    import jax.numpy as jnp

    det = y9.YOLOv9Detector(variant="dualtest", num_classes=2, imgsz=64,
                            max_det=8, prefilter=64)
    params = det.init_params(jax.random.PRNGKey(1))
    outs = det.module.apply(
        params, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert len(outs) == 3  # P3/P4/P5 DFL head levels
    host = jax.tree.map(np.asarray, params)
    assert "stemA" in host["params"] and "cb5" in host["params"]
    sd = _synth_sd(host)
    assert len({k.split(".")[1] for k in sd}) == len(cvt._MODULE_ORDER_DUAL)
    got = cvt.convert_yolov9_state_dict(sd)
    _assert_trees_equal(host["params"], got["params"])
    _assert_trees_equal(host["batch_stats"], got["batch_stats"])


def test_dual_form_converter_rejects_partial():
    import jax

    det = y9.YOLOv9Detector(variant="dualtest", num_classes=1, imgsz=64,
                            max_det=8, prefilter=64)
    host = jax.tree.map(np.asarray,
                        det.init_params(jax.random.PRNGKey(0)))
    sd = _synth_sd(host)
    sd["model.10.bogus.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unmatched"):
        cvt.convert_yolov9_state_dict(sd)
