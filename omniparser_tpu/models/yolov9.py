"""YOLOv9-class (GELAN) icon detector, TPU-first.

OmniParser v2.0's DEFAULT detector is a YOLOv9-E TorchScript
(`icon_detect_v3/model.pt`) driven by the reference's own thin wrapper
(/root/reference/util/yolov9.py:27-136) — `get_yolo_model` routes any
`icon_detect_v3` path to it (/root/reference/util/utils.py:72-81).  The
reference never instantiates the architecture: it loads an opaque
`torch.jit` graph and implements preprocess + multi-stride decode +
per-class NMS around it.

This module provides both halves, TPU-native:

  * a from-scratch Flax GELAN (the YOLOv9 deploy-form backbone family:
    RepNCSPELAN4 / ADown / SPPELAN, plus CBLinear/CBFuse for the dual
    'e' form — the actual icon_detect_v3 topology; the reversible PGI
    auxiliary branch exists only at training time and is absent from
    deployed graphs), in NHWC / bf16-compute like models/yolov8.py,
    reusing its DFL detect head; and
  * `YOLOv9Detector` — the same jitted fixed-shape detect protocol as
    `yolov8.Detector` (slots into SOMPipeline / compat unchanged), plus
    `predict()` matching the reference wrapper's exact semantics
    (util/yolov9.py:73-136): PIL-LANCZOS centered 114-pad letterbox with
    32-multiple rounding, `(grid + 0.5) * stride` anchor decode,
    conf-filter -> unpad -> per-class NMS -> `[:max_det]` -> clamp,
    ultralytics-compatible `Result(Boxes)` return.

The decode math is identical between the two paths and is pinned against
a NumPy restatement of the reference loop in tests/test_yolov9.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.models.yolov8 import ConvBNAct, DetectHead, decode_predictions
from omniparser_tpu.ops.nms import nms_fixed_shape
from omniparser_tpu.ops.preprocess import boxes_letterboxed_to_image, letterbox

STRIDES = (8, 16, 32)  # reference util/yolov9.py:30

# GELAN stage specs: per backbone stage (out, elan_mid, rep_mid), the
# SPPELAN (out, mid), per neck block (out, elan_mid, rep_mid), and ELAN
# depth.  'c' follows the published gelan-c layout.  'e' (the real
# icon_detect_v3 architecture) is the DUAL-branch deploy form: a first
# backbone feeds multi-scale CBLinear taps that CBFuse sums into a second
# backbone (the published gelan-e layout: dual stem/downsample stacks,
# RepNCSPELAN4 depth 2, last neck block widened to mid 1024).
VARIANTS = {
    "c": dict(
        form="single",
        stages=((256, 128, 64), (512, 256, 128), (512, 512, 256), (512, 512, 256)),
        sppelan=(512, 256),
        neck=((512, 512, 256), (256, 256, 128), (512, 512, 256), (512, 512, 256)),
        depth=1,
        stem=(64, 128),
    ),
    "e": dict(
        form="dual",
        stages=((256, 128, 64), (512, 256, 128), (1024, 512, 256), (1024, 512, 256)),
        sppelan=(512, 256),
        neck=((512, 512, 256), (256, 256, 128), (512, 512, 256), (512, 1024, 512)),
        depth=2,
        stem=(64, 128),
    ),
    # tiny dims for tests (fast compile, same graph structures)
    "test": dict(
        form="single",
        stages=((16, 8, 4), (32, 16, 8), (32, 32, 16), (32, 32, 16)),
        sppelan=(32, 16),
        neck=((32, 32, 16), (16, 16, 8), (32, 32, 16), (32, 32, 16)),
        depth=1,
        stem=(8, 16),
    ),
    "dualtest": dict(
        form="dual",
        stages=((16, 8, 4), (32, 16, 8), (32, 32, 16), (32, 32, 16)),
        sppelan=(32, 16),
        neck=((32, 32, 16), (16, 16, 8), (32, 32, 16), (32, 32, 16)),
        depth=1,
        stem=(8, 16),
    ),
}


class RepNBottleneck(nn.Module):
    """Deploy-form RepConvN (a plain 3x3 conv at inference) + 3x3 conv."""

    features: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.features, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class RepNCSP(nn.Module):
    """CSP over n RepNBottlenecks (YOLOv9 RepNCSP, e=0.5)."""

    features: int
    n: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y1 = ConvBNAct(c, 1, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBNAct(c, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            y1 = RepNBottleneck(c, True, dtype=self.dtype, name=f"m{i}")(y1, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class RepNCSPELAN4(nn.Module):
    """GELAN block: split + two chained (RepNCSP -> 3x3 conv) branches,
    concat all four, 1x1 out."""

    features: int       # c2: block output
    mid: int            # c3: cv1 output (split in two)
    rep_mid: int        # c4: per-branch width
    n: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.mid // 2
        y = ConvBNAct(self.mid, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for b in (2, 3):
            t = RepNCSP(self.rep_mid, self.n, dtype=self.dtype,
                        name=f"cv{b}_csp")(parts[-1], train)
            parts.append(
                ConvBNAct(self.rep_mid, 3, dtype=self.dtype, name=f"cv{b}_conv")(t, train)
            )
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate(parts, axis=-1), train
        )


class ADown(nn.Module):
    """YOLOv9 downsample: 2x2 avg-pool (s1), channel split, 3x3-s2 conv
    branch + 3x3-s2 max-pool -> 1x1 conv branch, concat."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = ConvBNAct(c, 3, 2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = ConvBNAct(c, 1, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """Spatial pyramid: 1x1 in, three chained 5x5 max-pools, 1x1 out."""

    features: int
    mid: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.mid, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
            )
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv5")(
            jnp.concatenate(pools, axis=-1), train
        )


class CBLinear(nn.Module):
    """YOLOv9 CBLinear: a bias-only 1x1 conv (no BN, no activation) whose
    output splits into per-scale chunks consumed by CBFuse sites in the
    second backbone branch (the gelan-e dual deploy form)."""

    out_channels: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(int(sum(self.out_channels)), (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        splits = list(np.cumsum(self.out_channels)[:-1])
        return jnp.split(y, splits, axis=-1) if splits else [y]


def cb_fuse(chunks, target):
    """YOLOv9 CBFuse: nearest-upsample every CBLinear chunk to the target
    feature's spatial size and sum them all with the target (parameterless)."""
    b, h, w, _ = target.shape
    out = target
    for c in chunks:
        out = out + jax.image.resize(
            c, (b, h, w, c.shape[-1]), method="nearest"
        ).astype(target.dtype)
    return out


class GELAN(nn.Module):
    """Backbone + PAN neck + DFL detect head.  Input [B, H, W, 3] in [0,1].

    form='single' (gelan-c): one backbone chain.  form='dual' (gelan-e,
    the real icon_detect_v3 deploy graph): backbone A feeds five CBLinear
    taps whose chunks CBFuse-sum into backbone B at each scale."""

    variant: str = "e"
    num_classes: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = VARIANTS[self.variant]
        (s3, s4, s5, s5b), (spp, spp_mid) = spec["stages"], spec["sppelan"]
        n = spec["depth"]
        dt = self.dtype
        x = x.astype(dt)
        c1, c2 = spec["stem"]

        if spec["form"] == "dual":
            targets = (c1, c2, s3[0], s4[0], s5[0])
            a1 = ConvBNAct(c1, 3, 2, dt, name="stemA")(x, train)     # P1
            a2 = ConvBNAct(c2, 3, 2, dt, name="downA2")(a1, train)   # P2
            a3 = RepNCSPELAN4(*s3, n, dt, name="elanA2")(a2, train)
            a4 = ADown(s3[0], dt, name="adownA3")(a3, train)         # P3
            a5 = RepNCSPELAN4(*s4, n, dt, name="elanA3")(a4, train)
            a6 = ADown(s4[0], dt, name="adownA4")(a5, train)         # P4
            a7 = RepNCSPELAN4(*s5, n, dt, name="elanA4")(a6, train)
            a8 = ADown(s5[0], dt, name="adownA5")(a7, train)         # P5
            a9 = RepNCSPELAN4(*s5b, n, dt, name="elanA5")(a8, train)
            taps = (a1, a3, a5, a7, a9)
            cbs = [CBLinear(targets[: i + 1], dt, name=f"cb{i + 1}")(taps[i])
                   for i in range(5)]

            b_ = ConvBNAct(c1, 3, 2, dt, name="stemB")(x, train)     # P1
            b_ = cb_fuse([cbs[j][0] for j in range(5)], b_)
            b_ = ConvBNAct(c2, 3, 2, dt, name="downB2")(b_, train)   # P2
            b_ = cb_fuse([cbs[j][1] for j in range(1, 5)], b_)
            b_ = RepNCSPELAN4(*s3, n, dt, name="elanB2")(b_, train)
            b_ = ADown(s3[0], dt, name="adownB3")(b_, train)         # P3
            b_ = cb_fuse([cbs[j][2] for j in range(2, 5)], b_)
            p3 = RepNCSPELAN4(*s4, n, dt, name="elanB3")(b_, train)
            b_ = ADown(s4[0], dt, name="adownB4")(p3, train)         # P4
            b_ = cb_fuse([cbs[j][3] for j in range(3, 5)], b_)
            p4 = RepNCSPELAN4(*s5, n, dt, name="elanB4")(b_, train)
            b_ = ADown(s5[0], dt, name="adownB5")(p4, train)         # P5
            b_ = cb_fuse([cbs[4][4]], b_)
            b_ = RepNCSPELAN4(*s5b, n, dt, name="elanB5")(b_, train)
            p5 = SPPELAN(spp, spp_mid, dt, name="sppelan")(b_, train)
        else:
            x = ConvBNAct(c1, 3, 2, dt, name="stem")(x, train)          # P1
            x = ConvBNAct(c2, 3, 2, dt, name="down2")(x, train)         # P2
            x = RepNCSPELAN4(*s3, n, dt, name="elan2")(x, train)
            x = ADown(s3[0], dt, name="adown3")(x, train)               # P3
            p3 = RepNCSPELAN4(*s4, n, dt, name="elan3")(x, train)
            x = ADown(s4[0], dt, name="adown4")(p3, train)              # P4
            p4 = RepNCSPELAN4(*s5, n, dt, name="elan4")(x, train)
            x = ADown(s5[0], dt, name="adown5")(p4, train)              # P5
            x = RepNCSPELAN4(*s5b, n, dt, name="elan5")(x, train)
            p5 = SPPELAN(spp, spp_mid, dt, name="sppelan")(x, train)

        def up2(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), method="nearest")

        n4_s, n3_s, d4_s, d5_s = spec["neck"]
        x = jnp.concatenate([up2(p5), p4], axis=-1)
        n4 = RepNCSPELAN4(*n4_s, n, dt, name="neck_p4")(x, train)
        x = jnp.concatenate([up2(n4), p3], axis=-1)
        n3 = RepNCSPELAN4(*n3_s, n, dt, name="neck_p3")(x, train)   # out P3
        x = ADown(n3_s[0], dt, name="neck_down3")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        n4b = RepNCSPELAN4(*d4_s, n, dt, name="neck_p4b")(x, train)  # out P4
        x = ADown(d4_s[0], dt, name="neck_down4")(n4b, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = RepNCSPELAN4(*d5_s, n, dt, name="neck_p5")(x, train)    # out P5

        feats = (n3, n4b, n5)
        return DetectHead(
            self.num_classes, [f.shape[-1] for f in feats], dt, name="head"
        )(feats, train)


# --------------------------------------------------------------------- #
# Reference-wrapper semantics (util/yolov9.py:52-136)                    #
# --------------------------------------------------------------------- #


def normalize_image_size(image_size) -> Tuple[int, int]:
    """(width, height), each rounded UP to a 32-multiple
    (util/yolov9.py:52-62; int -> square, pair is (H, W))."""
    if isinstance(image_size, int):
        width = height = image_size
    elif len(image_size) == 2:
        height, width = image_size
    else:
        raise ValueError(f"Expected one or two image dimensions, got {image_size}")
    return ((int(width) + 31) // 32) * 32, ((int(height) + 31) // 32) * 32


def preprocess_pil(image, image_size):
    """EXACT reference preprocessing (util/yolov9.py:73-87): LANCZOS
    resize with int-truncated dims, centered integer 114-pad.  Returns
    (float32 [H, W, 3] in [0,1], scale, pad_left, pad_top)."""
    from pathlib import Path

    from PIL import Image

    if isinstance(image, (str, Path)):  # util/yolov9.py:64-71 accepts paths
        image = Image.open(image)
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    image = image.convert("RGB")
    tw, th = normalize_image_size(image_size)
    iw, ih = image.size
    scale = min(tw / iw, th / ih)
    rw, rh = int(iw * scale), int(ih * scale)
    pad_left, pad_top = (tw - rw) // 2, (th - rh) // 2
    resized = image.resize((rw, rh), Image.Resampling.LANCZOS)
    padded = Image.new("RGB", (tw, th), (114, 114, 114))
    padded.paste(resized, (pad_left, pad_top))
    arr = np.asarray(padded, dtype=np.float32) / 255.0
    return arr, scale, pad_left, pad_top


class Boxes:
    """Ultralytics-compatible result container (util/yolov9.py:16-24)."""

    def __init__(self, xyxy: np.ndarray, confidence: np.ndarray):
        self.xyxy = xyxy
        self.conf = confidence


class Result:
    def __init__(self, boxes: Boxes):
        self.boxes = boxes


@dataclasses.dataclass(frozen=True)
class YOLOv9Detector:
    """Same jitted fixed-shape protocol as yolov8.Detector (detect /
    detect_graph / init_params — drops into SOMPipeline and
    compat.predict_yolo), plus the reference wrapper's `predict`."""

    variant: str = "e"
    num_classes: int = 1
    imgsz: int = 1280
    max_det: int = 512
    prefilter: int = 4096

    @property
    def module(self) -> GELAN:
        return GELAN(variant=self.variant, num_classes=self.num_classes)

    def init_params(self, rng: jax.Array):
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return jax.jit(partial(self.module.init, train=False))(rng, dummy)

    @partial(jax.jit, static_argnames=("self",))
    def detect(self, variables, padded_u8, orig_hw, conf_threshold, nms_iou):
        return self.detect_graph(variables, padded_u8, orig_hw, conf_threshold, nms_iou)

    def detect_graph(self, variables, padded_u8, orig_hw, conf_threshold,
                     nms_iou, allow_pallas: bool = True,
                     with_stats: bool = False, with_raw: bool = False):
        """Bucket-letterboxed device detect — identical contract to
        yolov8.Detector.detect_graph (normalized xyxy, scores, valid)."""
        img, r, pad = letterbox(padded_u8, orig_hw, self.imgsz)
        level_outputs = self.module.apply(variables, img[None], train=False)
        boxes, scores = decode_predictions(level_outputs)
        boxes, scores = boxes[0], scores[0].max(axis=-1)

        keep = scores > conf_threshold
        k = min(max(self.prefilter, self.max_det * 2), boxes.shape[0])
        top_scores, top_idx = jax.lax.top_k(jnp.where(keep, scores, -1.0), k)
        top_boxes = boxes[top_idx]
        top_valid = top_scores > 0
        nb, ns, _, nv = nms_fixed_shape(
            top_boxes, top_scores, top_valid, nms_iou, self.max_det,
            allow_pallas=allow_pallas,
        )
        nb = boxes_letterboxed_to_image(nb, r, pad, orig_hw)
        wh = jnp.stack([orig_hw[1], orig_hw[0], orig_hw[1], orig_hw[0]]).astype(jnp.float32)
        out = (nb / wh, ns, nv)
        if with_stats:
            out = out + (jnp.maximum(keep.sum() - k, 0),)
        if with_raw:
            raw_nb = boxes_letterboxed_to_image(boxes, r, pad, orig_hw)
            out = out + ((raw_nb / wh, scores),)
        return out

    # ----------------------------------------------------------------- #

    def _predict_graph(self, th: int, tw: int, max_det: int):
        """One compiled graph per (target H, target W): forward + decode +
        conf filter + per-class NMS on device, boxes still in letterboxed
        pixels (unpad/clamp are host-side scalar math, like the reference
        keeps them outside the TorchScript graph)."""
        module = self.module
        k = self.prefilter

        @jax.jit
        def fn(variables, img_f32, conf, iou):
            level_outputs = module.apply(variables, img_f32[None], train=False)
            boxes, scores_all = decode_predictions(level_outputs)
            boxes = boxes[0]
            scores = scores_all[0].max(axis=-1)
            class_ids = jnp.argmax(scores_all[0], axis=-1)
            keep = scores > conf  # strict >, util/yolov9.py:125
            kk = min(max(k, max_det * 2), boxes.shape[0])
            top_scores, top_idx = jax.lax.top_k(jnp.where(keep, scores, -1.0), kk)
            top_boxes = boxes[top_idx]
            top_cls = class_ids[top_idx]
            top_valid = top_scores > 0
            # torchvision.ops.batched_nms semantics: per-class via the
            # coordinate-offset trick (classes never suppress each other).
            # Data-dependent stride (max-min+1) — a strictly-safe variant of
            # torchvision's max_coordinate+1 offset: unclamped
            # DFL boxes can extend (REG_MAX-1)*32 px past the letterbox, so a
            # th+tw constant could let adjacent classes overlap.
            stride = top_boxes.max() - top_boxes.min() + 1.0
            offset = (top_cls.astype(jnp.float32) * stride)[:, None]
            nb, ns, idx, nv = nms_fixed_shape(
                top_boxes + offset, top_scores, top_valid, iou, max_det,
            )
            return top_boxes[idx], ns, nv, jnp.maximum(keep.sum() - kk, 0)

        return fn

    def predict(self, variables, source, conf: float = 0.25, imgsz=640,
                iou: float = 0.7, max_det: int = 300):
        """Reference `YOLOv9Detector.predict` (util/yolov9.py:116-136):
        ultralytics-shaped [Result(Boxes(xyxy_px, conf))] on the ORIGINAL
        image scale, clamped to the image bounds."""
        import warnings

        arr, scale, pad_left, pad_top = preprocess_pil(source, imgsz)
        th, tw = arr.shape[0], arr.shape[1]
        key = (th, tw, max_det)
        cache = _PREDICT_CACHE.setdefault(id_key(self), {})
        if key not in cache:
            cache[key] = self._predict_graph(th, tw, max_det)
        fn = cache[key]
        boxes_lb, scores, valid, overflow = jax.device_get(
            fn(variables, jnp.asarray(arr), jnp.float32(conf), jnp.float32(iou))
        )
        if int(overflow) > 0:
            warnings.warn(
                f"yolov9 prefilter overflow: {int(overflow)} above-threshold "
                "candidates beyond the top-k window (raise prefilter)",
                RuntimeWarning,
            )
        boxes = boxes_lb[valid]
        scores = np.asarray(scores[valid], np.float32)
        # unpad -> original scale -> clamp (util/yolov9.py:128-135)
        if hasattr(source, "shape"):  # numpy (`.size` is an int there)
            ih, iw = np.asarray(source).shape[:2]
        else:  # PIL
            iw, ih = source.size
        boxes = boxes.astype(np.float32)
        boxes[:, [0, 2]] = np.clip((boxes[:, [0, 2]] - pad_left) / scale, 0, iw)
        boxes[:, [1, 3]] = np.clip((boxes[:, [1, 3]] - pad_top) / scale, 0, ih)
        return [Result(Boxes(boxes, scores))]


_PREDICT_CACHE: dict = {}


def id_key(det: YOLOv9Detector):
    return (det.variant, det.num_classes, det.prefilter)
