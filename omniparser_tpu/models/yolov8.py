"""YOLOv8-class icon detector, TPU-first.

From-scratch Flax implementation of the architecture family the reference
drives through ultralytics (util/utils.py:71-75, 378-399): CSP backbone with
C2f blocks + SPPF, PAN feature pyramid, decoupled anchor-free head with
Distribution Focal Loss regression (reg_max=16).  Differences from the
torch/CUDA stack, by design:

  * NHWC layout, bfloat16 compute / float32 params — XLA tiles the convs
    onto the MXU directly;
  * static letterbox input buckets instead of ultralytics' per-aspect
    "rect" shapes, so one compiled graph serves all screenshots;
  * decode + confidence filter + top-k + greedy NMS run inside the same
    jitted graph (the reference crosses host<->GPU for NMS).

Variant scaling matches the published YOLOv8 family so ultralytics
icon_detect weights convert 1:1 (see weights/convert_yolo.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from omniparser_tpu.ops.nms import nms_fixed_shape
from omniparser_tpu.ops.preprocess import boxes_letterboxed_to_image, letterbox

# depth_multiple, width_multiple, max_channels per published variant
VARIANTS = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

REG_MAX = 16
STRIDES = (8, 16, 32)


def _ch(base: int, wm: float, maxc: int) -> int:
    return int(min(base, maxc) * wm + 0.5) if base != 3 else 3


def _depth(n: int, dm: float) -> int:
    return max(round(n * dm), 1)


class ConvBNAct(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics 'Conv')."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.silu(x).astype(self.dtype)


class Bottleneck(nn.Module):
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


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (ultralytics C2f)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype, name=f"m{i}")(parts[-1], train)
            )
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x = ConvBNAct(c, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
            )
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class DetectHead(nn.Module):
    """Decoupled anchor-free head: per-level box (4*REG_MAX) + cls logits."""

    num_classes: int
    channels: Sequence[int]  # per-level input channels
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.channels[0] // 4, 4 * REG_MAX)
        c3 = max(self.channels[0], min(self.num_classes, 100))
        outs = []
        for i, x in enumerate(feats):
            box = ConvBNAct(c2, 3, dtype=self.dtype, name=f"box{i}_0")(x, train)
            box = ConvBNAct(c2, 3, dtype=self.dtype, name=f"box{i}_1")(box, train)
            box = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"box{i}_2")(box)
            cls = ConvBNAct(c3, 3, dtype=self.dtype, name=f"cls{i}_0")(x, train)
            cls = ConvBNAct(c3, 3, dtype=self.dtype, name=f"cls{i}_1")(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name=f"cls{i}_2")(cls)
            outs.append((box, cls))
        return outs


class YOLOv8(nn.Module):
    """Backbone + PAN neck + detect head.  Input: [B, S, S, 3] float in [0,1]."""

    variant: str = "n"
    num_classes: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dm, wm, maxc = VARIANTS[self.variant]
        ch = partial(_ch, wm=wm, maxc=maxc)
        d = partial(_depth, dm=dm)
        dt = self.dtype
        x = x.astype(dt)

        # --- backbone ---
        x = ConvBNAct(ch(64), 3, 2, dt, name="stem")(x, train)  # P1
        x = ConvBNAct(ch(128), 3, 2, dt, name="down2")(x, train)  # P2
        x = C2f(ch(128), d(3), True, dt, name="c2f_2")(x, train)
        x = ConvBNAct(ch(256), 3, 2, dt, name="down3")(x, train)  # P3
        p3 = C2f(ch(256), d(6), True, dt, name="c2f_3")(x, train)
        x = ConvBNAct(ch(512), 3, 2, dt, name="down4")(p3, train)  # P4
        p4 = C2f(ch(512), d(6), True, dt, name="c2f_4")(x, train)
        x = ConvBNAct(ch(1024), 3, 2, dt, name="down5")(p4, train)  # P5
        x = C2f(ch(1024), d(3), True, dt, name="c2f_5")(x, train)
        p5 = SPPF(ch(1024), dt, name="sppf")(x, train)

        # --- PAN neck ---
        def up2(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), method="nearest")

        x = jnp.concatenate([up2(p5), p4], axis=-1)
        n4 = C2f(ch(512), d(3), False, dt, name="neck_p4")(x, train)
        x = jnp.concatenate([up2(n4), p3], axis=-1)
        n3 = C2f(ch(256), d(3), False, dt, name="neck_p3")(x, train)  # out P3
        x = ConvBNAct(ch(256), 3, 2, dt, name="neck_down3")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        n4b = C2f(ch(512), d(3), False, dt, name="neck_p4b")(x, train)  # out P4
        x = ConvBNAct(ch(512), 3, 2, dt, name="neck_down4")(n4b, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = C2f(ch(1024), d(3), False, dt, name="neck_p5")(x, train)  # out P5

        feats = (n3, n4b, n5)
        return DetectHead(
            self.num_classes, [f.shape[-1] for f in feats], dt, name="head"
        )(feats, train)


def decode_predictions(level_outputs):
    """DFL decode: per-level (box_logits, cls_logits) -> [B, A, 4] xyxy in
    letterboxed pixels + [B, A, nc] sigmoid scores, concatenated over levels.
    (Geometry comes entirely from the feature-map shapes x STRIDES; the
    letterbox target must be consistent with those shapes.)"""
    boxes_all, scores_all = [], []
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    for (box, cls), stride in zip(level_outputs, STRIDES):
        b, h, w, _ = box.shape
        box = box.astype(jnp.float32).reshape(b, h * w, 4, REG_MAX)
        dist = jax.nn.softmax(box, axis=-1) @ bins  # [B, HW, 4] ltrb in stride units
        cy, cx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        anchors = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # [HW, 2]
        lt = anchors[None] - dist[..., :2]
        rb = anchors[None] + dist[..., 2:]
        boxes = jnp.concatenate([lt, rb], axis=-1) * stride  # [B, HW, 4] xyxy
        scores = jax.nn.sigmoid(cls.astype(jnp.float32).reshape(b, h * w, -1))
        boxes_all.append(boxes)
        scores_all.append(scores)
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


def default_detector_weights(config) -> "str | None":
    """The shipped synthetic-GUI-trained detector checkpoint (orbax dir
    written by train/train_detector.py), when present and architecture-
    compatible.  'auto' gives every entry point a functional icon detector
    by default, mirroring the reference's pretrained icon_detect load
    (util/utils.py:71-75)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "weights", "det_synth")
    if (os.path.isdir(path) and config.variant == "n"
            and config.num_classes == 1):
        return os.path.abspath(path)
    return None


def snap_imgsz(imgsz, buckets=(640, 960, 1280, 1920)) -> int:
    """Runtime imgsz (reference demo slider 640-1920, gradio_demo.py:68-76)
    -> the smallest static letterbox bucket that covers it.  Static buckets
    keep the jitted detect graph fixed-shape; one compile per bucket."""
    if isinstance(imgsz, (list, tuple)):
        imgsz = max(imgsz)
    for b in sorted(buckets):
        if imgsz <= b:
            return b
    return max(buckets)


@dataclasses.dataclass(frozen=True)
class Detector:
    """Jitted end-to-end detect: bucket-padded uint8 -> normalized boxes.

    Bind once with (variant, num_classes); call .detect(params, ...).
    """

    variant: str = "n"
    num_classes: int = 1
    imgsz: int = 1280
    max_det: int = 512
    # conf->NMS top-k window; must cover the above-threshold candidate
    # count for keep-set parity with the reference's unbounded NMS
    prefilter: int = 4096

    @property
    def module(self) -> YOLOv8:
        return YOLOv8(variant=self.variant, num_classes=self.num_classes)

    def init_params(self, rng: jax.Array):
        # Conv/BN param shapes are spatial-size independent: init at a tiny
        # resolution so flax's shape-inference forward is cheap (full-size
        # init would compile a 1280px graph just to size the params).
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return jax.jit(partial(self.module.init, train=False))(rng, dummy)

    @partial(jax.jit, static_argnames=("self",))
    def detect(self, variables, padded_u8, orig_hw, conf_threshold, nms_iou):
        """Jitted single-image detect (see detect_graph)."""
        return self.detect_graph(variables, padded_u8, orig_hw, conf_threshold, nms_iou)

    def detect_graph(
        self,
        variables,
        padded_u8: jnp.ndarray,  # [Hb, Wb, 3] uint8
        orig_hw: jnp.ndarray,  # [2] int32
        conf_threshold,
        nms_iou,
        allow_pallas: bool = True,  # False under vmap (Mosaic doesn't batch)
        with_stats: bool = False,
        with_raw: bool = False,
    ):
        """Single-image detect (traceable; composes into larger fused
        graphs).  Returns (boxes_norm [max_det,4] xyxy in [0,1],
        scores [max_det], valid [max_det]); with_stats=True appends the
        prefilter overflow count (candidates above threshold beyond the
        static top-k — no-silent-caps convention); with_raw=True appends
        the full pre-NMS decode (boxes_norm [A,4], scores [A]) so tests
        can run an unbounded-NMS oracle on the exact same tensors."""
        img, r, pad = letterbox(padded_u8, orig_hw, self.imgsz)
        level_outputs = self.module.apply(variables, img[None], train=False)
        boxes, scores = decode_predictions(level_outputs)
        boxes, scores = boxes[0], scores[0].max(axis=-1)  # single class max

        # confidence prefilter + static top-k (ultralytics: conf then NMS).
        # The window must cover every above-threshold candidate for the
        # greedy keep-set to match the reference's unbounded NMS; overflow
        # is counted (with_stats) and warned on by the pipeline.
        keep = scores > conf_threshold
        k = min(max(self.prefilter, self.max_det * 2), boxes.shape[0])
        top_scores, top_idx = jax.lax.top_k(jnp.where(keep, scores, -1.0), k)
        top_boxes = boxes[top_idx]
        top_valid = top_scores > 0

        nb, ns, _, nv = nms_fixed_shape(
            top_boxes, top_scores, top_valid, nms_iou, self.max_det,
            allow_pallas=allow_pallas,
        )
        # letterboxed pixels -> original pixels -> normalized
        nb = boxes_letterboxed_to_image(nb, r, pad, orig_hw)
        wh = jnp.stack([orig_hw[1], orig_hw[0], orig_hw[1], orig_hw[0]]).astype(jnp.float32)
        out = (nb / wh, ns, nv)
        if with_stats:
            out = out + (jnp.maximum(keep.sum() - k, 0),)
        if with_raw:
            raw_nb = boxes_letterboxed_to_image(boxes, r, pad, orig_hw)
            out = out + ((raw_nb / wh, scores),)
        return out
