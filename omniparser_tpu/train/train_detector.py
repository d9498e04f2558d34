"""From-scratch icon-detector training on synthetic GUI scenes.

The reference ships a YOLOv8 fine-tuned for GUI icons (README.md:39
icon_detect weights) that cannot be fetched here; this trains the same
architecture (models/yolov8.YOLOv8, variant n, 1 class) on procedurally
rendered screens (train/synth_gui.py) with the fixed-shape detection_loss
(train/losses.py: BCE + CIoU + DFL, center-inside assigner).

Single-CPU host: scenes pre-render once into RAM (cached to /tmp npz);
per-batch variety comes from on-device photometric augmentation inside the
jitted step.  Training runs on whatever backend JAX selects (the real TPU
chip under axon; CPU in tests).

CLI:
    python -m omniparser_tpu.train.train_detector --steps 3000 \
        --out omniparser_tpu/weights/det_synth
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.train.losses import detection_loss
from omniparser_tpu.train.synth_gui import DATA_VERSION, render_gui_scene

IMGSZ = 640
MAX_GT = 64


# ------------------------------ dataset ------------------------------ #


def build_det_dataset(n: int, seed: int, cache: bool = True):
    """(images [n,640,640,3] u8, gt_boxes [n,M,4] normalized xyxy f32,
    gt_mask [n,M] bool).  Rendering is 1-core-bound (~0.3 s/scene);
    cached to /tmp for retrain iterations."""
    cache_path = f"/tmp/det_gui_data_s{seed}_n{n}_{IMGSZ}_v{DATA_VERSION}.npz"
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["images"], z["boxes"], z["mask"]
    rng = np.random.default_rng(seed)
    images = np.zeros((n, IMGSZ, IMGSZ, 3), np.uint8)
    boxes = np.zeros((n, MAX_GT, 4), np.float32)
    mask = np.zeros((n, MAX_GT), bool)
    t0 = time.time()
    for i in range(n):
        img, icons, _tb, _tx = render_gui_scene(rng, size=IMGSZ,
                                                max_icons=MAX_GT - 8)
        images[i] = img
        k = min(len(icons), MAX_GT)
        if k:
            boxes[i, :k] = np.asarray(icons[:k], np.float32) / IMGSZ
            mask[i, :k] = True
        if i % 200 == 199:
            print(f"  rendered {i + 1}/{n} ({time.time() - t0:.0f}s)", flush=True)
    if cache:
        np.savez_compressed(cache_path, images=images, boxes=boxes, mask=mask)
    return images, boxes, mask


# ------------------------------ training ------------------------------ #


def _augment(key, imgs_f):
    """On-device photometric aug: brightness/contrast jitter + noise."""
    k1, k2, k3 = jax.random.split(key, 3)
    b = imgs_f.shape[0]
    bright = jax.random.uniform(k1, (b, 1, 1, 1), minval=-0.12, maxval=0.12)
    contr = jax.random.uniform(k2, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    noise = jax.random.normal(k3, imgs_f.shape) * 0.015
    return jnp.clip((imgs_f - 0.5) * contr + 0.5 + bright + noise, 0.0, 1.0)


def train_detector(steps: int, batch: int, seed: int, dataset_size: int,
                   lr: float = 2e-3) -> Dict[str, Any]:
    images, gt_boxes, gt_mask = build_det_dataset(dataset_size, seed)
    det = Detector(variant="n", num_classes=1, imgsz=IMGSZ)
    module = det.module
    variables = det.init_params(jax.random.PRNGKey(seed))
    params, stats = variables["params"], variables["batch_stats"]

    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps, alpha=0.05),
                    weight_decay=1e-4),
    )
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, stats, opt, imgs_u8, gtb, gtm, key):
        imgs = _augment(key, imgs_u8.astype(jnp.float32) / 255.0)

        def loss_fn(p):
            outs, mut = module.apply(
                {"params": p, "batch_stats": stats}, imgs, train=True,
                mutable=["batch_stats"],
            )
            return detection_loss(outs, gtb, gtm, IMGSZ), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    n = len(images)
    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for s in range(steps):
        idx = rng.integers(0, n, batch)
        key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
        params, stats, opt, loss = step_fn(
            params, stats, opt, jnp.asarray(images[idx]),
            jnp.asarray(gt_boxes[idx]), jnp.asarray(gt_mask[idx]), key)
        if s % 200 == 0 or s == steps - 1:
            print(f"  step {s}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return {"params": params, "batch_stats": stats}


# ------------------------------ evaluation ------------------------------ #


def evaluate_detector(variables, n_scenes: int = 32, seed: int = 9999,
                      conf: float = 0.3, nms_iou: float = 0.1,
                      iou_thr: float = 0.5) -> Dict[str, float]:
    """Greedy-match detections to GT at IoU>=iou_thr on held-out scenes."""
    det = Detector(variant="n", num_classes=1, imgsz=IMGSZ, max_det=256)
    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    for _ in range(n_scenes):
        img, icons, _tb, _tx = render_gui_scene(rng, size=IMGSZ)
        gt = np.asarray(icons, np.float32).reshape(-1, 4)
        boxes, scores, valid = det.detect(
            variables, jnp.asarray(img), jnp.asarray([IMGSZ, IMGSZ], jnp.int32),
            conf, nms_iou)
        pred = np.asarray(boxes)[np.asarray(valid)] * IMGSZ
        used = np.zeros(len(gt), bool)
        for p in pred:
            if len(gt) == 0:
                fp += 1
                continue
            ix1 = np.maximum(p[0], gt[:, 0]); iy1 = np.maximum(p[1], gt[:, 1])
            ix2 = np.minimum(p[2], gt[:, 2]); iy2 = np.minimum(p[3], gt[:, 3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            ap = (p[2] - p[0]) * (p[3] - p[1])
            ag = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
            iou = inter / (ap + ag - inter + 1e-9)
            iou[used] = 0.0
            j = int(np.argmax(iou))
            if iou[j] >= iou_thr:
                tp += 1
                used[j] = True
            else:
                fp += 1
        fn += int((~used).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return {"precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(2 * prec * rec / max(prec + rec, 1e-9), 4),
            "tp": tp, "fp": fp, "fn": fn}


def main(argv=None):
    p = argparse.ArgumentParser("train the icon detector on synthetic GUIs")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--data", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="omniparser_tpu/weights/det_synth")
    args = p.parse_args(argv)

    from omniparser_tpu.weights.checkpoints import save_checkpoint

    variables = train_detector(args.steps, args.batch, args.seed, args.data)
    report = evaluate_detector(variables)
    print("det eval:", report, flush=True)
    path = save_checkpoint(args.out, {"det": variables})
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(report, f)
    print(f"saved {path}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
