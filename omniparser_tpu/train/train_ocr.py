"""From-scratch OCR training on synthetic GUI text.

The reference imports pretrained OCR engines (util/utils.py:20-31); this
environment has neither weights nor egress, so the TPU-native OCR stage is
trained here: TextRecognizer (CTC over rendered line crops) and
TextDetector (DBNet-style shrink maps over rendered screenshots), both on
data from train/synth_text.py.  The recognizer's crops go through the
exact inference-path geometry (ops.preprocess.crop_lines_batch), so there
is no train/serve skew.

Single-CPU host: datasets are pre-generated once into RAM and recycled
over epochs; per-batch variety comes from cheap on-device photometric
augmentation (brightness/contrast/inversion/noise) inside the jitted step.

CLI:
    python -m omniparser_tpu.train.train_ocr --rec-steps 4000 \
        --det-steps 1500 --out omniparser_tpu/weights/ocr_en_synth
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

from omniparser_tpu.models.ocr import (
    TextDetector,
    TextRecognizer,
    ctc_greedy_decode,
)
from omniparser_tpu.train.ocr_losses import balanced_bce_dice_loss, ctc_loss
from omniparser_tpu.train.synth_text import (
    render_line_buffers,
    crops_from_buffers,
    render_screenshot,
    shrink_map,
)

REC_HW = (32, 480)  # OcrConfig.rec_height/rec_max_width defaults
MAX_LABEL = 56


# ------------------------------ datasets ------------------------------ #


def build_rec_dataset(n: int, seed: int, chunk: int = 512, cache: bool = True):
    """(crops [n,32,320,3] u8, labels [n,L] i32). Chunked so the jax crop
    transform stays small.  Rendering is single-core-bound (~20 min for
    120k lines); cache to /tmp so retrain iterations skip it."""
    # _v2: colored line renders (see synth_text.render_line)
    from omniparser_tpu.train.synth_gui import DATA_VERSION

    cache_path = f"/tmp/ocr_rec_data_s{seed}_n{n}_{REC_HW[1]}_v{2 + DATA_VERSION}.npz"
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["crops"], z["labels"]
    rng = np.random.default_rng(seed)
    crops = np.zeros((n, *REC_HW, 3), np.uint8)
    labels = np.zeros((n, MAX_LABEL), np.int32)
    t0 = time.time()
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        bufs, hws, lab, _ = render_line_buffers(rng, e - s, MAX_LABEL)
        crops[s:e] = crops_from_buffers(bufs, hws, REC_HW)
        labels[s:e] = lab
        if s and s % (chunk * 16) == 0:
            print(f"  rec data {e}/{n} ({time.time() - t0:.0f}s)", flush=True)
    if cache:
        np.savez(cache_path, crops=crops, labels=labels)
    return crops, labels


def build_det_dataset(n: int, seed: int, size: int = 640, cache: bool = True):
    """(screens [n,S,S,3] u8, maps [n,S/2,S/2] u8 {0,1}).  30% of screens
    are rendered at 1.5-2x and downscaled, matching the letterbox shrink
    that high-resolution screenshots see at inference (det_imgsz=960 vs 4K).
    Half the screens are COLORED GUI scenes (train/synth_gui.py: panels,
    icons, colored text) so the text detector is robust off grayscale —
    the v2 gap found by the end-to-end quality gate."""
    import cv2

    from omniparser_tpu.train.synth_gui import render_gui_scene

    from omniparser_tpu.train.synth_gui import DATA_VERSION as _DV

    cache_path = f"/tmp/ocr_det_data_s{seed}_n{n}_v{3 + _DV}.npz"
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["screens"], z["maps"]
    rng = np.random.default_rng(seed)
    screens = np.zeros((n, size, size, 3), np.uint8)
    maps = np.zeros((n, size // 2, size // 2), np.uint8)
    t0 = time.time()
    for i in range(n):
        def render(sz):
            if rng.random() < 0.5:  # colored GUI scene; icons are negatives
                img, _icons, tboxes, _texts = render_gui_scene(
                    rng, size=sz, max_texts=28)
                return img, tboxes
            img, boxes, _ = render_screenshot(rng, sz)
            return img, boxes

        roll = rng.random()
        if roll < 0.3:
            # high-res screenshots shrink through the det letterbox:
            # render big, downscale (text smaller than native)
            big = int(size * rng.uniform(1.5, 2.0))
            img, boxes = render(big)
            s = size / big
            img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
            boxes = [[int(v * s) for v in b] for b in boxes]
        elif roll < 0.55:
            # small screenshots UPSCALE through the det letterbox when
            # det_imgsz exceeds the frame (round-4: det at 1280 on a
            # 640px scene doubles every glyph): render small, upscale
            small = int(size * rng.uniform(0.45, 0.8))
            img, boxes = render(small)
            s = size / small
            img = cv2.resize(img, (size, size),
                             interpolation=cv2.INTER_LINEAR)
            boxes = [[int(v * s) for v in b] for b in boxes]
        else:
            img, boxes = render(size)
        screens[i] = img
        maps[i] = shrink_map(boxes, size)
        if i and i % 200 == 0:
            print(f"  det data {i}/{n} ({time.time() - t0:.0f}s)", flush=True)
    if cache:
        np.savez(cache_path, screens=screens, maps=maps)
    return screens, maps


# ------------------------------ rec training ------------------------------ #


def _augment(key, x):
    """Per-sample photometric jitter on [B,H,W,3] floats in [0,1]."""
    b = x.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    bias = jax.random.uniform(k2, (b, 1, 1, 1), minval=-0.1, maxval=0.1)
    inv = jax.random.bernoulli(k3, 0.25, (b, 1, 1, 1))
    x = jnp.where(inv, 1.0 - x, x)
    x = x * scale + bias
    x = x + jax.random.normal(k4, x.shape) * 0.015
    return jnp.clip(x, 0.0, 1.0)


def train_recognizer(
    steps: int = 4000,
    batch: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    dataset_size: int = 120_000,
    log_every: int = 200,
) -> Dict[str, Any]:
    """Returns trained rec variables {'params', 'batch_stats'}."""
    rec = TextRecognizer()
    variables = jax.jit(partial(rec.init, train=False))(
        jax.random.PRNGKey(seed), jnp.zeros((1, *REC_HW, 3))
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    warmup = min(300, steps // 2)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps, lr * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=1e-4))
    opt_state = tx.init(params)

    def loss_for(p, batch_stats, x, labels):
        logits, mut = rec.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return ctc_loss(logits, labels), mut["batch_stats"]

    print(f"rec: generating {dataset_size} lines ...", flush=True)
    crops, labels = build_rec_dataset(dataset_size, seed + 1)
    print("rec: training ...", flush=True)
    # TPU-native loop: dataset resident in HBM, indices sampled on device,
    # lax.scan over `chunk` steps per dispatch — no per-step host<->device
    # traffic (the tunnel costs tens of ms per transfer; see CLAUDE.md).
    run_chunk = _make_scan_runner(
        tx, loss_for, batch, dataset_size,
        lambda data, idx: (data[0][idx].astype(jnp.float32) / 255.0, data[1][idx]),
    )
    data_dev = (jnp.asarray(crops), jnp.asarray(labels))
    del crops
    carry = (params, batch_stats, opt_state, jax.random.PRNGKey(seed + 3))
    t0, done = time.time(), 0
    while done < steps:
        n = min(log_every, steps - done)
        carry, losses = run_chunk(carry, data_dev, n)
        done += n
        l = np.asarray(losses)
        print(f"  rec step {done}/{steps} loss {l[-1]:.4f} "
              f"mean {l.mean():.4f} ({time.time() - t0:.0f}s)", flush=True)
    params, batch_stats = carry[0], carry[1]
    return {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}


def _make_scan_runner(tx, loss_for, batch: int, dataset_size: int, gather):
    """One jitted dispatch running `n` train steps via lax.scan.

    gather(data, idx) -> (x, y) pulls a batch from the HBM-resident dataset
    tuple; loss_for(params, batch_stats, x, y) -> (loss, new_batch_stats).
    """
    from functools import lru_cache

    def one_step(data, carry, _):
        params, batch_stats, opt_state, key = carry
        key, k_idx, k_aug = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch,), 0, dataset_size)
        x, y = gather(data, idx)
        x = _augment(k_aug, x)
        (loss, new_stats), grads = jax.value_and_grad(loss_for, has_aux=True)(
            params, batch_stats, x, y
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state, key), loss

    @lru_cache(maxsize=8)
    def compiled(n: int):
        @partial(jax.jit, donate_argnums=(0,))
        def run(carry, data):
            return jax.lax.scan(partial(one_step, data), carry, None, length=n)

        return run

    def run_chunk(carry, data, n: int):
        return compiled(n)(carry, data)

    return run_chunk


def evaluate_recognizer(rec_vars, n: int = 512, seed: int = 9000) -> Dict[str, float]:
    """Held-out exact-match / char error rate / mean confidence."""
    rec = TextRecognizer()
    rng = np.random.default_rng(seed)
    bufs, hws, _, texts = render_line_buffers(rng, n, MAX_LABEL)
    crops = crops_from_buffers(bufs, hws, REC_HW)
    fn = jax.jit(partial(rec.apply, train=False))
    exact = 0
    dist_sum = 0
    len_sum = 0
    confs = []
    for s in range(0, n, 128):
        logits = np.asarray(fn(rec_vars, jnp.asarray(crops[s : s + 128]) / 255.0))
        for j in range(logits.shape[0]):
            pred, conf = ctc_greedy_decode(logits[j])
            want = texts[s + j][:MAX_LABEL]
            exact += pred == want
            dist_sum += _levenshtein(pred, want)
            len_sum += len(want)
            confs.append(conf)
    return {
        "exact_match": exact / n,
        "cer": dist_sum / max(len_sum, 1),
        "mean_conf": float(np.mean(confs)),
        "n": n,
    }


def _levenshtein(a: str, b: str) -> int:
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ------------------------------ det training ------------------------------ #


def train_detector(
    steps: int = 1500,
    batch: int = 8,
    lr: float = 5e-4,
    seed: int = 100,
    dataset_size: int = 1500,
    log_every: int = 100,
) -> Dict[str, Any]:
    det = TextDetector()
    variables = jax.jit(partial(det.init, train=False))(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3))
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    warmup = min(150, steps // 2)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps, lr * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=1e-4))
    opt_state = tx.init(params)

    def loss_for(p, batch_stats, x, target):
        prob, mut = det.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return balanced_bce_dice_loss(prob, target), mut["batch_stats"]

    print(f"det: generating {dataset_size} screenshots ...", flush=True)
    screens, maps = build_det_dataset(dataset_size, seed + 1)
    print("det: training ...", flush=True)
    run_chunk = _make_scan_runner(
        tx, loss_for, batch, dataset_size,
        lambda data, idx: (data[0][idx].astype(jnp.float32) / 255.0,
                           data[1][idx].astype(jnp.float32)),
    )
    data_dev = (jnp.asarray(screens), jnp.asarray(maps))
    del screens, maps
    carry = (params, batch_stats, opt_state, jax.random.PRNGKey(seed + 3))
    t0, done = time.time(), 0
    while done < steps:
        n = min(log_every, steps - done)
        carry, losses = run_chunk(carry, data_dev, n)
        done += n
        l = np.asarray(losses)
        print(f"  det step {done}/{steps} loss {l[-1]:.4f} "
              f"mean {l.mean():.4f} ({time.time() - t0:.0f}s)", flush=True)
    params, batch_stats = carry[0], carry[1]
    return {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}


def evaluate_detector(det_vars, n: int = 16, seed: int = 9100) -> Dict[str, float]:
    """Box-level recall/precision of the full det postprocess
    (net -> prob map -> extract_text_boxes) against GT rects at IoU 0.5."""
    from omniparser_tpu.models.ocr import extract_text_boxes

    det = TextDetector()
    rng = np.random.default_rng(seed)
    fn = jax.jit(partial(det.apply, train=False))
    tp = fp = fn_ct = 0
    for _ in range(n):
        img, gts, _ = render_screenshot(rng, 640)
        prob = np.asarray(fn(det_vars, jnp.asarray(img[None], jnp.float32) / 255.0))[0, ..., 0]
        cands = [b for b, _s in extract_text_boxes(prob)]
        matched = [False] * len(cands)
        for g in gts:
            best, best_i = 0.0, -1
            for ci, c in enumerate(cands):
                if matched[ci]:
                    continue
                iou = _iou(g, c)
                if iou > best:
                    best, best_i = iou, ci
            if best >= 0.5:
                matched[best_i] = True
                tp += 1
            else:
                fn_ct += 1
        fp += matched.count(False)
    return {
        "recall": tp / max(tp + fn_ct, 1),
        "precision": tp / max(tp + fp, 1),
        "n_screens": n,
    }


def _iou(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


# ------------------------------ entry point ------------------------------ #


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rec-steps", type=int, default=4000)
    p.add_argument("--det-steps", type=int, default=1500)
    p.add_argument("--rec-batch", type=int, default=256)
    p.add_argument("--det-batch", type=int, default=8)
    p.add_argument("--rec-data", type=int, default=120_000)
    p.add_argument("--det-data", type=int, default=1500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="omniparser_tpu/weights/ocr_en_synth")
    p.add_argument("--skip-det", action="store_true")
    p.add_argument("--skip-rec", action="store_true")
    args = p.parse_args(argv)

    from omniparser_tpu.weights.checkpoints import load_checkpoint, save_checkpoint

    report: Dict[str, Any] = {}
    if not args.skip_rec:
        rec_vars = train_recognizer(
            args.rec_steps, args.rec_batch, seed=args.seed, dataset_size=args.rec_data
        )
        report["rec"] = evaluate_recognizer(rec_vars)
        print("rec eval:", report["rec"], flush=True)
    else:
        rec_vars = load_checkpoint(args.out)["rec"]
    if not args.skip_det:
        det_vars = train_detector(
            args.det_steps, args.det_batch, seed=args.seed + 100,
            dataset_size=args.det_data,
        )
        report["det"] = evaluate_detector(det_vars)
        print("det eval:", report["det"], flush=True)
    else:
        det_vars = load_checkpoint(args.out)["det"]

    path = save_checkpoint(args.out, {"det": det_vars, "rec": rec_vars})
    print(f"saved {path}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
