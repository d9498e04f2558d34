"""From-scratch icon-captioner training on synthetic GUI glyphs.

The reference's icon captioner is a fine-tuned Florence-2-base fetched
from HF (util/utils.py:61-68); this environment has no weights and no
egress, so a reduced-dims Florence-2 (same architecture family:
DaViT tower + BART encoder/decoder, models/florence2.py) is trained here
to caption the procedural glyph families the detector trains on
(train/synth_gui.ICON_KINDS) — giving the default pipeline *functional*
captions ("settings icon", "search icon", ...) end to end, like the
shipped detector/OCR checkpoints.

Crops go through the EXACT inference-path geometry
(ops.preprocess.crop_resize_batch on the glyph box with detector-style
jitter), and generation is the same greedy_generate the fused parse step
uses — no train/serve skew.

CLI:
    python -m omniparser_tpu.train.train_captioner --steps 3000 \
        --out omniparser_tpu/weights/cap_synth
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from omniparser_tpu.models.florence2 import (
    TASK_PROMPTS,
    Florence2,
    FlorenceDims,
    greedy_generate,
)
from omniparser_tpu.models.tokenizer import load_tokenizer
from omniparser_tpu.train.synth_gui import (DATA_VERSION, ICON_KINDS,
                                            render_icon_tile)

# one caption phrase per glyph family; all fit greedy max_new_tokens=20
# (CaptionerConfig default) with bos/eos under the char-level fallback
# tokenizer
CAPTIONS: Dict[str, str] = {
    "button": "button icon",
    "gear": "settings icon",
    "hamburger": "menu icon",
    "magnifier": "search icon",
    "arrow": "arrow icon",
    "star": "favorite icon",
    "cross": "close icon",
    "plus": "add icon",
    "dots": "more options icon",
    "folder": "folder icon",
    "toggle": "toggle icon",
    "ring": "circle icon",
    "thumbnail": "image icon",
    "chevron": "expand icon",
    # round-4 families (train/synth_gui.ICON_KINDS additions, matched to
    # the icons annotated in eval/real_gt.json); every phrase fits MAX_T
    # (<= 18 chars + bos/eos)
    "bell": "notifications icon"[:18],
    "chat": "chat icon",
    "calendar": "calendar icon",
    "phone": "phone icon",
    "cloud": "cloud icon",
    "smiley": "emoji icon",
    "send": "send icon",
    "refresh": "refresh icon",
    "grid": "apps icon",
    "mic": "microphone icon",
    "camera": "camera icon",
    "undo": "undo icon",
    "bold": "bold icon",
    "italic": "italic icon",
    "underline": "underline icon",
    "wifi": "wifi icon",
    "battery": "battery icon",
    "music": "music icon",
    # round-5: left arrows are their own family (real back buttons
    # ground against this exact phrase — eval/real_gt.json)
    "back": "back arrow icon",
}

# reduced Florence-2 dims: same graph family as BASE, sized for a
# 14-family synthetic task + the char-level fallback tokenizer id space
SYNTH_CAP_DIMS = FlorenceDims(
    # (round-5 tried a 1.25x-width / extra-stage-3-block variant: real
    # crop exact-match did NOT improve — the gap is domain, not capacity
    # — so the faster decode dims stay)
    embed_dims=(32, 64, 128, 256),
    num_heads=(1, 2, 4, 8),
    num_groups=(1, 2, 4, 8),
    depths=(1, 1, 3, 1),
    d_model=256,
    encoder_layers=2,
    decoder_layers=2,
    attn_heads=8,
    ffn_dim=1024,
    vocab_size=16512,  # FallbackTokenizer ids: 10 + 0x4000
)

CROP = 64  # CaptionerConfig.crop_size (reference: util/utils.py:92)
MAX_T = 20  # CaptionerConfig.max_new_tokens (util/utils.py:115)


def caption_tokens(tokenizer) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-kind (decoder inputs [K,T], labels [K,T], mask [K,T])."""
    d = SYNTH_CAP_DIMS
    k = len(ICON_KINDS)
    labels = np.full((k, MAX_T), d.pad_token_id, np.int32)
    mask = np.zeros((k, MAX_T), np.float32)
    for i, kind in enumerate(ICON_KINDS):
        ids = tokenizer.encode(CAPTIONS[kind])  # [bos, chars..., eos]
        assert len(ids) <= MAX_T, (kind, len(ids))
        labels[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    dec_in = np.concatenate(
        [np.full((k, 1), d.decoder_start_token_id, np.int32), labels[:, :-1]],
        axis=1,
    )
    return dec_in, labels, mask


def build_dataset(n: int, seed: int, cache: bool = True):
    """(crops [n,64,64,3] u8, kind ids [n] i32).  Crops are the glyph box
    with detector-style jitter run through crop_resize_batch (the
    inference crop-gather)."""
    cache_path = f"/tmp/cap_data_s{seed}_n{n}_v{DATA_VERSION}.npz"
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["crops"], z["kinds"]
    rng = np.random.default_rng(seed)
    tile = 96
    tiles = np.zeros((n, tile, tile, 3), np.uint8)
    boxes = np.zeros((n, 4), np.float32)
    kinds = np.zeros((n,), np.int32)
    t0 = time.time()
    for i in range(n):
        img, kind, (x1, y1, x2, y2) = render_icon_tile(rng, tile=tile)
        tiles[i] = img
        kinds[i] = ICON_KINDS.index(kind)
        s = x2 - x1
        j = 0.1 * s  # detector-box jitter: +-10% of the glyph side
        boxes[i] = [
            max(x1 + rng.uniform(-j, j), 0) / tile,
            max(y1 + rng.uniform(-j, j), 0) / tile,
            min(x2 + rng.uniform(-j, j), tile) / tile,
            min(y2 + rng.uniform(-j, j), tile) / tile,
        ]
        if i and i % 5000 == 0:
            print(f"  cap data {i}/{n} ({time.time() - t0:.0f}s)", flush=True)

    # inference-path crop geometry, pinned to host CPU (data generation
    # must not ride the tunneled accelerator)
    from omniparser_tpu.ops.preprocess import crop_resize_batch

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        # NB: every array the CPU-compiled jit touches must be created
        # inside this context — a closure constant allocated on the live
        # (tunneled) accelerator backend deadlocks the transfer
        hw = jnp.asarray([tile, tile], jnp.int32)
        crop_one = jax.jit(
            jax.vmap(lambda im, b: crop_resize_batch(im, hw, b[None], CROP)[0])
        )
        crops = []
        for s0 in range(0, n, 2048):
            crops.append(np.asarray(crop_one(
                jnp.asarray(tiles[s0 : s0 + 2048]),
                jnp.asarray(boxes[s0 : s0 + 2048]),
            )))
    crops = np.clip(np.concatenate(crops), 0, 255).astype(np.uint8)
    if cache:
        np.savez(cache_path, crops=crops, kinds=kinds)
    return crops, kinds


def train_captioner(
    steps: int = 3000,
    batch: int = 128,
    lr: float = 3e-4,
    seed: int = 0,
    dataset_size: int = 40_000,
    log_every: int = 200,
    tail_avg: float = 0.3,
) -> Dict[str, Any]:
    """Returns trained {'params': ...} for Florence2(SYNTH_CAP_DIMS)."""
    from omniparser_tpu.train.train_ocr import _make_scan_runner

    tokenizer = load_tokenizer(None)
    prompt = np.asarray(tokenizer.encode(TASK_PROMPTS["<CAPTION>"]), np.int32)
    dec_in_k, labels_k, mask_k = caption_tokens(tokenizer)

    model = Florence2(dims=SYNTH_CAP_DIMS)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, CROP, CROP, 3), jnp.float32),
        jnp.zeros((1, len(prompt)), jnp.int32),
        jnp.zeros((1, MAX_T), jnp.int32),
    )
    params = variables["params"]

    warmup = min(300, steps // 2)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps, lr * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-4))
    opt_state = tx.init(params)

    # CLIP normalization matching FlorenceCaptioner.preprocess
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    prompt_dev = jnp.asarray(np.tile(prompt[None], (batch, 1)))
    dec_in_dev = jnp.asarray(dec_in_k)
    labels_dev = jnp.asarray(labels_k)
    mask_dev = jnp.asarray(mask_k)

    def loss_for(p, _stats, x, kind_ids):
        px = (x - mean) / std
        logits = model.apply({"params": p}, px, prompt_dev,
                             dec_in_dev[kind_ids])
        labels = labels_dev[kind_ids]
        mask = mask_dev[kind_ids]
        # label smoothing keeps the decode CALIBRATED: trained to zero
        # hard-CE loss the model emits logp ~ 0 for junk and glyph alike
        # (measured round 5), which makes the decode-confidence gate
        # (CaptionerConfig.min_logp) signal-free.  eps=0.1 caps the
        # achievable per-token log-prob near log(0.9), and off-manifold
        # crops land measurably below it.
        eps = 0.1
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits)
        onehot = jax.nn.one_hot(labels, v, dtype=logp.dtype)
        smoothed = onehot * (1.0 - eps) + eps / v
        ce = -(smoothed * logp).sum(-1)
        return (ce * mask).sum() / mask.sum(), _stats

    print(f"cap: generating {dataset_size} icon crops ...", flush=True)
    crops, kinds = build_dataset(dataset_size, seed + 1)
    print("cap: training ...", flush=True)
    run_chunk = _make_scan_runner(
        tx, loss_for, batch, dataset_size,
        lambda data, idx: (data[0][idx].astype(jnp.float32) / 255.0, data[1][idx]),
    )
    data_dev = (jnp.asarray(crops), jnp.asarray(kinds))
    del crops
    carry = (params, 0, opt_state, jax.random.PRNGKey(seed + 3))
    t0, done = time.time(), 0
    tail: list = []  # chunk-boundary snapshots for tail averaging
    while done < steps:
        n = min(log_every, steps - done)
        carry, losses = run_chunk(carry, data_dev, n)
        done += n
        l = np.asarray(losses)
        print(f"  cap step {done}/{steps} loss {l[-1]:.4f} "
              f"mean {l.mean():.4f} ({time.time() - t0:.0f}s)", flush=True)
        if tail_avg > 0 and done >= steps * (1.0 - tail_avg):
            tail.append(jax.device_get(carry[0]))
    if len(tail) > 1:
        # Polyak-style tail averaging over the last chunk snapshots:
        # run-to-run caption flips on borderline real crops (round-5:
        # the teams.png rail) trace to SGD noise in the final steps —
        # the average sits closer to the basin center than any endpoint
        print(f"cap: tail-averaging {len(tail)} snapshots", flush=True)
        return {"params": jax.tree.map(
            lambda *xs: np.mean(np.stack(xs), axis=0), *tail)}
    return {"params": jax.device_get(carry[0])}


def evaluate_captioner(cap_vars, n: int = 256, seed: int = 9200) -> Dict[str, float]:
    """Held-out exact-match caption accuracy via the inference decode."""
    tokenizer = load_tokenizer(None)
    prompt = np.asarray(tokenizer.encode(TASK_PROMPTS["<CAPTION>"]), np.int32)
    model = Florence2(dims=SYNTH_CAP_DIMS)
    crops, kinds = build_dataset(n, seed, cache=False)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    d = SYNTH_CAP_DIMS

    gen = jax.jit(partial(greedy_generate, model, max_new_tokens=MAX_T))
    correct = 0
    for s in range(0, n, 64):
        x = crops[s : s + 64].astype(np.float32) / 255.0
        px = (x - mean) / std
        pk = np.tile(prompt[None], (x.shape[0], 1))
        toks = np.asarray(gen(cap_vars, jnp.asarray(px), jnp.asarray(pk)))
        for j in range(toks.shape[0]):
            ids = [int(t) for t in toks[j]
                   if t not in (d.pad_token_id, d.eos_token_id, d.bos_token_id)]
            pred = tokenizer.decode(ids).strip()
            correct += pred == CAPTIONS[ICON_KINDS[kinds[s + j]]]
    return {"exact_match": correct / n, "n": n}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--data", type=int, default=40_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="omniparser_tpu/weights/cap_synth")
    args = p.parse_args(argv)

    from omniparser_tpu.weights.checkpoints import save_checkpoint

    cap_vars = {"params": train_captioner(
        args.steps, args.batch, seed=args.seed, dataset_size=args.data
    )["params"]}
    report = evaluate_captioner(cap_vars)
    print("cap eval:", report, flush=True)

    path = save_checkpoint(args.out, {"cap": cap_vars})
    with open(os.path.join(args.out, "dims.json"), "w") as f:
        json.dump(dataclasses.asdict(SYNTH_CAP_DIMS), f)
    print(f"saved {path}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
