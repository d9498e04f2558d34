"""Sharded joint train step: icon-detector fine-tune + captioner fine-tune.

One jitted step over a ('dp', 'tp') mesh: batch sharded over dp, captioner
matmul params sharded over tp (GSPMD tensor parallelism via in_shardings —
see parallel/mesh.py).  This is the graph `__graft_entry__.dryrun_multichip`
compiles on an N-device mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from omniparser_tpu.models.florence2 import Florence2, FlorenceDims
from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.parallel.mesh import batch_sharding, replicated, shard_params_fsdp_tp
from omniparser_tpu.train.losses import caption_loss, detection_loss


@dataclasses.dataclass
class TrainState:
    detector: Detector
    florence: Florence2
    params: Dict[str, Any]  # {'det': variables, 'cap': variables}
    opt_state: Any
    tx: optax.GradientTransformation
    imgsz: int


def make_train_state(
    imgsz: int = 160,
    florence_dims: FlorenceDims | None = None,
    learning_rate: float = 1e-4,
    rng: jax.Array | None = None,
    fast_init: bool = False,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    detector = Detector(variant="n", num_classes=1, imgsz=imgsz)
    dims = florence_dims or FlorenceDims(
        embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8), num_groups=(1, 2, 4, 8),
        depths=(1, 1, 1, 1), window_size=4, d_model=32, encoder_layers=2,
        decoder_layers=2, attn_heads=4, ffn_dim=64, vocab_size=128, max_positions=64,
    )
    florence = Florence2(dims=dims)
    if fast_init:
        # Skip the init-graph compiles entirely: size the param trees with
        # eval_shape and fill them host-side.  Values only need to keep the
        # first loss finite (dryrun/compile-check use), not train well.
        det_vars = _materialize_shapes(
            jax.eval_shape(
                lambda r: detector.module.init(r, jnp.zeros((1, 64, 64, 3)), train=False),
                k1,
            )
        )
        cap_vars = _materialize_shapes(
            jax.eval_shape(
                lambda r: florence.init(
                    r, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 3), jnp.int32),
                ),
                k2,
            )
        )
    else:
        det_vars = detector.init_params(k1)
        cap_vars = florence.init(
            k2, jnp.zeros((1, 32, 32, 3), jnp.float32), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 3), jnp.int32),
        )
    params = {"det": det_vars, "cap": cap_vars}
    tx = optax.adamw(learning_rate)
    trainable = _trainable(params)
    return TrainState(detector, florence, params, tx.init(trainable), tx, imgsz)


def _materialize_shapes(shape_tree):
    """Host-side fill of an eval_shape tree: ones for norm scales/variances
    (keeps normalization well-conditioned), zeros for ints, small normals
    elsewhere.  No XLA compile involved."""
    import numpy as np

    host_rng = np.random.default_rng(0)

    def fill(path, sd):
        name = str(path[-1])
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return jnp.zeros(sd.shape, sd.dtype)
        if "var" in name or "scale" in name:
            return jnp.ones(sd.shape, sd.dtype)
        return jnp.asarray(host_rng.normal(0.0, 0.02, sd.shape), sd.dtype)

    return jax.tree_util.tree_map_with_path(fill, shape_tree)


def _trainable(params):
    """Gradients flow to 'params' collections only (batch_stats update via
    mutable apply)."""
    return {"det": params["det"]["params"], "cap": params["cap"]["params"]}


def make_synthetic_batch(rng, batch: int, imgsz: int, max_gt: int = 8,
                         crop: int = 32, prompt_len: int = 4, cap_len: int = 6):
    """Tiny synthetic batch exercising both objectives."""
    ks = jax.random.split(rng, 6)
    xy = jax.random.uniform(ks[0], (batch, max_gt, 2), minval=0.05, maxval=0.6)
    wh = jax.random.uniform(ks[1], (batch, max_gt, 2), minval=0.05, maxval=0.3)
    return {
        "images": jax.random.uniform(ks[2], (batch, imgsz, imgsz, 3)),
        "gt_boxes": jnp.concatenate([xy, xy + wh], axis=-1),
        "gt_mask": jnp.ones((batch, max_gt), bool),
        "crops": jax.random.uniform(ks[3], (batch, crop, crop, 3)),
        "prompt_ids": jax.random.randint(ks[4], (batch, prompt_len), 4, 100),
        "caption_ids": jax.random.randint(ks[5], (batch, cap_len), 4, 100),
    }


def loss_fn(trainable, state: TrainState, batch, det_stats, cap_stats):
    det_vars = {"params": trainable["det"], "batch_stats": det_stats}
    outs, det_mut = state.detector.module.apply(
        det_vars, batch["images"], train=True, mutable=["batch_stats"]
    )
    det_l = detection_loss(outs, batch["gt_boxes"], batch["gt_mask"], state.imgsz)

    cap_vars = {"params": trainable["cap"], **{k: v for k, v in cap_stats.items()}}
    dec_in = jnp.concatenate(
        [jnp.full_like(batch["caption_ids"][:, :1], 2), batch["caption_ids"][:, :-1]], axis=1
    )
    logits = state.florence.apply(cap_vars, batch["crops"], batch["prompt_ids"], dec_in)
    cap_l = caption_loss(logits, batch["caption_ids"])
    return det_l + cap_l, (det_l, cap_l, det_mut["batch_stats"])


def train_step(state: TrainState, batch):
    """One SGD step; pure function of (trainable params, opt_state, batch).
    Jit externally with shardings (see dryrun_multichip)."""
    trainable = _trainable(state.params)
    det_stats = state.params["det"]["batch_stats"]
    cap_stats = {k: v for k, v in state.params["cap"].items() if k != "params"}
    (loss, (det_l, cap_l, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, state, batch, det_stats, cap_stats
    )
    updates, new_opt = state.tx.update(grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)
    new_params = {
        "det": {"params": new_trainable["det"], "batch_stats": new_stats},
        "cap": {**state.params["cap"], "params": new_trainable["cap"]},
    }
    metrics = {"loss": loss, "det_loss": det_l, "cap_loss": cap_l}
    return new_params, new_opt, metrics


def make_sharded_train_step(state: TrainState, mesh):
    """jit train_step with dp batch sharding + tp param sharding."""
    param_sh = jax.tree.map(lambda _: replicated(mesh), _trainable(state.params))
    param_sh["cap"] = shard_params_fsdp_tp(_trainable(state.params)["cap"], mesh)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(params, opt_state, batch):
        st = dataclasses.replace(state, params=params, opt_state=opt_state)
        return train_step(st, batch)

    full_param_sh = {
        "det": jax.tree.map(lambda _: rep, state.params["det"]),
        "cap": {
            "params": param_sh["cap"],
            **{k: jax.tree.map(lambda _: rep, v)
               for k, v in state.params["cap"].items() if k != "params"},
        },
    }
    batch_sh = jax.tree.map(lambda _: bs, make_synthetic_batch(jax.random.PRNGKey(0), mesh.shape["dp"], state.imgsz))
    opt_sh = jax.tree.map(lambda _: rep, state.opt_state)
    return jax.jit(
        step,
        in_shardings=(full_param_sh, opt_sh, batch_sh),
        out_shardings=(full_param_sh, opt_sh, jax.tree.map(lambda _: rep, {"loss": 0, "det_loss": 0, "cap_loss": 0})),
    )
