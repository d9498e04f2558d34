import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniparser_tpu.parallel.mesh import make_mesh, shard_params_fsdp_tp
from omniparser_tpu.train.losses import _ciou, caption_loss, detection_loss
from omniparser_tpu.train.train_step import (
    make_sharded_train_step,
    make_synthetic_batch,
    make_train_state,
    train_step,
    _trainable,
)


def test_ciou_perfect_match():
    b = jnp.asarray([[0.1, 0.1, 0.5, 0.5]])
    assert float(_ciou(b, b)[0]) == pytest.approx(1.0, abs=1e-5)


def test_ciou_disjoint_negative():
    a = jnp.asarray([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.asarray([[0.8, 0.8, 0.9, 0.9]])
    assert float(_ciou(a, b)[0]) < 0.0


def test_caption_loss_masks_padding():
    logits = jnp.zeros((1, 3, 10))
    labels_all_pad = jnp.full((1, 3), 1)
    labels_mixed = jnp.asarray([[4, 5, 1]])
    # uniform logits -> loss = log(10) over non-pad positions
    assert float(caption_loss(logits, labels_mixed)) == pytest.approx(np.log(10), abs=1e-5)
    assert float(caption_loss(logits, labels_all_pad)) == 0.0


def test_detection_loss_decreases_with_training():
    """A few SGD steps on a fixed tiny batch must reduce the joint loss —
    end-to-end gradient sanity through both models."""
    state = make_train_state(imgsz=64)
    batch = make_synthetic_batch(jax.random.PRNGKey(3), batch=2, imgsz=64)
    import dataclasses

    jitted = jax.jit(lambda p, o, b: train_step(dataclasses.replace(state, params=p, opt_state=o), b))
    params, opt = state.params, state.opt_state
    first = None
    for i in range(5):
        params, opt, metrics = jitted(params, opt, batch)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first, f"loss did not decrease: {first} -> {loss}"


def test_sharded_train_step_8_devices():
    """The dryrun contract: dp=4 x tp=2 mesh on 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=4, tp=2)
    state = make_train_state(imgsz=64)
    step = make_sharded_train_step(state, mesh)
    batch = make_synthetic_batch(jax.random.PRNGKey(0), batch=4, imgsz=64)
    params, opt, metrics = step(state.params, state.opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # captioner kernels actually sharded over tp
    sh = shard_params_fsdp_tp(_trainable(state.params)["cap"], mesh)
    specs = [s.spec for s in jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))]
    assert any("tp" in str(s) for s in specs)
