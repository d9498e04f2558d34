import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from omniparser_tpu.models.ocr import CHARSET, TextDetector, TextRecognizer
from omniparser_tpu.train.ocr_losses import balanced_bce_dice_loss, ctc_loss


def test_bce_dice_perfect_prediction():
    t = np.zeros((1, 16, 16), np.float32)
    t[0, 4:8, 4:12] = 1
    p_perfect = jnp.asarray(t)[..., None] * 0.998 + 0.001
    p_bad = jnp.asarray(1 - t)[..., None] * 0.998 + 0.001
    good = float(balanced_bce_dice_loss(p_perfect, jnp.asarray(t)))
    bad = float(balanced_bce_dice_loss(p_bad, jnp.asarray(t)))
    assert good < 0.1 < bad


def test_ctc_loss_prefers_correct_alignment():
    # sequence "ab" over 6 steps; peaked logits on a correct CTC path
    a = CHARSET.index("a") + 1
    b = CHARSET.index("b") + 1
    T, C = 6, len(CHARSET) + 1
    good = np.full((1, T, C), -5.0, np.float32)
    for t, c in enumerate([0, a, 0, b, 0, 0]):
        good[0, t, c] = 5.0
    wrong = np.full((1, T, C), -5.0, np.float32)
    for t in range(T):
        wrong[0, t, 0] = 5.0  # all blank
    labels = np.zeros((1, 4), np.int32)
    labels[0, :2] = [a, b]
    assert float(ctc_loss(jnp.asarray(good), jnp.asarray(labels))) < float(
        ctc_loss(jnp.asarray(wrong), jnp.asarray(labels))
    )


def test_ocr_models_train_end_to_end(rng):
    """A few SGD steps reduce the joint det+rec loss on a fixed batch."""
    det = TextDetector(width=8)
    rec = TextRecognizer(width=16, layers=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    det_vars = det.init(k1, jnp.zeros((1, 32, 32, 3)), train=False)
    rec_vars = rec.init(k2, jnp.zeros((1, 32, 64, 3)), train=False)

    imgs = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    # detector predicts at 1/2 scale (TextDetector.out_scale=2): 32 -> 16
    seg_target = jnp.zeros((2, 16, 16)).at[:, 4:10, 2:14].set(1.0)
    lines = jnp.asarray(rng.random((2, 32, 64, 3)), jnp.float32)
    labels = jnp.asarray([[1, 2, 0, 0], [3, 4, 5, 0]], jnp.int32)

    params = {"det": det_vars["params"], "rec": rec_vars["params"]}
    stats = {"det": det_vars["batch_stats"], "rec": rec_vars["batch_stats"]}
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_fn(p):
            prob, det_mut = det.apply(
                {"params": p["det"], "batch_stats": stats["det"]},
                imgs, train=True, mutable=["batch_stats"],
            )
            l1 = balanced_bce_dice_loss(prob, seg_target)
            logits, rec_mut = rec.apply(
                {"params": p["rec"], "batch_stats": stats["rec"]},
                lines, train=True, mutable=["batch_stats"],
            )
            l2 = ctc_loss(logits, labels)
            return l1 + l2, (det_mut["batch_stats"], rec_mut["batch_stats"])

        (loss, (ds, rs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), {"det": ds, "rec": rs}, opt, loss

    first = None
    for i in range(6):
        params, stats, opt, loss = step(params, stats, opt)
        loss = float(loss)
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first, f"{first} -> {loss}"
