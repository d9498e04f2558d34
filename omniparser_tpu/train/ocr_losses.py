"""OCR training objectives: text-detector segmentation loss + CTC.

Completes the training subsystem for every model family in the stack (the
reference ships pre-trained OCR via easyocr/paddle and never trains —
SURVEY.md §5); these let the DBNet-class detector and CTC recognizer be
fine-tuned on GUI text natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def balanced_bce_dice_loss(
    prob_map: jnp.ndarray,  # [B, H, W, 1] sigmoid outputs
    target: jnp.ndarray,  # [B, H, W] {0,1}
    neg_ratio: float = 3.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """DBNet-family shrink-map loss: hard-negative-mined BCE + dice.

    Fixed-shape OHEM: instead of top-k negative selection (dynamic), use
    the standard soft variant — weight negatives by their loss rank proxy
    (probability), normalized so negatives contribute ~neg_ratio x the
    positive count.
    """
    p = prob_map[..., 0]
    t = target.astype(jnp.float32)
    bce = -(t * jnp.log(p + eps) + (1 - t) * jnp.log(1 - p + eps))

    n_pos = t.sum() + eps
    # hardest negatives get the most weight; total negative mass ~ 3x pos
    neg_weight = jnp.where(t == 0, p, 0.0)
    neg_weight = neg_weight / (neg_weight.sum() + eps) * neg_ratio * n_pos
    weights = t + neg_weight
    bce_l = (bce * weights).sum() / (weights.sum() + eps)

    inter = (p * t).sum()
    dice_l = 1.0 - 2.0 * inter / (p.sum() + t.sum() + eps)
    return bce_l + dice_l


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, C] (blank = class 0)
    labels: jnp.ndarray,  # [B, L] int32, 0-padded
) -> jnp.ndarray:
    """Mean CTC negative log likelihood (optax.ctc_loss; blank id 0,
    matching models/ocr.CHARSET's layout)."""
    b, t, _ = logits.shape
    logit_pad = jnp.zeros((b, t), jnp.float32)
    label_pad = (labels == 0).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad, labels, label_pad)
    return per_seq.mean()
