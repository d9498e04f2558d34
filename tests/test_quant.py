"""Weight-only int8 decode quantization (models/quant.py).

Numeric bounds at the op level, tree-rewrite structural checks, and a
greedy-caption exact-match gate on the shipped trained checkpoint — the
quantized path must not change what the captioner says.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.florence2 import Florence2, FlorenceCaptioner, FlorenceDims
from omniparser_tpu.models.quant import (
    QDense,
    quantize_columns,
    quantize_florence_params,
    quantize_rows,
)

TINY = FlorenceDims(
    embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
    num_groups=(1, 2, 4, 8), depths=(1, 1, 1, 1), d_model=32,
    encoder_layers=1, decoder_layers=2, attn_heads=4, ffn_dim=64,
    vocab_size=512, pos_embed_grid=50,
)

CAP_SYNTH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "omniparser_tpu", "weights", "cap_synth",
)


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.08, (96, 64)).astype(np.float32)
    q, s = quantize_columns(w)
    assert q.dtype == jnp.int8 and s.shape == (64,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    # symmetric int8: worst-case error is half a quantization step per entry
    assert np.max(np.abs(deq - w)) <= 0.5 * np.max(np.asarray(s)) + 1e-7

    qr, sr = quantize_rows(w.T)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(q).T)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(s))


def test_qdense_matches_dense():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.08, (48, 32)).astype(np.float32)
    b = rng.normal(0, 0.02, (32,)).astype(np.float32)
    x = rng.normal(0, 1.0, (5, 48)).astype(np.float32)

    ref = nn.Dense(32, dtype=jnp.bfloat16).apply(
        {"params": {"kernel": w, "bias": b}}, x
    )
    q, s = quantize_columns(w)
    got = QDense(32, dtype=jnp.bfloat16).apply(
        {"params": {"kernel": q, "scale": s, "bias": b}}, x
    )
    assert got.dtype == jnp.bfloat16
    # int8 weight error (~0.4% of |w|max/col) + bf16 rounding
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert np.max(err) < 0.05 * np.abs(np.asarray(ref)).max() + 0.05


def _init_fp(dims, crop=16, prompt_len=3):
    model = Florence2(dims=dims)
    return model, jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, crop, crop, 3), jnp.float32),
        jnp.zeros((1, prompt_len), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
    )


def test_quantized_tree_structure_and_logits():
    fp_model, fp_vars = _init_fp(TINY)
    q_vars = quantize_florence_params(fp_vars)
    lm = q_vars["params"]["language_model"]
    assert lm["lm_head_kernel"].dtype == jnp.int8
    assert lm["lm_head_scale"].shape == (TINY.vocab_size,)
    for i in range(TINY.decoder_layers):
        layer = lm[f"decoder_layer{i}"]
        assert layer["fc1"]["kernel"].dtype == jnp.int8
        assert layer["self_attn"]["q_proj"]["scale"].shape == (TINY.d_model,)
    # encoder + vision untouched (run once per generate; compute-bound)
    assert lm["encoder_layer0"]["fc1"]["kernel"].dtype != jnp.int8
    # fp32 embedding table dropped: lookups read the int8 head table
    assert "shared" not in lm
    # input tree not mutated
    assert fp_vars["params"]["language_model"]["decoder_layer0"]["fc1"][
        "kernel"
    ].dtype == jnp.float32
    assert "shared" in fp_vars["params"]["language_model"]

    q_model = Florence2(dims=TINY, quant=True)
    px = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    prompt = jnp.asarray([[3, 4, 5], [6, 7, 1]], jnp.int32)
    dec = jnp.asarray([[2, 3], [2, 4]], jnp.int32)
    ref = np.asarray(fp_model.apply(fp_vars, px, prompt, dec))
    got = np.asarray(q_model.apply(q_vars, px, prompt, dec))
    assert got.shape == ref.shape
    # normalized logit error stays small (random-init nets; the trained-
    # checkpoint gate below checks the decisions that actually matter)
    denom = np.std(ref) + 1e-6
    assert np.max(np.abs(got - ref)) / denom < 0.35
    assert np.mean(np.abs(got - ref)) / denom < 0.05


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(CAP_SYNTH, "dims.json")),
    reason="shipped cap_synth checkpoint not present",
)
def test_quant_captioner_caption_exact_match():
    from omniparser_tpu.train.synth_gui import ICON_KINDS
    from omniparser_tpu.train.train_captioner import CAPTIONS, build_dataset

    crops_u8, kinds = build_dataset(24, seed=11, cache=False)
    crops = jnp.asarray(crops_u8, jnp.float32)
    valid = np.ones(len(crops), bool)

    fp = FlorenceCaptioner.from_synth_checkpoint(
        CAP_SYNTH, CaptionerConfig(batch_size=24)
    )
    q8 = FlorenceCaptioner.from_synth_checkpoint(
        CAP_SYNTH, CaptionerConfig(batch_size=24, quant="int8")
    )
    ref = fp.caption_crops(crops, valid)
    got = q8.caption_crops(crops, valid)
    match = sum(a == b for a, b in zip(ref, got)) / len(ref)
    assert match >= 0.95, (match, list(zip(ref, got))[:6])
    # and the fp path itself is right (trained checkpoint reads glyphs)
    acc = sum(
        r == CAPTIONS[ICON_KINDS[k]] for r, k in zip(ref, kinds)
    ) / len(ref)
    assert acc >= 0.9
