"""Synthetic-glyph captioner plumbing: caption/token budget, dataset
shapes, and the from_synth_checkpoint load path (orbax + dims.json)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.florence2 import Florence2, FlorenceCaptioner, FlorenceDims
from omniparser_tpu.models.tokenizer import load_tokenizer
from omniparser_tpu.train.train_captioner import (
    CAPTIONS,
    MAX_T,
    SYNTH_CAP_DIMS,
    build_dataset,
    caption_tokens,
)
from omniparser_tpu.train.synth_gui import ICON_KINDS

TINY = FlorenceDims(
    embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
    num_groups=(1, 2, 4, 8), depths=(1, 1, 1, 1), d_model=32,
    encoder_layers=1, decoder_layers=1, attn_heads=4, ffn_dim=64,
    vocab_size=16512, pos_embed_grid=50,
)


def test_captions_fit_token_budget():
    tok = load_tokenizer(None)
    assert set(CAPTIONS) == set(ICON_KINDS)
    dec_in, labels, mask = caption_tokens(tok)
    assert dec_in.shape == labels.shape == (len(ICON_KINDS), MAX_T)
    # every caption decodes back through the inference-path strip
    d = SYNTH_CAP_DIMS
    for i, kind in enumerate(ICON_KINDS):
        ids = [int(t) for t in labels[i]
               if t not in (d.pad_token_id, d.eos_token_id, d.bos_token_id)]
        assert tok.decode(ids).strip() == CAPTIONS[kind]


def test_build_dataset_shapes():
    crops, kinds = build_dataset(32, seed=5, cache=False)
    assert crops.shape == (32, 64, 64, 3) and crops.dtype == np.uint8
    assert kinds.shape == (32,) and set(kinds) <= set(range(len(ICON_KINDS)))
    assert crops.std() > 1.0  # actual content, not blank


def test_from_synth_checkpoint_roundtrip(tmp_path):
    from omniparser_tpu.weights.checkpoints import save_checkpoint

    cfg = CaptionerConfig(batch_size=4, crop_size=32, max_new_tokens=4)
    tok = load_tokenizer(None)
    prompt = tok.encode("What does the image describe?")
    model = Florence2(dims=TINY)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32),
        jnp.zeros((1, len(prompt)), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
    )
    path = str(tmp_path / "cap")
    save_checkpoint(path, {"cap": jax.tree.map(np.asarray, variables)})
    with open(os.path.join(path, "dims.json"), "w") as f:
        json.dump(dataclasses.asdict(TINY), f)

    cap = FlorenceCaptioner.from_synth_checkpoint(path, cfg)
    assert cap.dims == TINY
    # loaded params match what was saved
    leaves_a = jax.tree.leaves(jax.tree.map(np.asarray, variables))
    leaves_b = jax.tree.leaves(jax.tree.map(np.asarray, cap.params))
    assert all(np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b))
    # and drive the pipeline captioner interface end to end
    crops = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)), jnp.float32
    )
    out = cap.caption_crops(crops, np.array([True, True, False, True]))
    assert len(out) == 3 and all(isinstance(s, str) for s in out)
