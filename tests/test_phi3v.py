"""Phi-3-Vision-class captioner: generation protocol + converter round-trip.

Reference path: get_parsed_content_icon_phi3v (util/utils.py:126-176) —
batches of 5, left-padded prompt, greedy max_new_tokens=25.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.phi3v import (
    TINY_PHI3V,
    Phi3V,
    Phi3VCaptioner,
    phi3v_generate,
)


@pytest.fixture(scope="module")
def tiny_captioner():
    return Phi3VCaptioner(CaptionerConfig(max_new_tokens=6), dims=TINY_PHI3V,
                          batch_size=2)


def test_caption_crops_protocol(tiny_captioner, rng):
    crops = jnp.asarray(
        rng.integers(0, 255, (3, 64, 64, 3)).astype(np.float32))
    valid = np.array([True, True, False])
    texts = tiny_captioner.caption_crops(crops, valid)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
    # greedy is deterministic
    assert texts == tiny_captioner.caption_crops(crops, valid)
    # batch padding must not change results: 3 crops pad to 2 batches of 2
    texts_all = tiny_captioner.caption_crops(crops, np.array([True] * 3))
    assert texts_all[:2] == texts


def test_generate_stops_at_eos(tiny_captioner):
    """Tokens after eos/end must be pad (done-masking in the scan)."""
    d = TINY_PHI3V
    px = tiny_captioner.preprocess(jnp.zeros((1, 64, 64, 3), jnp.float32))
    toks = np.asarray(phi3v_generate(
        tiny_captioner.model, tiny_captioner.params, px,
        tiny_captioner.prefix_ids, tiny_captioner.suffix_ids,
        max_new_tokens=8))[0]
    seen_stop = False
    for t in toks:
        if seen_stop:
            assert int(t) == d.pad_token_id
        if int(t) in (d.eos_token_id, d.end_token_id):
            seen_stop = True


def _synth_hf_state_dict(rng):
    """HF-style phi-3-vision state dict at TINY dims."""
    d = TINY_PHI3V
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32) * 0.05

    add("model.embed_tokens.weight", d.vocab_size, d.lm_width)
    add("model.norm.weight", d.lm_width)
    add("lm_head.weight", d.vocab_size, d.lm_width)
    for i in range(d.lm_layers):
        p = f"model.layers.{i}."
        add(p + "self_attn.qkv_proj.weight", 3 * d.lm_width, d.lm_width)
        add(p + "self_attn.o_proj.weight", d.lm_width, d.lm_width)
        add(p + "mlp.gate_up_proj.weight", 2 * d.lm_mlp, d.lm_width)
        add(p + "mlp.down_proj.weight", d.lm_width, d.lm_mlp)
        add(p + "input_layernorm.weight", d.lm_width)
        add(p + "post_attention_layernorm.weight", d.lm_width)
        sd[p + "self_attn.rotary_emb.inv_freq"] = np.zeros(2, np.float32)  # skipped
    v = "model.vision_embed_tokens.img_processor.vision_model."
    n_pos = (d.image_size // d.patch_size) ** 2 + 1
    add(v + "embeddings.class_embedding", d.vision_width)
    add(v + "embeddings.position_embedding.weight", n_pos, d.vision_width)
    add(v + "embeddings.patch_embedding.weight",
        d.vision_width, 3, d.patch_size, d.patch_size)
    add(v + "pre_layrnorm.weight", d.vision_width)
    add(v + "pre_layrnorm.bias", d.vision_width)
    add(v + "post_layernorm.weight", d.vision_width)  # skipped by design
    add(v + "post_layernorm.bias", d.vision_width)
    for i in range(d.vision_layers):
        p = v + f"encoder.layers.{i}."
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add(p + f"self_attn.{name}.weight", d.vision_width, d.vision_width)
            add(p + f"self_attn.{name}.bias", d.vision_width)
        for name in ("layer_norm1", "layer_norm2"):
            add(p + f"{name}.weight", d.vision_width)
            add(p + f"{name}.bias", d.vision_width)
        add(p + "mlp.fc1.weight", d.vision_mlp, d.vision_width)
        add(p + "mlp.fc1.bias", d.vision_mlp)
        add(p + "mlp.fc2.weight", d.vision_width, d.vision_mlp)
        add(p + "mlp.fc2.bias", d.vision_width)
    # projector input is the 2x2-merged 4C features (HD transform base
    # unit; see weights/manifests/phi3v_vision_prefix.json: [3072, 4096])
    add("model.vision_embed_tokens.img_projection.0.weight", d.lm_width, 4 * d.vision_width)
    add("model.vision_embed_tokens.img_projection.0.bias", d.lm_width)
    add("model.vision_embed_tokens.img_projection.2.weight", d.lm_width, d.lm_width)
    add("model.vision_embed_tokens.img_projection.2.bias", d.lm_width)
    add("model.vision_embed_tokens.glb_GN", 1, 1, d.lm_width)  # skipped
    add("model.vision_embed_tokens.sub_GN", 1, 1, 1, d.lm_width)  # skipped
    return sd


def test_convert_phi3v_round_trip(rng):
    from omniparser_tpu.weights.convert_phi3v import convert_phi3v_state_dict
    from omniparser_tpu.weights.convert_yolo import _check_tree_shapes

    sd = _synth_hf_state_dict(rng)
    variables, unmatched = convert_phi3v_state_dict(sd, TINY_PHI3V)
    assert unmatched == [], unmatched

    d = TINY_PHI3V
    model = Phi3V(dims=d)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, d.image_size, d.image_size, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        None, method=Phi3V.forward_prompt))
    _check_tree_shapes(ref, variables)

    # value spot checks: linear transpose, conv HWIO, embeddings verbatim
    np.testing.assert_allclose(
        variables["params"]["layers_0"]["qkv_proj"]["kernel"],
        sd["model.layers.0.self_attn.qkv_proj.weight"].T)
    np.testing.assert_allclose(
        variables["params"]["vision"]["patch_embedding"]["kernel"],
        np.transpose(
            sd["model.vision_embed_tokens.img_processor.vision_model."
               "embeddings.patch_embedding.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        variables["params"]["embed_tokens"]["embedding"],
        sd["model.embed_tokens.weight"])

    # converted params must actually run, and two different checkpoints
    # must generate differently (weights land in functional positions)
    cap = Phi3VCaptioner(CaptionerConfig(max_new_tokens=5), dims=d,
                         params=variables, batch_size=2)
    crops = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)).astype(np.float32))
    t1 = cap.caption_crops(crops, np.array([True, True]))
    sd2 = _synth_hf_state_dict(np.random.default_rng(7))
    variables2, _ = convert_phi3v_state_dict(sd2, d)
    cap2 = Phi3VCaptioner(CaptionerConfig(max_new_tokens=5), dims=d,
                          params=variables2, batch_size=2)
    t2 = cap2.caption_crops(crops, np.array([True, True]))
    assert t1 != t2


def test_get_parsed_content_icon_phi3v_compat(tiny_captioner, rng):
    """Reference signature (util/utils.py:126): first len(ocr_bbox) boxes
    are OCR and skipped; remaining are cropped and captioned."""
    from omniparser_tpu.compat import get_parsed_content_icon_phi3v

    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    boxes = np.array([
        [0.0, 0.0, 0.4, 0.3],   # ocr box (skipped)
        [0.1, 0.1, 0.6, 0.6],
        [0.5, 0.4, 0.9, 0.9],
    ], np.float32)
    texts = get_parsed_content_icon_phi3v(boxes, [[0, 0, 51, 28]], img,
                                          tiny_captioner)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
    # no ocr boxes -> all captioned
    texts_all = get_parsed_content_icon_phi3v(boxes, None, img, tiny_captioner)
    assert len(texts_all) == 3


def test_get_caption_model_processor_phi3v_dispatch(monkeypatch):
    """'phi3_v' model_name selects the Phi3VCaptioner (util/utils.py:449)."""
    import omniparser_tpu.compat as compat
    from omniparser_tpu.models import phi3v as phi3v_mod

    built = {}

    class FakeCap:
        def __init__(self, cfg, **kw):
            built["cfg"] = cfg

    monkeypatch.setattr(phi3v_mod, "Phi3VCaptioner", FakeCap)
    cap = compat.get_caption_model_processor("phi3_v")
    assert isinstance(cap, FakeCap)
    assert built["cfg"].max_new_tokens == 25  # utils.py:166
