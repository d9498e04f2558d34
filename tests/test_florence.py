import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.florence2 import (
    BASE,
    DaViT,
    Florence2,
    Florence2VisionEncoder,
    FlorenceCaptioner,
    FlorenceDims,
    greedy_generate,
)
from omniparser_tpu.models.tokenizer import ByteLevelBPE, FallbackTokenizer, load_tokenizer

TINY = FlorenceDims(
    embed_dims=(8, 16, 32, 64),
    num_heads=(1, 2, 4, 8),
    num_groups=(1, 2, 4, 8),
    depths=(1, 1, 1, 1),
    window_size=4,
    d_model=32,
    encoder_layers=2,
    decoder_layers=2,
    attn_heads=4,
    ffn_dim=64,
    vocab_size=100,
    max_positions=64,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = Florence2(dims=TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, 3), jnp.int32),
    )
    return model, params


def test_davit_shapes():
    davit = DaViT(dims=TINY)
    params = davit.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    out = davit.apply(params, jnp.zeros((2, 32, 32, 3)))
    # 32px / 32 total stride -> 1x1 tokens at dim 64
    assert out.shape == (2, 1, 64)
    out = davit.apply(params, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 4, 64)


def test_vision_encoder_token_layout():
    enc = Florence2VisionEncoder(dims=TINY)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = enc.apply(params, jnp.zeros((3, 64, 64, 3)))
    # 2x2 spatial tokens + 1 pooled token, projected to d_model
    assert out.shape == (3, 5, TINY.d_model)


def test_teacher_forced_forward(tiny_model):
    model, params = tiny_model
    logits = model.apply(
        params,
        jnp.zeros((2, 32, 32, 3), jnp.float32),
        jnp.ones((2, 4), jnp.int32),
        jnp.ones((2, 5), jnp.int32),
    )
    assert logits.shape == (2, 5, TINY.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_greedy_matches_teacher_forced(tiny_model):
    """KV-cache incremental decode must reproduce teacher-forced logits."""
    model, params = tiny_model
    px = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    prompt = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    T = 6
    tokens = greedy_generate(model, params, px, prompt, max_new_tokens=T)
    assert tokens.shape == (1, T)

    # teacher-forced re-run over the generated prefix must yield the same
    # argmax at every step (exact cache correctness)
    dec_in = jnp.concatenate(
        [jnp.full((1, 1), TINY.decoder_start_token_id, jnp.int32), tokens[:, :-1]], axis=1
    )
    logits = model.apply(params, px, prompt, dec_in)
    tf_argmax = np.asarray(jnp.argmax(logits, -1))[0]
    gen = np.asarray(tokens)[0]
    for t in range(T):
        if gen[t] == TINY.pad_token_id:
            break  # post-eos padding
        assert tf_argmax[t] == gen[t], f"step {t}: {tf_argmax[t]} != {gen[t]}"


def test_generate_stops_at_eos(tiny_model):
    model, params = tiny_model
    px = jnp.zeros((2, 32, 32, 3), jnp.float32)
    prompt = jnp.ones((2, 4), jnp.int32)
    tokens = np.asarray(greedy_generate(model, params, px, prompt, max_new_tokens=8))
    for row in tokens:
        seen_eos = False
        for t in row:
            if seen_eos:
                assert t == TINY.pad_token_id
            if t == TINY.eos_token_id:
                seen_eos = True


def test_captioner_end_to_end():
    cfg = CaptionerConfig(crop_size=32, max_new_tokens=5, batch_size=4)
    cap = FlorenceCaptioner(cfg, dims=TINY)
    crops = jnp.zeros((4, 32, 32, 3), jnp.float32)
    valid = np.array([True, True, False, True])
    out = cap.caption_crops(crops, valid)
    assert len(out) == 3
    assert all(isinstance(s, str) for s in out)


def test_fallback_tokenizer_roundtrip():
    tok = FallbackTokenizer()
    ids = tok.encode("Hello, world!")
    assert ids[0] == tok.bos and ids[-1] == tok.eos
    assert tok.decode(ids) == "Hello, world!"


def test_byte_level_bpe_known_vocab(tmp_path):
    # tiny handcrafted vocab: merges 'he' then 'hel'
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
             "h": 4, "e": 5, "l": 6, "o": 7, "he": 8, "hel": 9, "Ġ": 10}
    merges = [("h", "e"), ("he", "l")]
    tok = ByteLevelBPE(vocab, merges)
    ids = tok.encode("hello", add_special=False)
    assert ids == [9, 6, 7]  # hel + l + o
    assert tok.decode([0, 9, 6, 7, 2]) == "hello"


def test_load_tokenizer_fallback():
    assert isinstance(load_tokenizer(None), FallbackTokenizer)
    assert isinstance(load_tokenizer("/nonexistent"), FallbackTokenizer)
