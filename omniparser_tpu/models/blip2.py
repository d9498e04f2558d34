"""BLIP-2-class captioner: EVA-ViT-g + Q-Former + OPT, TPU-first.

The reference's alternative caption model (util/utils.py:50-60 loads
Salesforce/blip2-opt-2.7b; generation at util/utils.py:117: prompt
"The image shows", max_length=100, num_beams=5, no_repeat_ngram_size=2,
early_stopping).  From-scratch Flax implementation of the architecture
family:

  * EVA-CLIP ViT vision tower — pre-LN blocks, packed-QKV attention,
    class token + learned positions;
  * Q-Former — BERT-family (post-LN) layers over 32 learned query tokens
    with cross-attention to image features every `cross_frequency` layers;
  * OPT decoder — pre-LN, ReLU FFN, learned positions with the +2 offset,
    tied LM head — consuming [projected queries ++ prompt embeds];
  * beam decoding via models/generate.beam_search (one jitted scan,
    KV-cache beam reorder, bigram ban).

Param names mirror HF blip2 keys for the converter (weights/convert_blip2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.config import CaptionerConfig
from omniparser_tpu.models.generate import beam_search


@dataclasses.dataclass(frozen=True)
class Blip2Dims:
    """blip2-opt-2.7b dims (HF Blip2Config defaults)."""

    # vision (EVA ViT-g/14)
    image_size: int = 224
    patch_size: int = 14
    vision_width: int = 1408
    vision_layers: int = 39
    vision_heads: int = 16
    vision_mlp: int = 6144
    # q-former
    num_query_tokens: int = 32
    qformer_width: int = 768
    qformer_layers: int = 12
    qformer_heads: int = 12
    qformer_mlp: int = 3072
    cross_frequency: int = 2
    # language model (OPT-2.7b)
    lm_width: int = 2560
    lm_layers: int = 32
    lm_heads: int = 32
    lm_mlp: int = 10240
    vocab_size: int = 50272
    max_positions: int = 2048
    bos_token_id: int = 2
    eos_token_id: int = 50118  # OPT caption models stop at '\n'
    pad_token_id: int = 1


BLIP2_OPT_2_7B = Blip2Dims()


class EvaAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, -1)
        sp = lambda t: t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = map(sp, (q, k, v))
        a = jax.nn.softmax(
            ((q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)).astype(jnp.float32), -1
        ).astype(self.dtype)
        out = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="projection")(out)


class EvaViT(nn.Module):
    """Pre-LN CLIP-family tower: [B,S,S,3] -> [B, 1+P^2, width]."""

    dims: Blip2Dims
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values):
        d = self.dims
        b = pixel_values.shape[0]
        x = nn.Conv(d.vision_width, (d.patch_size, d.patch_size),
                    strides=(d.patch_size, d.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embedding")(pixel_values.astype(self.dtype))
        x = x.reshape(b, -1, d.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d.vision_width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(self.dtype), x], 1)
        n = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         ((d.image_size // d.patch_size) ** 2 + 1, d.vision_width))
        x = x + pos[None, :n].astype(self.dtype)
        for i in range(d.vision_layers):
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"l{i}_ln1")(x).astype(self.dtype)
            x = x + EvaAttention(d.vision_width, d.vision_heads, self.dtype, name=f"l{i}_attn")(y)
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"l{i}_ln2")(x).astype(self.dtype)
            y = nn.Dense(d.vision_mlp, dtype=self.dtype, name=f"l{i}_fc1")(y)
            y = nn.gelu(y, approximate=False)
            x = x + nn.Dense(d.vision_width, dtype=self.dtype, name=f"l{i}_fc2")(y)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="post_layernorm")(x).astype(self.dtype)


class BertAttention(nn.Module):
    """BERT-family (post-LN) self/cross attention block half."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, kv=None):
        b, n, c = x.shape
        kv_in = x if kv is None else kv
        hd = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="key")(kv_in)
        v = nn.Dense(self.width, dtype=self.dtype, name="value")(kv_in)
        sp = lambda t: t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = map(sp, (q, k, v))
        a = jax.nn.softmax(
            ((q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)).astype(jnp.float32), -1
        ).astype(self.dtype)
        out = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, self.width)
        out = nn.Dense(self.width, dtype=self.dtype, name="output_dense")(out)
        return nn.LayerNorm(dtype=jnp.float32, name="output_ln")(out + x).astype(self.dtype)


class QFormer(nn.Module):
    """32 learned queries attending to frozen image features (caption path:
    no text input)."""

    dims: Blip2Dims
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image_embeds):
        d = self.dims
        b = image_embeds.shape[0]
        q = self.param("query_tokens", nn.initializers.normal(0.02),
                       (1, d.num_query_tokens, d.qformer_width))
        x = jnp.tile(q, (b, 1, 1)).astype(self.dtype)
        x = nn.LayerNorm(dtype=jnp.float32, name="layernorm")(x).astype(self.dtype)
        for i in range(d.qformer_layers):
            x = BertAttention(d.qformer_width, d.qformer_heads, self.dtype,
                              name=f"l{i}_self")(x)
            if i % d.cross_frequency == 0:
                x = BertAttention(d.qformer_width, d.qformer_heads, self.dtype,
                                  name=f"l{i}_cross")(x, kv=image_embeds)
            y = nn.Dense(d.qformer_mlp, dtype=self.dtype, name=f"l{i}_fc1")(x)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(d.qformer_width, dtype=self.dtype, name=f"l{i}_fc2")(y)
            x = nn.LayerNorm(dtype=jnp.float32, name=f"l{i}_ffn_ln")(x + y).astype(self.dtype)
        return x


class OptDecoder(nn.Module):
    """OPT decoder with explicit KV caches (decode) / causal mask (prefill)."""

    dims: Blip2Dims
    dtype: Any = jnp.bfloat16

    def setup(self):
        d = self.dims
        self.embed_tokens = nn.Embed(d.vocab_size, d.lm_width, dtype=self.dtype,
                                     name="embed_tokens")
        self.embed_positions = nn.Embed(d.max_positions + 2, d.lm_width,
                                        dtype=self.dtype, name="embed_positions")
        self.final_ln = nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")
        self.layers = [OptLayer(d, self.dtype, name=f"layer{i}")
                       for i in range(d.lm_layers)]

    def prefill(self, inputs_embeds, attn_mask, cache_len: int):
        """Run the prompt (image queries ++ text) through all layers,
        returning logits for the last position + primed caches of length
        cache_len (prefix stored at the front)."""
        b, p, _ = inputs_embeds.shape
        d = self.dims
        pos = self.embed_positions(jnp.arange(p) + 2)
        h = (inputs_embeds + pos[None]).astype(self.dtype)
        causal = jnp.tril(jnp.ones((p, p), bool))[None, None] & attn_mask[:, None, None, :]
        caches = []
        for layer in self.layers:
            h, kv = layer(h, causal, None, None)
            k, v = kv
            pad = cache_len - p
            caches.append((
                jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
                jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
            ))
        h = self.final_ln(h).astype(self.dtype)
        logits = h[:, -1:].astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(jnp.float32)
        return logits, caches

    def decode_one(self, token_ids, pos_index, prefix_len, caches):
        """One step at absolute position pos_index (prefix_len + s)."""
        pos_index = jnp.asarray(pos_index, jnp.int32)
        h = self.embed_tokens(token_ids) + self.embed_positions(pos_index + 2)[None, None]
        h = h.astype(self.dtype)
        max_len = caches[0][0].shape[1]
        visible = (jnp.arange(max_len) <= pos_index)[None, None, None, :]
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            h, kv = layer(h, visible, cache, pos_index)
            new_caches.append(kv)
        h = self.final_ln(h).astype(self.dtype)
        logits = h.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(jnp.float32)
        return logits, new_caches


class OptLayer(nn.Module):
    dims: Blip2Dims
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, cache, cache_index):
        d = self.dims
        hd = d.lm_width // d.lm_heads
        y = nn.LayerNorm(dtype=jnp.float32, name="self_attn_layer_norm")(x).astype(self.dtype)
        b, n, _ = y.shape
        q = nn.Dense(d.lm_width, dtype=self.dtype, name="q_proj")(y)
        k = nn.Dense(d.lm_width, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(d.lm_width, dtype=self.dtype, name="v_proj")(y)
        q = q.reshape(b, n, d.lm_heads, hd)
        k = k.reshape(b, n, d.lm_heads, hd)
        v = v.reshape(b, n, d.lm_heads, hd)
        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
        new_kv = (k, v)
        a = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
        a = jnp.where(mask, a, jnp.finfo(a.dtype).min)
        a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, d.lm_width)
        x = x + nn.Dense(d.lm_width, dtype=self.dtype, name="out_proj")(o)
        y = nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")(x).astype(self.dtype)
        y = nn.Dense(d.lm_mlp, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        x = x + nn.Dense(d.lm_width, dtype=self.dtype, name="fc2")(y)
        return x, new_kv


class Blip2(nn.Module):
    dims: Blip2Dims = BLIP2_OPT_2_7B
    dtype: Any = jnp.bfloat16

    def setup(self):
        d = self.dims
        self.vision = EvaViT(d, self.dtype, name="vision_model")
        self.qformer = QFormer(d, self.dtype, name="qformer")
        self.language_projection = nn.Dense(d.lm_width, dtype=self.dtype,
                                            name="language_projection")
        self.lm = OptDecoder(d, self.dtype, name="language_model")

    def encode_and_prefill(self, pixel_values, prompt_ids, cache_len: int):
        """Image -> queries -> projected embeds ++ prompt; prefill the LM.
        Returns (last-position logits, caches, prefix_mask, prefix_len)."""
        img = self.vision(pixel_values)
        queries = self.qformer(img)
        q_emb = self.language_projection(queries)
        t_emb = self.lm.embed_tokens(prompt_ids).astype(q_emb.dtype)
        embeds = jnp.concatenate([q_emb, t_emb], axis=1)
        b, p, _ = embeds.shape
        mask = jnp.ones((b, p), bool)
        logits, caches = self.lm.prefill(embeds, mask, cache_len)
        return logits, caches, p

    def decode_one(self, token_ids, step, prefix_len, caches):
        """step is the decode index; absolute cache position = prefix_len+step."""
        return self.lm.decode_one(token_ids, prefix_len + step, prefix_len, caches)

    def __call__(self, pixel_values, prompt_ids, decoder_ids):
        """Forward for init (prefill over prompt ++ decoder tokens)."""
        full = jnp.concatenate([prompt_ids, decoder_ids], axis=1)
        cache_len = full.shape[1] + self.dims.num_query_tokens
        logits, _caches, _p = self.encode_and_prefill(pixel_values, full, cache_len)
        return logits


def blip2_generate(model: Blip2, params, pixel_values, prompt_ids,
                   max_new_tokens: int = 100, num_beams: int = 5,
                   no_repeat_ngram_size: int = 2, length_penalty: float = 1.0):
    """Beam generation matching the reference args (util/utils.py:117)."""
    d = model.dims
    b = pixel_values.shape[0]
    prefix = d.num_query_tokens + prompt_ids.shape[1]
    cache_len = prefix + max_new_tokens

    last_logits, caches, _p = model.apply(
        params, pixel_values, prompt_ids, cache_len,
        method=Blip2.encode_and_prefill,
    )

    # fold beams into batch: replicate caches per beam (batch-major order
    # matching beam_search's [B, K] -> [B*K] flatten)
    k = num_beams
    caches = jax.tree.map(lambda x: jnp.repeat(x, k, axis=0), caches)

    def decode_step(flat_tokens, s, caches):
        logits, caches = model.apply(
            params, flat_tokens, s, prefix, list(caches), method=Blip2.decode_one
        )
        return logits, tuple(caches)

    tokens, scores = beam_search(
        decode_step, last_logits[:, -1], tuple(caches), b, k, max_new_tokens,
        d.vocab_size, eos_token_id=d.eos_token_id, pad_token_id=d.pad_token_id,
        length_penalty=length_penalty, no_repeat_ngram_size=no_repeat_ngram_size,
        # decoder-only HF semantics: the text prompt joins the n-gram scan
        # and the length normalization (query embeds have no token ids)
        prompt_tokens=prompt_ids, length_offset=prompt_ids.shape[1],
    )
    return tokens, scores


# CLIP normalization (HF Blip2Processor)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

TINY_BLIP2 = Blip2Dims(
    image_size=28, patch_size=14, vision_width=16, vision_layers=2,
    vision_heads=2, vision_mlp=32, num_query_tokens=4, qformer_width=16,
    qformer_layers=2, qformer_heads=2, qformer_mlp=32, cross_frequency=2,
    lm_width=32, lm_layers=2, lm_heads=4, lm_mlp=64, vocab_size=96,
    max_positions=128, eos_token_id=95,  # in-vocab eos for the tiny config
)


class Blip2Captioner:
    """Pipeline-compatible captioner (same interface as FlorenceCaptioner).

    Note the reference resizes crops to the processor's size for BLIP-2
    (no do_resize=False on this path), so crops are resized to image_size.
    """

    fusable = False  # beam decode runs as its own dispatch, not in the fused step

    def __init__(self, config: CaptionerConfig, dims: Blip2Dims = BLIP2_OPT_2_7B,
                 params=None, tokenizer=None, num_beams: int = 5,
                 rng: Optional[jax.Array] = None):
        self.config = config
        self.dims = dims
        self.num_beams = num_beams
        self.model = Blip2(dims=dims)
        if tokenizer is None:
            from omniparser_tpu.models.tokenizer import load_tokenizer

            tokenizer = load_tokenizer(None)
        self.tokenizer = tokenizer
        ids = tokenizer.encode("The image shows", add_special=False)
        self.prompt_ids = np.asarray([dims.bos_token_id] + list(ids), np.int32)

        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = jax.jit(self.model.init)(
                rng, jnp.zeros((1, dims.image_size, dims.image_size, 3), jnp.float32),
                jnp.zeros((1, len(self.prompt_ids)), jnp.int32),
                jnp.zeros((1, 2), jnp.int32),
            )
        self.params = params
        max_new = min(config.max_new_tokens, 100)
        self._generate = jax.jit(
            lambda p, px, ids: blip2_generate(
                self.model, p, px, ids, max_new_tokens=max_new,
                num_beams=self.num_beams,
            )
        )

    def preprocess(self, crops):
        import jax.image

        n = crops.shape[0]
        s = self.dims.image_size
        resized = jax.image.resize(crops, (n, s, s, 3), "bilinear")
        return ((resized / 255.0) - _MEAN) / _STD

    def tokens_to_text(self, token_row) -> str:
        ids = [int(t) for t in token_row if t not in
               (self.dims.pad_token_id, self.dims.eos_token_id, self.dims.bos_token_id)]
        return self.tokenizer.decode(ids).strip()

    def caption_crops(self, crops, valid) -> List[str]:
        n = crops.shape[0]
        prompt = jnp.asarray(np.tile(self.prompt_ids[None], (n, 1)))
        tokens, _scores = self._generate(self.params, self.preprocess(crops), prompt)
        tokens = np.asarray(tokens)
        return [self.tokens_to_text(tokens[i]) for i in range(n) if valid[i]]
